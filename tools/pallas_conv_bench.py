#!/usr/bin/env python
"""Production-path benchmark for ops/fused_conv.py: XLA vs Pallas on
the headline ResNet-50 @64px stage shapes (stride-1 3x3 convs), forward
and full fwd+bwd (dgrad+wgrad), dependent-chain timed (relay-safe: one
scalar fetch per measured block — see CLAUDE.md platform notes).

Run on TPU: ``python tools/pallas_conv_bench.py``. Results recorded in
docs/BENCHMARKS.md; this is the go/no-go for enabling
``PERFORMANCE.pallas_conv`` per shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from embeddingnet_tpu.ops import fused_conv as fc

B = int(os.environ.get("PCB_BATCH", 1024))
N_STEPS = 20
# (S, C): stage2/3/4 of ResNet-50 at 64px input
SHAPES = [(8, 128), (4, 256), (2, 512)]


def _lax_conv(x, w):
    # no preferred_element_type: matches flax nn.Conv (the model path);
    # bf16 convs f32-accumulate on the MXU either way
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def chain_time(fn, x, n=N_STEPS):
    out = fn(x)
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn(out)
    _ = float(jnp.ravel(out)[0])          # true host sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(out)
    _ = float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    print(f"B={B}, bf16, {N_STEPS}-step dependent chains, best of 3\n")
    print(f"{'shape':14s} {'prog':10s} {'XLA ms':>8s} {'Pallas ms':>10s} "
          f"{'speedup':>8s}")
    for s, c in SHAPES:
        x = jnp.asarray(rng.normal(size=(B, s, s, c)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.02, jnp.bfloat16)
        cot = jnp.asarray(rng.normal(size=(B, s, s, c)), jnp.bfloat16)

        # dispatch-matched candidate: full Pallas at S in {2,4}, mixed
        # (XLA fwd + Pallas bwd) at S=8 — what FastConv3x3 actually runs
        cand = fc.conv3x3_small if s in (2, 4) else fc.conv3x3_small_mixed
        fwd_xla = jax.jit(lambda x, w=w: _lax_conv(x, w))
        fwd_pal = jax.jit(lambda x, w=w, c=cand: c(x, w))

        # fwd + dgrad + wgrad in one x-chainable program. The loss value
        # and dw are folded into the output at 1e-9 weight so nothing is
        # DCE'd (a bare jax.grad lets XLA drop the forward: custom_vjp
        # residuals are (x, w), the primal output is unused).
        def train_like(conv):
            def f(x, w=w, cot=cot):
                def loss(x, w):
                    return jnp.sum(conv(x, w).astype(jnp.float32)
                                   * cot.astype(jnp.float32))
                v, (dx, dw) = jax.value_and_grad(loss, (0, 1))(x, w)
                return dx + ((v + jnp.sum(dw.astype(jnp.float32)))
                             * 1e-9).astype(dx.dtype)
            return jax.jit(f)

        gx_xla = train_like(_lax_conv)
        gx_pal = train_like(cand)

        # numerics guard at production shape
        err = float(jnp.max(jnp.abs(
            fwd_pal(x).astype(jnp.float32) - fwd_xla(x).astype(jnp.float32))))
        for tag, f_x, f_p in [("fwd", fwd_xla, fwd_pal),
                              ("fwd+bwd", gx_xla, gx_pal)]:
            dts_x, dts_p = [], []
            for _ in range(3):
                dts_x.append(chain_time(f_x, x))
                dts_p.append(chain_time(f_p, x))
            dx, dp = min(dts_x), min(dts_p)
            print(f"{s}x{s}x{c:<6d} {tag:10s} {dx * 1e3:8.3f} "
                  f"{dp * 1e3:10.3f} {dx / dp:7.2f}x")
        print(f"{'':14s} max|pallas-xla| fwd = {err:.4f} (bf16)")


if __name__ == "__main__":
    main()
