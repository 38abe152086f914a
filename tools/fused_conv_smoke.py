#!/usr/bin/env python
"""Real-chip smoke for the cut-but-kept Pallas conv stack (r5).

``ops/fused_conv.py`` is default-off experiment inventory (see its
STATUS note); its CPU interpret-mode tests keep it *compiling* but
nothing shipped exercises the real-TPU codepath — this smoke does, once
per round, so the stack is known-working against the live toolchain
(VERDICT r4 task #7). Checks, at the stage-4 shape it was built for
([B, 4, 4, 512] @ 3x3x512x512):

  1. conv3x3_small fwd matches lax.conv_general_dilated (<1e-2 bf16-ish
     tolerance on f32 accumulators),
  2. its custom-VJP grads match XLA autodiff grads,
  3. a timing line for the record (not a pass/fail criterion).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/fused_conv_smoke.py
Exit code 0 = smoke passed.
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

import jax
import jax.numpy as jnp

from embeddingnet_tpu.ops import fused_conv as fc


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # bf16, matching the VMEM calibration: the hardware gate rejects
    # itemsize > 2 (f32 doubles every operand past the 16 MB scoped
    # limit — an early smoke draft proved it by OOMing Mosaic).
    b, s, c = 256, 4, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, s, c)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.02, jnp.bfloat16)
    assert fc.eligible(x.shape, w.shape, itemsize=x.dtype.itemsize), \
        "stage-4 shape must be eligible"

    def loss_pallas(x, w):
        return jnp.sum(jnp.square(
            fc.conv3x3_small(x, w).astype(jnp.float32)))

    def loss_xla(x, w):
        return jnp.sum(jnp.square(
            fc._lax_conv3x3(x, w).astype(jnp.float32)))

    f_p = jax.jit(jax.value_and_grad(loss_pallas, argnums=(0, 1)))
    f_x = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1)))

    log(f"devices: {jax.devices()}")
    (vp, (gxp, gwp)) = f_p(x, w)
    (vx, (gxx, gwx)) = f_x(x, w)
    rel = lambda a, b: float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-9))
    errs = {"fwd": rel(vp, vx), "dgrad": rel(gxp, gxx),
            "wgrad": rel(gwp, gwx)}
    log(f"max rel err vs XLA: {errs}")
    ok = all(e < 5e-2 for e in errs.values())  # bf16 operand rounding

    # timing line (dependent chain, host fetch sync)
    for f, tag in ((f_p, "pallas"), (f_x, "xla")):
        float(f(x, w)[0])
        t0 = time.perf_counter()
        for _ in range(20):
            v, _ = f(x, w)
        float(v)
        log(f"[{tag}] fwd+bwd {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms")

    print("FUSED_CONV_SMOKE " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
