#!/usr/bin/env python
"""VERDICT r2 #3 experiment: can a Pallas kernel fusing BN-apply + ReLU
into a conv's epilogue beat XLA's conv -> BN -> ReLU sequence on the
worst-measured ResNet stage (stage 4: spatial 2x2, 512 filters, batch
1024 — 22.6 TFLOP/s in tools/perf_probe3.py)?

The kernel computes ``relu(conv3x3_SAME(x, W) * scale + bias)`` for
[B, 2, 2, 512] bf16 activations as 36 shifted [bT, 512] @ [512, 512]
MXU matmuls (one per output position x filter tap; zero-padding handled
by skipping out-of-range taps at trace time) with the BN scale/shift and
ReLU applied in VMEM before the single bf16 writeback — the
activation-memory-traffic fusion XLA does not do across the conv+BN
boundary.

Run on TPU: ``python tools/pallas_fused_conv.py``. Prints a table; the
go/no-go number is recorded in docs/BENCHMARKS.md either way.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("FC_BATCH", 1024))
S = 2            # stage-4 spatial
C = 512          # channels (3x3 conv of the stage-4 bottleneck)
BT = 128         # batch tile
N_STEPS = 20


def fused_kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref):
    """x: [BT, S+2, S+2, C] zero-padded bf16; w: [3, 3, C, C] bf16;
    scale/bias: [1, C] f32; o: [BT, S, S, C] bf16.

    All S*S output positions stack into one [S*S*BT, C] operand per
    filter tap, so each of the 9 matmuls is [S*S*BT, C] @ [C, C] — the
    position-at-a-time variant (36 [BT, C] matmuls) measured 15% slower
    at BT=128 (MXU ramp amortizes over 4x the rows)."""
    scale = scale_ref[:]                      # [1, C]
    bias = bias_ref[:]
    acc = jnp.zeros((S * S * BT, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            a = jnp.concatenate(
                [x_ref[:, oy + dy, ox + dx, :]
                 for oy in range(S) for ox in range(S)], axis=0)
            acc = acc + jnp.dot(a, w_ref[dy, dx, :, :],
                                preferred_element_type=jnp.float32)
    out = jnp.maximum(acc * scale + bias, 0.0).astype(o_ref.dtype)
    for i, (oy, ox) in enumerate(
            [(y, x) for y in range(S) for x in range(S)]):
        o_ref[:, oy, ox, :] = out[i * BT:(i + 1) * BT, :]


@jax.jit
def fused_conv_bn_relu(x, w, scale, bias):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        fused_kernel,
        grid=(x.shape[0] // BT,),
        in_specs=[
            pl.BlockSpec((BT, S + 2, S + 2, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, S, S, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], S, S, C), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * x.shape[0] * S * S * 9 * C * C,
            bytes_accessed=x.shape[0] * S * S * C * 4, transcendentals=0),
        interpret=os.environ.get("FC_INTERPRET") == "1",
    )(xp, w, scale, bias)


@jax.jit
def xla_conv_bn_relu(x, w, scale, bias):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(y * scale[0] + bias[0], 0.0).astype(jnp.bfloat16)


def timeit(name, fn, x, *args):
    """Dependent-chain timing (output feeds the next call's input): on the
    relay, independent enqueued calls mis-time; a chain + one final scalar
    fetch cannot."""
    out = fn(x, *args)
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn(out, *args)
    _ = float(out[0, 0, 0, 0])                 # true host sync
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        out = fn(out, *args)
    _ = float(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / N_STEPS
    flops = 2 * B * S * S * 9 * C * C
    print(f"{name:26s} {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TFLOP/s")
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, S, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.02, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (1, C)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(1, C)) * 0.1, jnp.float32)

    ours = np.asarray(fused_conv_bn_relu(x, w, scale, bias), np.float32)
    ref = np.asarray(xla_conv_bn_relu(x, w, scale, bias), np.float32)
    err = np.abs(ours - ref).max()
    print(f"numerics: max |pallas - xla| = {err:.4f} "
          f"(bf16 storage; both f32 accumulate)")
    assert err < 0.5, "kernel mismatch"

    print(f"\nstage-4 3x3 conv + BN-apply + ReLU, B={B}, {S}x{S}x{C}:")
    # relay timing is noisy run-to-run; interleave 3 repetitions of each
    # and take the min (best-case device time, noise is additive)
    dts_x, dts_p = [], []
    for rep in range(3):
        dts_x.append(timeit(f"XLA conv->BN->ReLU [{rep}]",
                            xla_conv_bn_relu, x, w, scale, bias))
        dts_p.append(timeit(f"Pallas fused epilogue [{rep}]",
                            fused_conv_bn_relu, x, w, scale, bias))
    dt_x, dt_p = min(dts_x), min(dts_p)
    print(f"\nbest-of-3: XLA {dt_x * 1e3:.3f} ms, Pallas {dt_p * 1e3:.3f} "
          f"ms -> speedup {dt_x / dt_p:.2f}x")


if __name__ == "__main__":
    main()
