#!/usr/bin/env python
"""Probe #3: (a) fast uint8->bf16 normalize candidates (bitcast unpack vs
Pallas elementwise), (b) per-stage ResNet bottleneck fwd+bwd attribution
for the BENCHMARKS.md backward breakdown."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 1024
IMG = 64
N = 20


def _sync(out):
    import jax
    x = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x))


def timeit(name, fn, *args, n=N):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (BATCH, IMG, IMG, 3), dtype=np.uint8))

    def norm_bitcast(im):
        # u8 arrays live in (32, 128) tiles; converting them forces an
        # expensive relayout. Bitcast 4 bytes -> one int32 (native (8,128)
        # tiling), unpack with shifts, convert in the int32 domain.
        flat = im.reshape(-1, 4)
        w = jax.lax.bitcast_convert_type(flat, jnp.int32)  # [M]
        b = [(w >> (8 * i)) & 0xFF for i in range(4)]
        out = jnp.stack(b, axis=-1).astype(jnp.float32) * (1.0 / 255.0)
        return out.reshape(im.shape).astype(jnp.bfloat16)

    ref = (np.asarray(images).astype(np.float32) / 255.0)
    got = np.asarray(jax.jit(norm_bitcast)(images)).astype(np.float32)
    print("bitcast max|diff|:", np.max(np.abs(got - ref)), flush=True)
    timeit("norm bitcast-unpack", jax.jit(norm_bitcast), images)

    # Pallas elementwise
    try:
        from jax.experimental import pallas as pl

        def kern(x_ref, o_ref):
            o_ref[:] = (x_ref[:].astype(jnp.float32)
                        * (1.0 / 255.0)).astype(jnp.bfloat16)

        def norm_pallas(im):
            flat = im.reshape(-1, 512)
            rows = flat.shape[0]
            blk = 1024
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.bfloat16),
                grid=(rows // blk,),
                in_specs=[pl.BlockSpec((blk, 512), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((blk, 512), lambda i: (i, 0)),
            )(flat)
            return out.reshape(im.shape)

        got = np.asarray(jax.jit(norm_pallas)(images)).astype(np.float32)
        print("pallas max|diff|:", np.max(np.abs(got - ref)), flush=True)
        timeit("norm pallas elementwise", jax.jit(norm_pallas), images)
    except Exception as e:
        print("pallas normalize failed:", repr(e), flush=True)

    # (b) per-stage bottleneck fwd+bwd: which stage owns the backward?
    import flax.linen as nn
    from embeddingnet_tpu.models.resnet import BottleneckBlock

    shapes = [  # (spatial, in_ch, filters, n_blocks) at IMG=64 input
        (16, 256, 64, 3),
        (8, 512, 128, 4),
        (4, 1024, 256, 6),
        (2, 2048, 512, 3),
    ]
    rng = jax.random.PRNGKey(0)
    for (s, c, f, nb) in shapes:
        block = BottleneckBlock(filters=f, strides=(1, 1),
                                norm=lambda name: nn.BatchNorm(
                                    use_running_average=False,
                                    momentum=0.99, dtype=jnp.bfloat16,
                                    name=name),
                                dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(BATCH, s, s, c)), jnp.bfloat16)
        v = block.init(rng, x)

        def fb(params, x, block=block):
            def loss(p):
                y, _ = block.apply(
                    {"params": p["params"],
                     "batch_stats": p.get("batch_stats", {})},
                    x, mutable=["batch_stats"])
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return jax.grad(loss)(params)

        dt = timeit(f"bottleneck {s}x{s}x{c} f={f} fwd+bwd", jax.jit(fb),
                    v, x)
        flops = 0  # rough: 3 convs
        flops += 2 * BATCH * s * s * f * c          # 1x1 in
        flops += 2 * BATCH * s * s * f * f * 9      # 3x3
        flops += 2 * BATCH * s * s * f * 4 * f      # 1x1 out
        print(f"   x{nb} blocks/stage; fwd+bwd(k,x) ~3x fwd flops "
              f"-> {3 * flops / dt / 1e12:.1f} TFLOP/s "
              f"(stage total ~{dt * 1e3 * nb:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
