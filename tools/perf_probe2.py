#!/usr/bin/env python
"""Probe #2: targeted step-time levers found by perf_probe.py.

(a) uint8 -> bf16 normalize formulations (3.23 ms today — 40x over the
    HBM-bandwidth bound for ~64 MB of traffic);
(b) space-to-depth stem reformulation (MLPerf-style, mathematically exact
    conv7x7s2 rewrite) — fwd+bwd timing of both stems;
(c) full train step with pre-normalized bf16 input (attributes the in-step
    normalize cost).
"""

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
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    np.asarray(jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x))


def timeit(name, fn, *args, chain=None, n=N):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    if chain is None:
        for _ in range(n):
            out = fn(*args)
    else:
        x = args
        for _ in range(n):
            x = chain(fn, x)
        out = x
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (BATCH, IMG, IMG, 3), dtype=np.uint8))

    # -- (a) normalize variants ------------------------------------------
    timeit("norm A: u8->f32 /255 ->bf16 (current)",
           jax.jit(lambda im: (im.astype(jnp.float32) / 255.0)
                   .astype(jnp.bfloat16)), images)
    timeit("norm B: u8->bf16 * (1/255)",
           jax.jit(lambda im: im.astype(jnp.bfloat16) * jnp.bfloat16(
               1.0 / 255.0)), images)
    timeit("norm C: u8->i32->f32/255->bf16",
           jax.jit(lambda im: (im.astype(jnp.int32).astype(jnp.float32)
                               / 255.0).astype(jnp.bfloat16)), images)
    timeit("norm D: u8->f16->bf16 *(1/255)",
           jax.jit(lambda im: (im.astype(jnp.float16) *
                               np.float16(1 / 255)).astype(jnp.bfloat16)),
           images)
    # reshape to 2D first (layout effects)
    timeit("norm E: reshape[BHW*C]->f32/255->bf16",
           jax.jit(lambda im: (im.reshape(-1, 512).astype(jnp.float32)
                               / 255.0).astype(jnp.bfloat16)
                   .reshape(im.shape)), images)

    # -- (b) stem: conv7x7s2 vs space-to-depth conv4x4 --------------------
    rng = jax.random.PRNGKey(0)
    x = (images.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
    k7 = jax.random.normal(rng, (7, 7, 3, 64), jnp.bfloat16) * 0.05

    def stem_conv(k, x):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def s2d(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                     4 * c)

    # exact rewrite: pad 7x7 kernel to 8x8 (one leading zero row/col so
    # output pixel (i,j) still sees input rows 2i-3..2i+3), fold 2x2
    # phases into channels -> 4x4 conv on the s2d input, padding (2,1)
    k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k_s2d = (k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
             .reshape(4, 4, 12, 64))

    def stem_s2d(k, x):
        return jax.lax.conv_general_dilated(
            s2d(x), k, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    a = jax.jit(stem_conv)(k7, x)
    b = jax.jit(stem_s2d)(k_s2d, x)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    print(f"stem rewrite max|diff| = {err:.3e} (expect ~bf16 eps)",
          flush=True)

    timeit("stem conv7x7s2 fwd", jax.jit(stem_conv), k7, x)
    timeit("stem s2d+conv4x4 fwd", jax.jit(stem_s2d), k_s2d, x)

    def g7(k, x):
        return jax.grad(lambda kk: jnp.sum(
            stem_conv(kk, x).astype(jnp.float32) ** 2))(k)

    def g4(k, x):
        return jax.grad(lambda kk: jnp.sum(
            stem_s2d(kk, x).astype(jnp.float32) ** 2))(k)

    timeit("stem conv7x7s2 fwd+bwd(k)", jax.jit(g7), k7, x)
    timeit("stem s2d+conv4x4 fwd+bwd(k)", jax.jit(g4), k_s2d, x)

    # -- (c) step with pre-normalized input -------------------------------
    import optax
    from embeddingnet_tpu.models import EmbeddingModule
    from embeddingnet_tpu.ops import mining
    from embeddingnet_tpu.train import TrainState
    from embeddingnet_tpu.train.steps import make_triplet_train_step

    module = EmbeddingModule(backbone_name="resnet50", encodings_len=256,
                             embeddings_normalization=True,
                             dtype=jnp.bfloat16)
    variables = module.init({"params": rng},
                            jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                            train=False)
    labels = jnp.asarray(np.repeat(np.arange(BATCH // 4), 4).astype(np.int32))
    optimizer = optax.adam(1e-3)
    state = TrainState.create(variables, optimizer)
    step = jax.jit(make_triplet_train_step(
        module, optimizer, margin=0.5, mode="batch_all",
        compute_dtype=jnp.bfloat16, max_positives=3))
    timeit("FULL step (uint8 input)", step, state, images, labels,
           chain=lambda f, x: (f(*x)[0], images, labels))

    # compressed vs full mining inside jit at B=1024
    emb0 = jnp.asarray(np.random.default_rng(1).normal(
        size=(BATCH, 256)), jnp.float32)
    timeit("mining B=1024 full", jax.jit(jax.grad(
        lambda e: mining.batch_all_loss(e, labels, margin=0.5)[0])),
        emb0, chain=lambda f, x: (f(*x),))
    timeit("mining B=1024 compressed(kp=3)", jax.jit(jax.grad(
        lambda e: mining.batch_all_loss(e, labels, margin=0.5,
                                        max_positives=3)[0])),
        emb0, chain=lambda f, x: (f(*x),))


if __name__ == "__main__":
    main()
