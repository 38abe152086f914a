#!/usr/bin/env python
"""Step-time breakdown probe for the headline bench config (VERDICT #2).

Times each component of the ResNet-50 B=1024 batch-all train step as an
independent jitted program on the real chip, plus a big-matmul ceiling
measurement, so docs/BENCHMARKS.md can carry an honest breakdown. All
timings use dependent chains with one final host fetch (relay sync rules —
.claude/skills/verify/SKILL.md).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 1024))
IMG = int(os.environ.get("BENCH_IMG", 64))
K_SAMPLES = 4
N = int(os.environ.get("PROBE_STEPS", 20))


def timeit(name, fn, *args, chain=None, n=N):
    """fn must return something fetchable; chain threads output->input."""
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
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def _sync(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    np.asarray(jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x))


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from embeddingnet_tpu.models import EmbeddingModule
    from embeddingnet_tpu.ops import mining
    from embeddingnet_tpu.train import TrainState
    from embeddingnet_tpu.train.steps import make_triplet_train_step

    print(f"devices: {jax.devices()}", flush=True)

    # 0. matmul ceiling, bf16 8192^3
    m = 8192
    a = jnp.asarray(np.random.default_rng(0).normal(size=(m, m)),
                    jnp.bfloat16)
    mm = jax.jit(lambda x: (x @ x))
    dt = timeit("matmul 8192^3 bf16", mm, a,
                chain=lambda f, x: (f(*x),))
    print(f"  -> {2 * m**3 / dt / 1e12:.1f} TFLOP/s", flush=True)

    module = EmbeddingModule(backbone_name="resnet50", encodings_len=256,
                             embeddings_normalization=True,
                             dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = module.init({"params": rng},
                            jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                            train=False)
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (BATCH, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.asarray(np.repeat(np.arange(BATCH // K_SAMPLES),
                                   K_SAMPLES).astype(np.int32))

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # 1. forward only (train mode, BN batch stats)
    def fwd(params, images):
        x = (images.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        emb, _ = module.apply({"params": params,
                               "batch_stats": batch_stats}, x, train=True,
                              mutable=["batch_stats"])
        return emb.astype(jnp.float32)

    fwd_j = jax.jit(fwd)
    timeit("forward (train mode)", fwd_j, params, images)

    # 2. forward eval mode (running stats; no batch reductions)
    fwd_e = jax.jit(lambda p, im: module.apply(
        {"params": p, "batch_stats": batch_stats},
        (im.astype(jnp.float32) / 255.0).astype(jnp.bfloat16),
        train=False).astype(jnp.float32))
    timeit("forward (eval mode)", fwd_e, params, images)

    # 3. mining fwd+bwd alone
    emb0 = fwd_j(params, images)

    def mine_g(emb):
        return jax.grad(lambda e: mining.batch_all_loss(
            e, labels, margin=0.5)[0])(emb)

    mine_j = jax.jit(mine_g)
    timeit("mining batch_all fwd+bwd", mine_j, emb0,
           chain=lambda f, x: (f(*x),))

    # 4. encoder backward with trivial loss (no mining): isolates conv bwd
    def enc_grad(params, images):
        def loss_fn(p):
            emb = fwd(p, images)
            return jnp.sum(emb * emb)
        return jax.grad(loss_fn)(params)

    enc_g = jax.jit(enc_grad)
    timeit("encoder fwd+bwd (trivial loss)", enc_g, params, images)

    # 5. full loss grad (encoder + mining backward)
    def full_grad(params, images):
        def loss_fn(p):
            emb = fwd(p, images)
            loss, _ = mining.batch_all_loss(emb, labels, margin=0.5)
            return loss
        return jax.grad(loss_fn)(params)

    timeit("full fwd+bwd (encode+mine)", jax.jit(full_grad), params, images)

    # 6. adam update alone
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    grads = enc_g(params, images)

    def adam_step(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    timeit("adam update", jax.jit(adam_step), params, opt_state, grads,
           chain=lambda f, x: f(x[0], x[1], grads))

    # 7. the real train step (reference point = bench.py)
    optimizer = optax.adam(1e-3)
    state = TrainState.create(variables, optimizer)
    step = jax.jit(make_triplet_train_step(
        module, optimizer, margin=0.5, mode="batch_all",
        compute_dtype=jnp.bfloat16, max_positives=K_SAMPLES - 1))
    dt = timeit("FULL train step", step, state, images, labels,
                chain=lambda f, x: (f(*x)[0], images, labels))
    print(f"  -> {BATCH / dt:.0f} images/sec/chip", flush=True)

    # 8. uint8->f32 /255 normalize alone (HBM bandwidth check)
    norm_j = jax.jit(lambda im: (im.astype(jnp.float32) / 255.0)
                     .astype(jnp.bfloat16))
    timeit("normalize uint8->bf16", norm_j, images)


if __name__ == "__main__":
    main()
