#!/usr/bin/env python
"""Probe #4: Pallas win-or-cut evidence (VERDICT r1 weak #4) + the B=4096
compressed batch-all check (ROADMAP item)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    import jax
    x = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x))


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:56s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from embeddingnet_tpu.ops import mining
    from embeddingnet_tpu.ops.pallas import pallas_batch_hard_loss

    rng = np.random.default_rng(0)
    for b, kp in ((1024, 3), (4096, 7)):
        emb = jnp.asarray(rng.normal(size=(b, 256)), jnp.float32)
        labels = jnp.asarray(np.repeat(np.arange(b // (kp + 1)), kp + 1),
                             jnp.int32)

        # batch_hard: pallas fused kernel vs jnp — forward only (the
        # kernel has no VJP) and jnp fwd+bwd for context
        timeit(f"B={b} batch_hard jnp fwd",
               jax.jit(lambda e: mining.batch_hard_loss(
                   e, labels, margin=0.5)[0]), emb)
        try:
            timeit(f"B={b} batch_hard PALLAS fwd",
                   jax.jit(lambda e: pallas_batch_hard_loss(
                       e, labels, margin=0.5)), emb)
        except Exception as e:
            print(f"B={b} pallas failed: {e!r}", flush=True)
        timeit(f"B={b} batch_hard jnp fwd+bwd",
               jax.jit(jax.grad(lambda e: mining.batch_hard_loss(
                   e, labels, margin=0.5)[0])), emb)

        # batch_all: full vs compressed top-k sort
        timeit(f"B={b} batch_all full fwd+bwd",
               jax.jit(jax.grad(lambda e: mining.batch_all_loss(
                   e, labels, margin=0.5)[0])), emb)
        timeit(f"B={b} batch_all compressed(kp={kp}) fwd+bwd",
               jax.jit(jax.grad(lambda e, k=kp: mining.batch_all_loss(
                   e, labels, margin=0.5, max_positives=k)[0])), emb)

        # where does batch_all spend: the sort core alone
        from embeddingnet_tpu.ops.distances import pairwise_sq_l2
        sq = pairwise_sq_l2(emb)
        pos_mask, neg_mask = mining._masks(labels)
        timeit(f"B={b} rowblock full (sort core)",
               jax.jit(lambda s: mining.batch_all_rowblock(
                   s, pos_mask, neg_mask, 0.5)[0]), sq)
        timeit(f"B={b} rowblock compressed (sort core)",
               jax.jit(lambda s, k=kp: mining.batch_all_rowblock_compressed(
                   s, pos_mask, neg_mask, 0.5, k)[0]), sq)
        timeit(f"B={b} pairwise_sq_l2",
               jax.jit(pairwise_sq_l2), emb)


if __name__ == "__main__":
    main()
