#!/usr/bin/env python
"""Serving-path benchmark: encode+kNN latency and throughput on TPU.

The reference's inference path is ``predict_knn`` (``embedding_net/
models.py:128-142``): one cv2 decode + one ``predict`` round-trip + host
sklearn kNN per query. Here the whole classify is ONE device program
(encode -> distances -> top-k vote, ``ops/knn.py``), micro-batched by
``serving.InferenceEngine``. This tool measures that program directly:

* single-query latency (p50/p99) — batch-1 encode+classify, float DB
  and int8-quantized DB;
* batched throughput — batch-32/256 images/sec;
* DB-size scaling — 10k / 100k / 1M encodings.

Timing uses a host fetch per iteration (the axon relay's
``block_until_ready`` is not a true sync — .claude/skills/verify/SKILL.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serving.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from embeddingnet_tpu.models import EmbeddingModule
    from embeddingnet_tpu.ops import knn as knn_ops

    img, d, n_classes = 64, 256, 1000
    module = EmbeddingModule(backbone_name="resnet50", encodings_len=d,
                             embeddings_normalization=True,
                             dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = module.init({"params": rng},
                            jnp.zeros((2, img, img, 3), jnp.float32),
                            train=False)

    rs = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnums=(3,))
    def classify(variables, db, db_labels, k, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        emb = module.apply(variables, x, train=False).astype(jnp.float32)
        pred, _ = knn_ops.knn_classify(db, db_labels, emb, k=k,
                                       n_classes=n_classes)
        return pred

    @functools.partial(jax.jit, static_argnums=(4,))
    def classify_q(variables, db_q, db_scales, db_labels, k, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        emb = module.apply(variables, x, train=False).astype(jnp.float32)
        pred, _ = knn_ops.knn_classify_quantized(
            db_q, db_scales, db_labels, emb, k=k, n_classes=n_classes)
        return pred

    def timed(fn, iters=50):
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            int(np.asarray(out)[0])  # host fetch = true sync
            lat.append(time.perf_counter() - t0)
        lat = np.array(lat[5:])  # drop warm-up tail noise
        return float(np.percentile(lat, 50)), float(np.percentile(lat, 99))

    print(f"{'DB size':>9} {'mode':>6} {'batch':>5} "
          f"{'p50 ms':>8} {'p99 ms':>8} {'img/s':>9}")
    for db_n in (10_000, 100_000, 1_000_000):
        db = jnp.asarray(rs.normal(size=(db_n, d)), jnp.float32)
        db /= jnp.linalg.norm(db, axis=1, keepdims=True)
        db_labels = jnp.asarray(rs.integers(0, n_classes, db_n), jnp.int32)
        db_q, db_scales = knn_ops.quantize_db(db)
        for batch in (1, 32, 256):
            imgs = jnp.asarray(
                rs.integers(0, 255, (batch, img, img, 3)), jnp.uint8)
            for mode in ("float", "int8"):
                if mode == "float":
                    fn = lambda: classify(variables, db, db_labels, 5, imgs)
                else:
                    fn = lambda: classify_q(variables, db_q, db_scales,
                                            db_labels, 5, imgs)
                fn()  # compile
                p50, p99 = timed(fn)
                print(f"{db_n:>9} {mode:>6} {batch:>5} "
                      f"{p50 * 1e3:>8.2f} {p99 * 1e3:>8.2f} "
                      f"{batch / p50:>9.0f}", flush=True)


if __name__ == "__main__":
    main()
