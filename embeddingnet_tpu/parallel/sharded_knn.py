"""Mesh-sharded encodings database: exact kNN at 100M+ rows.

The serving-scale analog of the distributed miner (SURVEY.md §2.3): the
DB rows shard over the ``data`` axis so each chip holds N/d encodings
(+ labels), queries replicate, and search is the classic two-stage exact
top-k — local top-k over the shard's rows on the MXU, ``all_gather`` of
the d*k candidates over ICI (k floats+ids per query per shard — tiny),
final top-k on every chip. Identical results to the single-device
:mod:`embeddingnet_tpu.ops.knn` (asserted in ``tests/test_sharded.py``);
memory per chip drops from O(N) to O(N/d).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from embeddingnet_tpu.ops.distances import pairwise_sq_l2


def _two_stage_topk(local_d2: jnp.ndarray, local_ids: jnp.ndarray,
                    local_labels: jnp.ndarray, k: int, axis: str):
    """Local top-k -> all_gather candidates -> global top-k.

    ``local_d2`` [Q, n_local]; returns global ``(d2 [Q,k], ids [Q,k],
    labels [Q,k])``. The cross-chip traffic is d*k candidates per query,
    independent of DB size.
    """
    k_local = min(k, local_d2.shape[1])
    neg_d, idx = jax.lax.top_k(-local_d2, k_local)          # [Q, kl]
    cand_ids = jnp.take_along_axis(
        jnp.broadcast_to(local_ids[None, :], local_d2.shape), idx, axis=1)
    cand_labels = jnp.take_along_axis(
        jnp.broadcast_to(local_labels[None, :], local_d2.shape), idx,
        axis=1)

    # [d, Q, kl] stacked candidates from every shard
    all_d = jax.lax.all_gather(neg_d, axis)
    all_ids = jax.lax.all_gather(cand_ids, axis)
    all_labels = jax.lax.all_gather(cand_labels, axis)
    q = neg_d.shape[0]
    flat = lambda x: jnp.transpose(x, (1, 0, 2)).reshape(q, -1)  # noqa: E731
    neg_final, sel = jax.lax.top_k(flat(all_d), k)          # [Q, k]
    ids = jnp.take_along_axis(flat(all_ids), sel, axis=1)
    labels = jnp.take_along_axis(flat(all_labels), sel, axis=1)
    return -neg_final, ids, labels


def sharded_knn(mesh: Mesh, *, k: int = 5, n_classes: int = 1000,
                axis: str = "data"):
    """Build ``fn(db_emb, db_labels, queries) -> (pred, dists, idx)`` with
    the DB sharded on its leading axis and queries/outputs replicated.

    ``pred`` uses the same rank-weighted majority vote as
    :func:`ops.knn.knn_classify`; ``dists`` are euclidean like
    :func:`ops.knn.knn_neighbors`.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    def fn(db_local: jnp.ndarray, labels_local: jnp.ndarray,
           queries: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        n_local = db_local.shape[0]
        row0 = jax.lax.axis_index(axis) * n_local
        local_ids = row0 + jnp.arange(n_local, dtype=jnp.int32)
        d2 = pairwise_sq_l2(queries.astype(jnp.float32),
                            db_local.astype(jnp.float32))   # [Q, nl]
        d2_k, ids, labels = _two_stage_topk(
            d2, local_ids, labels_local.astype(jnp.int32), k, axis)
        votes = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
        rank_eps = (1.0 / (jnp.arange(k, dtype=jnp.float32) + 2.0)
                    )[None, :, None]
        counts = jnp.sum(votes * (1.0 + 1e-3 * rank_eps), axis=1)
        pred = jnp.argmax(counts, axis=-1)
        return pred, jnp.sqrt(jnp.maximum(d2_k, 0.0)), ids

    return fn


def sharded_knn_quantized(mesh: Mesh, *, k: int = 5, n_classes: int = 1000,
                          axis: str = "data"):
    """Int8-DB variant of :func:`sharded_knn` (see ``ops.knn.quantize_db``):
    each shard holds its int8 rows + scales; the local Gram runs with the
    int8 operand, scale corrections are rank-1 — per-chip HBM for a
    100M x 256 DB drops to 2.5 GB / d."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    def fn(values_local, scales_local, labels_local, queries):
        n_local = values_local.shape[0]
        row0 = jax.lax.axis_index(axis) * n_local
        local_ids = row0 + jnp.arange(n_local, dtype=jnp.int32)
        q32 = queries.astype(jnp.float32)
        v32 = values_local.astype(jnp.float32)
        gram = jnp.matmul(q32, v32.T,
                          preferred_element_type=jnp.float32)
        v_sq = jnp.sum(jnp.square(v32), axis=1)
        d2 = (jnp.sum(jnp.square(q32), axis=1, keepdims=True)
              + (scales_local ** 2 * v_sq)[None, :]
              - 2.0 * scales_local[None, :] * gram)
        d2_k, ids, labels = _two_stage_topk(
            d2, local_ids, labels_local.astype(jnp.int32), k, axis)
        votes = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
        rank_eps = (1.0 / (jnp.arange(k, dtype=jnp.float32) + 2.0)
                    )[None, :, None]
        counts = jnp.sum(votes * (1.0 + 1e-3 * rank_eps), axis=1)
        pred = jnp.argmax(counts, axis=-1)
        return pred, jnp.sqrt(jnp.maximum(d2_k, 0.0)), ids

    return fn
