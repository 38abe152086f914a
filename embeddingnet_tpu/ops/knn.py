"""Jitted kNN classification over the encodings database.

TPU-native replacement for the reference's sklearn ``KNeighborsClassifier``
(``embedding_net/models.py:128-142``): one device program computes query->DB
distances on the MXU and votes — no host round-trip between encode and
classify. Labels are integer class ids (callers map to class names).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from embeddingnet_tpu.ops.distances import pairwise_sq_l2


@functools.partial(jax.jit, static_argnames=("k", "n_classes"))
def knn_classify(db_emb: jnp.ndarray, db_labels: jnp.ndarray,
                 queries: jnp.ndarray, *, k: int = 1,
                 n_classes: int = 1000) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Majority-vote kNN. Returns ``(pred_label [Q], neighbor_idx [Q, k])``.

    Vote semantics match sklearn's uniform-weight ``KNeighborsClassifier``:
    most frequent label among the k nearest; ties broken toward the class
    containing the nearest tied neighbor.
    """
    d2 = pairwise_sq_l2(queries, db_emb)                  # [Q, N]
    neg_top, idx = jax.lax.top_k(-d2, k)                  # [Q, k]
    neighbor_labels = db_labels[idx]                      # [Q, k]
    votes = jax.nn.one_hot(neighbor_labels, n_classes,
                           dtype=jnp.float32)             # [Q, k, C]
    # Rank-weighted epsilon so the nearest neighbor breaks count ties.
    rank_eps = (1.0 / (jnp.arange(k, dtype=jnp.float32) + 2.0))[None, :, None]
    counts = jnp.sum(votes * (1.0 + 1e-3 * rank_eps), axis=1)
    return jnp.argmax(counts, axis=-1), idx


@functools.partial(jax.jit, static_argnames=("k",))
def knn_neighbors(db_emb: jnp.ndarray, queries: jnp.ndarray, *,
                  k: int = 5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``kneighbors`` equivalent (``models.py:138``): distances + indices of
    the k nearest DB entries per query."""
    d2 = pairwise_sq_l2(queries, db_emb)
    neg_d2, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg_d2, 0.0)), idx


def quantize_db(db_emb: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization of the encodings DB.

    Serving-scale memory/bandwidth: a 10M x 256 DB drops 10 GB -> 2.5 GB
    and the query Gram matmul runs int8xint8 on the MXU (2x bf16
    throughput). Returns ``(values int8 [N, D], scales f32 [N])``.
    """
    emb32 = db_emb.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(emb32), axis=1), 1e-12)
    scales = absmax / 127.0
    values = jnp.clip(jnp.round(emb32 / scales[:, None]), -127, 127
                      ).astype(jnp.int8)
    return values, scales


@functools.partial(jax.jit, static_argnames=("k", "n_classes"))
def knn_classify_quantized(db_values: jnp.ndarray, db_scales: jnp.ndarray,
                           db_labels: jnp.ndarray, queries: jnp.ndarray, *,
                           k: int = 1, n_classes: int = 1000
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN over an int8-quantized DB (see :func:`quantize_db`).

    Distance decomposition keeps the hot matmul in int8: with
    ``e_n ~ s_n * v_n``, ``d2(q, n) = |q|^2 + s_n^2 |v_n|^2 -
    2 s_n (q . v_n)`` — the ``q . v_n`` Gram runs on the MXU with the
    int8 DB operand; only rank-1 scale corrections follow.
    """
    q32 = queries.astype(jnp.float32)
    gram = jnp.matmul(q32, db_values.astype(jnp.float32).T,
                      preferred_element_type=jnp.float32)   # [Q, N]
    v_sq = jnp.sum(jnp.square(db_values.astype(jnp.float32)), axis=1)
    d2 = (jnp.sum(jnp.square(q32), axis=1, keepdims=True)
          + (db_scales ** 2 * v_sq)[None, :]
          - 2.0 * db_scales[None, :] * gram)
    _neg, idx = jax.lax.top_k(-d2, k)
    neighbor_labels = db_labels[idx]
    votes = jax.nn.one_hot(neighbor_labels, n_classes, dtype=jnp.float32)
    rank_eps = (1.0 / (jnp.arange(k, dtype=jnp.float32) + 2.0))[None, :, None]
    counts = jnp.sum(votes * (1.0 + 1e-3 * rank_eps), axis=1)
    return jnp.argmax(counts, axis=-1), idx


def class_centers(db_emb: jnp.ndarray, db_labels: jnp.ndarray,
                  n_classes: int) -> jnp.ndarray:
    """Per-class mean encodings — implements the reference's declared-but-
    unimplemented ``ENCODINGS.centers_only`` option
    (``configs/road_signs_apollo.yml:57``)."""
    onehot = jax.nn.one_hot(db_labels, n_classes, dtype=jnp.float32)
    sums = jnp.matmul(onehot.T, db_emb.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    counts = jnp.maximum(jnp.sum(onehot, axis=0)[:, None], 1.0)
    return sums / counts
