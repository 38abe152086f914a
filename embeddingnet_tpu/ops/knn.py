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
