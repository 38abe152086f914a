"""Pairwise distance kernels.

TPU-native replacement for the host-side ``sklearn.metrics.pairwise_distances``
call in the reference's mining loop (``embedding_net/datagenerators.py:219``).
The squared-L2 matrix is one MXU matmul plus rank-1 updates
(``d2 = |a|^2 + |b|^2 - 2 a.b^T``) — XLA tiles the Gram matmul onto the
128x128 systolic array, so the B x B matrix at B=4096, D=256 is pure MXU work.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def pairwise_sq_l2(a: jnp.ndarray, b: Optional[jnp.ndarray] = None,
                   *, precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Squared euclidean distance matrix ``[Na, Nb]``.

    Computed in float32 regardless of input dtype (bfloat16 embeddings are
    upcast for the reduction — the Gram matmul still runs on the MXU with
    bf16 inputs via ``preferred_element_type``).

    ``precision`` defaults to HIGHEST: the ``|a|^2 + |b|^2 - 2ab`` form
    cancels catastrophically near the diagonal, and TPU matmuls default to
    bf16 passes that leave ~1e-3 relative error — too coarse for mining
    margins and for the <1e-5 parity target. The Gram matmul is a tiny
    fraction of the train step's FLOPs, so fp32 MXU passes are cheap.
    """
    symmetric = b is None
    if b is None:
        b = a
    gram = jnp.matmul(a, b.T, preferred_element_type=jnp.float32,
                      precision=precision)
    a_sq = jnp.sum(jnp.square(a.astype(jnp.float32)), axis=-1)
    b_sq = jnp.sum(jnp.square(b.astype(jnp.float32)), axis=-1)
    d2 = a_sq[:, None] + b_sq[None, :] - 2.0 * gram
    # Guard tiny negatives from cancellation so sqrt stays NaN-free.
    d2 = jnp.maximum(d2, 0.0)
    if symmetric:
        # Self-distance is exactly 0 (sklearn zeroes it too); cancellation
        # noise on the diagonal would otherwise leak into mining margins.
        eye = jnp.eye(d2.shape[0], dtype=bool)
        d2 = jnp.where(eye, 0.0, d2)
    return d2


def pairwise_l2(a: jnp.ndarray, b: Optional[jnp.ndarray] = None,
                *, precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Euclidean distance matrix — matches sklearn's default metric used by
    the reference for mining (``embedding_net/datagenerators.py:219``)."""
    return jnp.sqrt(pairwise_sq_l2(a, b, precision=precision))


def pairwise_l1(a: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Manhattan distance matrix ``[Na, Nb]``.

    O(N^2 D) elementwise — no matmul trick exists for L1; fine for the
    moderate N of encodings-database queries.
    """
    if b is None:
        b = a
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    return jnp.sum(jnp.abs(a32[:, None, :] - b32[None, :, :]), axis=-1)


def pairwise_cosine(a: jnp.ndarray, b: Optional[jnp.ndarray] = None,
                    *, eps: float = 1e-12) -> jnp.ndarray:
    """Cosine *distance* (1 - cosine similarity) matrix ``[Na, Nb]``."""
    if b is None:
        b = a
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    a_n = a32 / jnp.maximum(jnp.linalg.norm(a32, axis=-1, keepdims=True), eps)
    b_n = b32 / jnp.maximum(jnp.linalg.norm(b32, axis=-1, keepdims=True), eps)
    return 1.0 - jnp.matmul(a_n, b_n.T, preferred_element_type=jnp.float32)
