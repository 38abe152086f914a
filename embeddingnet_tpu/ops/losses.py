"""Loss functions and metrics.

Pure-jnp ports of the reference semantics in
``embedding_net/losses_and_accuracies.py`` — same formulas, verified against
numpy oracles in ``tests/test_losses.py``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def contrastive_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                     margin: float = 1.0) -> jnp.ndarray:
    """Contrastive loss, Hadsell et al. '06.

    ``mean(y * d^2 + (1 - y) * max(margin - d, 0)^2)`` with the reference's
    fixed ``margin = 1`` default (``losses_and_accuracies.py:4-11``).
    ``y_pred`` is the scalar distance per pair, ``y_true`` is 1 for
    same-class pairs, 0 for different-class.
    """
    y_true = y_true.astype(y_pred.dtype)
    square_pred = jnp.square(y_pred)
    margin_square = jnp.square(jnp.maximum(margin - y_pred, 0.0))
    return jnp.mean(y_true * square_pred + (1.0 - y_true) * margin_square)


def triplet_loss(margin: float = 0.5) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Per-sample triplet hinge on a concatenated ``[a‖p‖n]`` embedding.

    Mirrors ``losses_and_accuracies.py:14-44``: the input's last axis is
    split into thirds, distances are **squared** L2, and the result is the
    per-sample ``max(d_ap - d_an + margin, 0)`` vector (no mean — Keras
    reduced it; callers here reduce explicitly).
    """

    def loss_function(merged: jnp.ndarray) -> jnp.ndarray:
        total_length = merged.shape[-1]
        third = total_length // 3
        anchor = merged[:, :third]
        positive = merged[:, third:2 * third]
        negative = merged[:, 2 * third:]
        pos_dist = jnp.sum(jnp.square(anchor - positive), axis=1)
        neg_dist = jnp.sum(jnp.square(anchor - negative), axis=1)
        return jnp.maximum(pos_dist - neg_dist + margin, 0.0)

    return loss_function


def triplet_hinge(emb_a: jnp.ndarray, emb_p: jnp.ndarray, emb_n: jnp.ndarray,
                  margin: float = 0.5) -> jnp.ndarray:
    """Same hinge on separate (anchor, positive, negative) embedding arrays."""
    pos_dist = jnp.sum(jnp.square(emb_a - emb_p), axis=-1)
    neg_dist = jnp.sum(jnp.square(emb_a - emb_n), axis=-1)
    return jnp.maximum(pos_dist - neg_dist + margin, 0.0)


def accuracy(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Pair-classification accuracy with the fixed 0.5 distance threshold
    (``losses_and_accuracies.py:47-50``)."""
    pred = (y_pred < 0.5).astype(y_true.dtype)
    return jnp.mean((y_true == pred).astype(jnp.float32))


def softmax_cross_entropy(logits: jnp.ndarray,
                          onehot: jnp.ndarray) -> jnp.ndarray:
    """Categorical cross-entropy for the softmax-pretraining phase
    (reference compiles ``'categorical_crossentropy'``, ``backbones.py:150-152``)."""
    log_probs = logits - jnp.log(
        jnp.sum(jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True)),
                axis=-1, keepdims=True)) - jnp.max(logits, axis=-1,
                                                   keepdims=True)
    return -jnp.mean(jnp.sum(onehot * log_probs, axis=-1))


def arcface_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                 class_weights: jnp.ndarray, *, margin: float = 0.5,
                 scale: float = 64.0) -> jnp.ndarray:
    """ArcFace additive-angular-margin loss (stretch surface beyond the
    reference — modern margin loss through the same config API).

    ``embeddings [B, D]`` and ``class_weights [C, D]`` are L2-normalized;
    the target logit's angle gets ``margin`` added before scaling.
    """
    emb_n = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12)
    w_n = class_weights / jnp.maximum(
        jnp.linalg.norm(class_weights, axis=-1, keepdims=True), 1e-12)
    cos = jnp.clip(jnp.matmul(emb_n, w_n.T,
                              preferred_element_type=jnp.float32),
                   -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    onehot = jax_one_hot(labels, class_weights.shape[0])
    target_cos = jnp.cos(theta + margin)
    logits = scale * jnp.where(onehot > 0, target_cos, cos)
    return softmax_cross_entropy(logits, onehot)


def jax_one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return (labels[:, None] == jnp.arange(num_classes)[None, :]).astype(
        jnp.float32)
