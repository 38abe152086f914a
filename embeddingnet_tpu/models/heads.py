"""Embedding / classification heads shared by every backbone.

Reference head specs:

* zoo backbones: GAP -> Dense(len//2, relu) -> Dense(len, relu) ->
  optional L2-normalize (``embedding_net/backbones.py:110-121``);
* ``simple``/``simple2`` attach their Dense stacks directly
  (``backbones.py:35-41``, ``:71-81``) — those live in ``simple.py``;
* classification head: Dense(1, sigmoid) on the embedding
  (``embedding_net/models.py:42-45``);
* softmax-pretraining head: GAP -> Dense(n_classes, softmax)
  (``embedding_net/backbones.py:144-147``).

Initializers follow Keras defaults (glorot_uniform kernels, zero bias) so
ported reference weights are drop-in and parity tests are meaningful.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

glorot = nn.initializers.glorot_uniform


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """Keras ``K.l2_normalize`` semantics: x / sqrt(max(sum(x^2), eps))."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps))


class EmbeddingHead(nn.Module):
    """GAP -> Dense(len//2) -> Dense(len) -> optional L2 norm
    (``backbones.py:110-121``)."""

    encodings_len: int = 256
    embeddings_normalization: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        # features: [B, H, W, C] backbone output
        x = jnp.mean(features, axis=(1, 2))  # GlobalAveragePooling2D
        x = nn.Dense(self.encodings_len // 2, kernel_init=glorot(),
                     dtype=self.dtype, name="dense_1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.encodings_len, kernel_init=glorot(),
                     dtype=self.dtype, name="dense_2")(x)
        x = nn.relu(x)
        if self.embeddings_normalization:
            x = l2_normalize(x.astype(jnp.float32))
        return x


class ClassificationHead(nn.Module):
    """Dense(1, sigmoid) on the embedding (``models.py:44``)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, embedding: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(1, kernel_init=glorot(), dtype=self.dtype,
                     name="output_img")(embedding)
        return nn.sigmoid(x)


class SoftmaxHead(nn.Module):
    """GAP -> Dense(n_classes) logits (``backbones.py:144-147``; softmax is
    folded into the loss for numerical stability)."""

    n_classes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        x = jnp.mean(features, axis=(1, 2))
        return nn.Dense(self.n_classes, kernel_init=glorot(),
                        dtype=self.dtype, name="logits")(x)


class SiameseL1Head(nn.Module):
    """|e1 - e2| -> Dense(1, sigmoid) (``models.py:217-221``)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, e1: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
        distance = jnp.abs(e1 - e2)
        x = nn.Dense(1, kernel_init=glorot(), dtype=self.dtype,
                     name="output_siamese")(distance)
        return nn.sigmoid(x)[:, 0]


def siamese_l2_distance(e1: jnp.ndarray, e2: jnp.ndarray,
                        eps: float = 1e-7) -> jnp.ndarray:
    """sqrt(max(sum((e1-e2)^2), eps)) scalar distance (``models.py:223-228``;
    eps matches Keras ``K.epsilon()``)."""
    return jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.square(e1 - e2), axis=-1), eps))
