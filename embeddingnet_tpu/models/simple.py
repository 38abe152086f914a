"""The reference's two hand-built CNN backbones, layer-for-layer.

``simple``  — 4x(Conv-ReLU-MaxPool) + Flatten + Dense head
              (``embedding_net/backbones.py:19-41``);
``simple2`` — 6-conv BN/Dropout stack + Dense(512) head
              (``embedding_net/backbones.py:42-81``).

Keras semantics preserved for weight-port parity: VALID conv padding
(Keras default), 2x2 max-pool stride 2, glorot_uniform kernels, BatchNorm
with eps=1e-3 / momentum=0.99 applied AFTER the relu (the reference wires
``Conv2D(activation='relu')`` then ``BatchNormalization()``), and row-major
Flatten (NHWC in == identical flatten order).

The L2 kernel regularizers (2e-4 conv / 1e-3 embedding dense,
``backbones.py:21-36``) are *not* layer state in JAX — the train loop adds
them via :func:`embeddingnet_tpu.train.optim.l2_penalty` with these same
coefficients (see ``REG_RULES`` below).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from embeddingnet_tpu.models.heads import glorot, l2_normalize

Dtype = Any

# path-regex -> coefficient, consumed by train.optim.l2_penalty
SIMPLE_REG_RULES = (
    (r".*conv_[1-4].*kernel", 2e-4),
    (r".*embedding_dense.*kernel", 1e-3),
)
SIMPLE2_REG_RULES = (
    (r".*conv_[1-7].*kernel", 2e-4),
    (r".*embedding_dense.*kernel", 1e-3),
)


class SimpleCNN(nn.Module):
    """``simple`` backbone (``backbones.py:19-41``).

    ``features()`` is the reference's ``backbone_model`` output (the
    Flatten), ``__call__`` the ``base_model`` output (the embedding).
    """

    encodings_len: int = 256
    embeddings_normalization: bool = True
    dtype: Optional[Dtype] = None

    MIN_INPUT = 65  # below this the conv/pool stack collapses to zero

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False) -> jnp.ndarray:
        if min(x.shape[1], x.shape[2]) < self.MIN_INPUT:
            raise ValueError(
                f"'simple' backbone needs input >= {self.MIN_INPUT}px "
                f"(got {x.shape[1]}x{x.shape[2]}); its 10/7/4/4 VALID conv "
                "stack collapses below that (backbones.py:19-41 spec)")
        x = nn.Conv(64, (10, 10), padding="VALID", kernel_init=glorot(),
                    dtype=self.dtype, name="conv_1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(128, (7, 7), padding="VALID", kernel_init=glorot(),
                    dtype=self.dtype, name="conv_2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(128, (4, 4), padding="VALID", kernel_init=glorot(),
                    dtype=self.dtype, name="conv_3")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(256, (4, 4), padding="VALID", kernel_init=glorot(),
                    dtype=self.dtype, name="conv_4")(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))  # Flatten (NHWC row-major == Keras)
        if return_features:
            return x
        x = nn.Dense(self.encodings_len, kernel_init=glorot(),
                     dtype=self.dtype, name="embedding_dense")(x)
        x = nn.relu(x)
        if self.embeddings_normalization:
            x = l2_normalize(x.astype(jnp.float32))
        return x


class SimpleCNN2(nn.Module):
    """``simple2`` backbone (``backbones.py:42-81``).

    ``features()``/``return_features`` is the last conv+BN output (the
    reference's ``backbone_model``, ``backbones.py:69-70``); the embedding
    path adds Flatten -> Dense(512) -> Dropout(0.5) -> Dense(len).
    """

    encodings_len: int = 256
    embeddings_normalization: bool = True
    bn_momentum: float = 0.99
    dtype: Optional[Dtype] = None

    def _conv_bn(self, x, feats, kernel, name, train, strides=(1, 1),
                 padding="VALID"):
        x = nn.Conv(feats, kernel, strides=strides, padding=padding,
                    kernel_init=glorot(), dtype=self.dtype, name=name)(x)
        x = nn.relu(x)
        # Keras BatchNormalization defaults: eps=1e-3, momentum=0.99.
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=self.bn_momentum, dtype=self.dtype,
                         name=f"{name}_bn")(x)
        return x

    MIN_INPUT = 24

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False) -> jnp.ndarray:
        if min(x.shape[1], x.shape[2]) < self.MIN_INPUT:
            raise ValueError(
                f"'simple2' backbone needs input >= {self.MIN_INPUT}px "
                f"(got {x.shape[1]}x{x.shape[2]})")
        x = self._conv_bn(x, 32, (3, 3), "conv_1", train)
        x = self._conv_bn(x, 32, (3, 3), "conv_2", train)
        x = self._conv_bn(x, 32, (5, 5), "conv_3", train, strides=(2, 2),
                          padding="SAME")
        x = nn.Dropout(0.4, deterministic=not train, name="dropout_1")(x)
        x = self._conv_bn(x, 64, (3, 3), "conv_4", train)
        x = self._conv_bn(x, 64, (3, 3), "conv_5", train)
        x = self._conv_bn(x, 64, (5, 5), "conv_6", train, strides=(2, 2),
                          padding="SAME")
        x = nn.Dropout(0.4, deterministic=not train, name="dropout_2")(x)
        x = self._conv_bn(x, 128, (4, 4), "conv_7", train)
        if return_features:
            return x
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(512, kernel_init=glorot(), dtype=self.dtype,
                     name="dense_512")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train, name="dropout_3")(x)
        x = nn.Dense(self.encodings_len, kernel_init=glorot(),
                     dtype=self.dtype, name="embedding_dense")(x)
        x = nn.relu(x)
        if self.embeddings_normalization:
            x = l2_normalize(x.astype(jnp.float32))
        return x
