"""DenseNet family (121/169/201) in Flax.

Part of the reference's zoo surface: any non-simple backbone name
resolves through qubvel ``classification_models``
(``embedding_net/backbones.py:100-104``), which ships DenseNets.
Layer structure follows keras.applications.densenet exactly (BN eps
1.001e-5, bias-free convs, pre-activation composite layers) so
``pretrained.keras_densenet_to_flax`` ports weights verbatim —
verified <1e-5 in ``tests/test_parity.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class DenseLayer(nn.Module):
    """BN-ReLU-Conv1x1(4g) -> BN-ReLU-Conv3x3(g), output concatenated by
    the caller (keras ``conv{s}_block{b}_*`` composite)."""

    growth: int
    norm: Any
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = self.norm(name="bn0")(x)
        y = nn.relu(y)
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(y)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    """Returns the final feature map (keras ``include_top=False`` with the
    closing BN+ReLU applied, matching keras.applications)."""

    block_sizes: Sequence[int]
    growth: int = 32
    bn_epsilon: float = 1.001e-5
    bn_momentum: float = 0.99
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                       dtype=self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_layers in enumerate(self.block_sizes, start=1):
            for j in range(n_layers):
                x = DenseLayer(self.growth, norm, dtype=self.dtype,
                               name=f"stage{i}_block{j + 1}")(x)
            if i < len(self.block_sizes):
                # transition: BN-ReLU-Conv1x1(C/2) + avgpool2
                x = norm(name=f"transition{i}_bn")(x)
                x = nn.relu(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype,
                            name=f"transition{i}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = norm(name="final_bn")(x)
        return nn.relu(x)


def densenet121(**kw) -> DenseNet:
    return DenseNet(block_sizes=(6, 12, 24, 16), **kw)


def densenet169(**kw) -> DenseNet:
    return DenseNet(block_sizes=(6, 12, 32, 32), **kw)


def densenet201(**kw) -> DenseNet:
    return DenseNet(block_sizes=(6, 12, 48, 32), **kw)
