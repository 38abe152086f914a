"""Xception in Flax (Chollet 2017).

Part of the reference's zoo surface: any non-simple backbone name resolves
through qubvel ``classification_models`` (``embedding_net/backbones.py:
100-104``), whose registry ships ``xception`` (a re-export of
keras.applications.xception). Structure mirrors the keras source exactly —
bias-free convs, BN(eps 1e-3, scale=True), relu, separable convs as
depthwise (``feature_group_count``) + pointwise pairs — and uses the keras
block names, so ``pretrained.keras_xception_to_flax`` ports weights by
name (main path) + creation order (the four auto-named shortcut convs).
Verified against a live Keras forward in ``tests/test_parity.py``.

``include_top=False`` semantics: returns the final 2048-channel map.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class Xception(nn.Module):
    bn_momentum: float = 0.99
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=self.bn_momentum, epsilon=1e-3,
                                dtype=self.dtype, name=name)(y)

        def sep(y, filters, name):
            """SeparableConv2D(filters, 3x3, same, no bias): depthwise +
            pointwise, matching keras' two-kernel weight layout."""
            in_ch = y.shape[-1]
            y = nn.Conv(in_ch, (3, 3), padding="SAME",
                        feature_group_count=in_ch, use_bias=False,
                        dtype=self.dtype, name=f"{name}_dw")(y)
            return nn.Conv(filters, (1, 1), use_bias=False,
                           dtype=self.dtype, name=f"{name}_pw")(y)

        def shortcut(y, filters, block):
            y = nn.Conv(filters, (1, 1), (2, 2), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        name=f"block{block}_res_conv")(y)
            return bn(y, f"block{block}_res_bn")

        pool = lambda y: nn.max_pool(y, (3, 3), strides=(2, 2),
                                     padding="SAME")

        # entry flow
        x = nn.Conv(32, (3, 3), (2, 2), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="block1_conv1")(x)
        x = nn.relu(bn(x, "block1_conv1_bn"))
        x = nn.Conv(64, (3, 3), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="block1_conv2")(x)
        x = nn.relu(bn(x, "block1_conv2_bn"))

        # block2: no leading relu (keras quirk — first sepconv block only)
        res = shortcut(x, 128, 2)
        x = bn(sep(x, 128, "block2_sepconv1"), "block2_sepconv1_bn")
        x = bn(sep(nn.relu(x), 128, "block2_sepconv2"),
               "block2_sepconv2_bn")
        x = pool(x) + res

        for block, filters in ((3, 256), (4, 728)):
            res = shortcut(x, filters, block)
            y = bn(sep(nn.relu(x), filters, f"block{block}_sepconv1"),
                   f"block{block}_sepconv1_bn")
            y = bn(sep(nn.relu(y), filters, f"block{block}_sepconv2"),
                   f"block{block}_sepconv2_bn")
            x = pool(y) + res

        # middle flow: 8 identity-residual triple-sepconv blocks
        for block in range(5, 13):
            y = x
            for i in (1, 2, 3):
                y = bn(sep(nn.relu(y), 728, f"block{block}_sepconv{i}"),
                       f"block{block}_sepconv{i}_bn")
            x = x + y

        # exit flow
        res = shortcut(x, 1024, 13)
        x = bn(sep(nn.relu(x), 728, "block13_sepconv1"),
               "block13_sepconv1_bn")
        x = bn(sep(nn.relu(x), 1024, "block13_sepconv2"),
               "block13_sepconv2_bn")
        x = pool(x) + res

        x = nn.relu(bn(sep(x, 1536, "block14_sepconv1"),
                       "block14_sepconv1_bn"))
        x = nn.relu(bn(sep(x, 2048, "block14_sepconv2"),
                       "block14_sepconv2_bn"))
        return x


def xception(**kw) -> Xception:
    return Xception(**kw)
