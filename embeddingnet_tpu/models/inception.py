"""InceptionV3 in Flax (Szegedy et al. 2016).

Part of the reference's zoo surface: any non-simple backbone name resolves
through qubvel ``classification_models`` (``embedding_net/backbones.py:
100-104``), which ships ``inceptionv3``. Structure follows
keras.applications.inception_v3 exactly (bias-free convs + BN(scale=False,
eps 1e-3) + relu; branch construction order preserved), so
``pretrained.keras_inceptionv3_to_flax`` can port weights by construction
order — verified against a live Keras forward in ``tests/test_parity.py``.

``include_top=False`` semantics: returns the final 8x8x2048 map (for
299x299 inputs; any input >= 75px works, spatial dims scale accordingly).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _avg_pool_same(x):
    """keras AveragePooling2D((3,3), strides=1, padding='same') — TF
    excludes padded cells from the mean (count_include_pad=False)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                       count_include_pad=False)


class InceptionV3(nn.Module):
    bn_momentum: float = 0.99
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        counter = [0]

        def cb(y, filters, kh, kw, strides=(1, 1), padding="SAME"):
            """conv2d_bn: numbered in keras construction order."""
            counter[0] += 1
            i = counter[0]
            pad = padding if isinstance(padding, str) else padding
            y = nn.Conv(filters, (kh, kw), strides, padding=pad,
                        use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(y)
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=self.bn_momentum, epsilon=1e-3,
                             use_scale=False, dtype=self.dtype,
                             name=f"bn{i}")(y)
            return nn.relu(y)

        cat = lambda parts: jnp.concatenate(parts, axis=-1)

        # stem
        x = cb(x, 32, 3, 3, strides=(2, 2), padding="VALID")
        x = cb(x, 32, 3, 3, padding="VALID")
        x = cb(x, 64, 3, 3)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = cb(x, 80, 1, 1, padding="VALID")
        x = cb(x, 192, 3, 3, padding="VALID")
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        # mixed 0-2 (35x35): pool-proj channels 32, 64, 64
        for pool_ch in (32, 64, 64):
            b1 = cb(x, 64, 1, 1)
            b5 = cb(cb(x, 48, 1, 1), 64, 5, 5)
            b3 = cb(cb(cb(x, 64, 1, 1), 96, 3, 3), 96, 3, 3)
            bp = cb(_avg_pool_same(x), pool_ch, 1, 1)
            x = cat([b1, b5, b3, bp])

        # mixed 3 (reduction -> 17x17)
        b3 = cb(x, 384, 3, 3, strides=(2, 2), padding="VALID")
        bd = cb(cb(x, 64, 1, 1), 96, 3, 3)
        bd = cb(bd, 96, 3, 3, strides=(2, 2), padding="VALID")
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = cat([b3, bd, bp])

        # mixed 4-7 (17x17): 7x7-factorized branches, mid widths 128/160/160/192
        for mid in (128, 160, 160, 192):
            b1 = cb(x, 192, 1, 1)
            b7 = cb(cb(cb(x, mid, 1, 1), mid, 1, 7), 192, 7, 1)
            bd = cb(x, mid, 1, 1)
            bd = cb(bd, mid, 7, 1)
            bd = cb(bd, mid, 1, 7)
            bd = cb(bd, mid, 7, 1)
            bd = cb(bd, 192, 1, 7)
            bp = cb(_avg_pool_same(x), 192, 1, 1)
            x = cat([b1, b7, bd, bp])

        # mixed 8 (reduction -> 8x8)
        b3 = cb(cb(x, 192, 1, 1), 320, 3, 3, strides=(2, 2), padding="VALID")
        b7 = cb(cb(cb(x, 192, 1, 1), 192, 1, 7), 192, 7, 1)
        b7 = cb(b7, 192, 3, 3, strides=(2, 2), padding="VALID")
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = cat([b3, b7, bp])

        # mixed 9-10 (8x8): split 3x3 branches
        for _ in range(2):
            b1 = cb(x, 320, 1, 1)
            b3 = cb(x, 384, 1, 1)
            b3 = cat([cb(b3, 384, 1, 3), cb(b3, 384, 3, 1)])
            bd = cb(cb(x, 448, 1, 1), 384, 3, 3)
            bd = cat([cb(bd, 384, 1, 3), cb(bd, 384, 3, 1)])
            bp = cb(_avg_pool_same(x), 192, 1, 1)
            x = cat([b1, b3, bd, bp])
        return x


def inceptionv3(**kw) -> InceptionV3:
    return InceptionV3(**kw)


class InceptionResNetV2(nn.Module):
    """Inception-ResNet-v2 (Szegedy et al. 2017) — another
    ``classification_models`` zoo name (``backbones.py:100-104``).

    Mirrors keras.applications.inception_resnet_v2: bias-free conv +
    BN(scale=False, eps 1e-3) + relu everywhere EXCEPT each residual
    block's final 1x1 projection, which has a bias and no BN (the keras
    ``conv2d_bn(..., use_bias=True)`` branch skips BN); residuals are
    added with a per-block-type scale. Conv/BN creation order matches the
    keras source so ``pretrained.keras_inception_resnet_v2_to_flax``
    ports weights by construction order. Returns the final 1536-ch map.
    """

    bn_momentum: float = 0.99
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        counter = [0]

        def cb(y, filters, kh, kw, strides=(1, 1), padding="SAME",
               activation=True, use_bias=False):
            counter[0] += 1
            i = counter[0]
            y = nn.Conv(filters, (kh, kw), strides, padding=padding,
                        use_bias=use_bias, dtype=self.dtype,
                        name=f"conv{i}")(y)
            if not use_bias:
                y = nn.BatchNorm(use_running_average=not train,
                                 momentum=self.bn_momentum, epsilon=1e-3,
                                 use_scale=False, dtype=self.dtype,
                                 name=f"bn{i}")(y)
            return nn.relu(y) if activation else y

        cat = lambda parts: jnp.concatenate(parts, axis=-1)

        def block35(y, scale=0.17):
            b0 = cb(y, 32, 1, 1)
            b1 = cb(cb(y, 32, 1, 1), 32, 3, 3)
            b2 = cb(cb(cb(y, 32, 1, 1), 48, 3, 3), 64, 3, 3)
            up = cb(cat([b0, b1, b2]), y.shape[-1], 1, 1,
                    activation=False, use_bias=True)
            return nn.relu(y + scale * up)

        def block17(y, scale=0.1):
            b0 = cb(y, 192, 1, 1)
            b1 = cb(cb(cb(y, 128, 1, 1), 160, 1, 7), 192, 7, 1)
            up = cb(cat([b0, b1]), y.shape[-1], 1, 1,
                    activation=False, use_bias=True)
            return nn.relu(y + scale * up)

        def block8(y, scale=0.2, activation=True):
            b0 = cb(y, 192, 1, 1)
            b1 = cb(cb(cb(y, 192, 1, 1), 224, 1, 3), 256, 3, 1)
            up = cb(cat([b0, b1]), y.shape[-1], 1, 1,
                    activation=False, use_bias=True)
            y = y + scale * up
            return nn.relu(y) if activation else y

        # stem
        x = cb(x, 32, 3, 3, strides=(2, 2), padding="VALID")
        x = cb(x, 32, 3, 3, padding="VALID")
        x = cb(x, 64, 3, 3)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = cb(x, 80, 1, 1, padding="VALID")
        x = cb(x, 192, 3, 3, padding="VALID")
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        # mixed_5b (Inception-A base)
        b0 = cb(x, 96, 1, 1)
        b1 = cb(cb(x, 48, 1, 1), 64, 5, 5)
        b2 = cb(cb(cb(x, 64, 1, 1), 96, 3, 3), 96, 3, 3)
        bp = cb(_avg_pool_same(x), 64, 1, 1)
        x = cat([b0, b1, b2, bp])

        for _ in range(10):
            x = block35(x)

        # mixed_6a (reduction)
        b0 = cb(x, 384, 3, 3, strides=(2, 2), padding="VALID")
        b1 = cb(cb(cb(x, 256, 1, 1), 256, 3, 3), 384, 3, 3,
                strides=(2, 2), padding="VALID")
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = cat([b0, b1, bp])

        for _ in range(20):
            x = block17(x)

        # mixed_7a (reduction)
        b0 = cb(cb(x, 256, 1, 1), 384, 3, 3, strides=(2, 2), padding="VALID")
        b1 = cb(cb(x, 256, 1, 1), 288, 3, 3, strides=(2, 2), padding="VALID")
        b2 = cb(cb(cb(x, 256, 1, 1), 288, 3, 3), 320, 3, 3,
                strides=(2, 2), padding="VALID")
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = cat([b0, b1, b2, bp])

        for _ in range(9):
            x = block8(x)
        x = block8(x, scale=1.0, activation=False)

        return cb(x, 1536, 1, 1)  # conv_7b


def inceptionresnetv2(**kw) -> InceptionResNetV2:
    return InceptionResNetV2(**kw)
