"""MobileNetV2 in Flax — another qubvel-zoo name the reference's
else-branch serves (``embedding_net/backbones.py:100-104``).

Sandler et al. 2018 inverted residuals (relu6, no SE) built on the shared
:class:`models.efficientnet.MBConv` block; returns the 1280-channel
feature map (``include_top=False`` semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from embeddingnet_tpu.models.efficientnet import MBConv, conv_init

Dtype = Any

# (expand_ratio, channels, repeats, stride)
_V2_BLOCKS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nn.Module):
    width_multiplier: float = 1.0
    bn_momentum: float = 0.99
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def ch(c):
            c = int(c * self.width_multiplier)
            return max(8, (c + 4) // 8 * 8)

        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=1e-3,
                       dtype=self.dtype)
        x = nn.Conv(ch(32), (3, 3), (2, 2), padding="SAME", use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype,
                    name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu6(x)

        in_ch = ch(32)
        for stage, (expand, c, repeats, stride) in enumerate(_V2_BLOCKS):
            out_ch = ch(c)
            for rep in range(repeats):
                x = MBConv(in_channels=in_ch, out_channels=out_ch,
                           expand_ratio=expand, kernel=3,
                           stride=stride if rep == 0 else 1,
                           se_ratio=0.0, norm=norm, activation=nn.relu6,
                           dtype=self.dtype,
                           name=f"stage{stage + 1}_block{rep + 1}")(
                               x, train=train)
                in_ch = out_ch

        head = 1280 if self.width_multiplier <= 1.0 else ch(1280)
        x = nn.Conv(head, (1, 1), use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype, name="head_conv")(x)
        x = norm(name="head_bn")(x)
        return nn.relu6(x)


# (channels, stride) per depthwise-separable block (Howard et al. 2017,
# keras.applications.MobileNet layer schedule)
_V1_BLOCKS = (
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2), (1024, 1),
)


class MobileNetV1(nn.Module):
    """MobileNet v1 — the qubvel zoo's ``mobilenet`` name
    (``embedding_net/backbones.py:100-104``): 3x3 stem + 13 depthwise-
    separable conv blocks, relu6, returns the 1024-channel map."""

    width_multiplier: float = 1.0
    bn_momentum: float = 0.99
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def ch(c):
            return max(8, int(c * self.width_multiplier + 4) // 8 * 8)

        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=1e-3,
                       dtype=self.dtype)
        x = nn.Conv(ch(32), (3, 3), (2, 2), padding="SAME", use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype,
                    name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu6(x)
        for i, (c, stride) in enumerate(_V1_BLOCKS, start=1):
            in_ch = x.shape[-1]
            x = nn.Conv(in_ch, (3, 3), (stride, stride), padding="SAME",
                        feature_group_count=in_ch, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name=f"block{i}_dw")(x)
            x = norm(name=f"block{i}_dw_bn")(x)
            x = nn.relu6(x)
            x = nn.Conv(ch(c), (1, 1), use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, name=f"block{i}_pw")(x)
            x = norm(name=f"block{i}_pw_bn")(x)
            x = nn.relu6(x)
        return x
