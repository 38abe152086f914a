"""EfficientNet B0-B7 in Flax.

TPU-native replacement for the reference's qubvel ``efficientnet.tfkeras``
backbones (``embedding_net/backbones.py:83-98``). Standard Tan & Le 2019
architecture: MBConv blocks with squeeze-excitation, swish activations,
BN(eps=1e-3, momentum=0.99) — matching tf.keras EfficientNet semantics so
ported weights are drop-in. Returns the final 1280*w-channel feature map
(``include_top=False`` semantics); stochastic depth (drop-connect) active
only when ``train=True``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# (expand_ratio, channels, repeats, stride, kernel)
_B0_BLOCKS: Sequence[Tuple[int, int, int, int, int]] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# name -> (width_coefficient, depth_coefficient, default_resolution)
SCALINGS = {
    "efficientnet-b0": (1.0, 1.0, 224),
    "efficientnet-b1": (1.0, 1.1, 240),
    "efficientnet-b2": (1.1, 1.2, 260),
    "efficientnet-b3": (1.2, 1.4, 300),
    "efficientnet-b4": (1.4, 1.8, 380),
    "efficientnet-b5": (1.6, 2.2, 456),
    "efficientnet-b6": (1.8, 2.6, 528),
    "efficientnet-b7": (2.0, 3.1, 600),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:  # never drop more than 10%
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class SqueezeExcite(nn.Module):
    in_channels: int
    se_ratio: float = 0.25
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        squeezed = jnp.mean(x, axis=(1, 2), keepdims=True)
        reduced = max(1, int(self.in_channels * self.se_ratio))
        s = nn.Conv(reduced, (1, 1), kernel_init=conv_init,
                    dtype=self.dtype, name="reduce")(squeezed)
        s = nn.swish(s)
        s = nn.Conv(x.shape[-1], (1, 1), kernel_init=conv_init,
                    dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


def drop_connect(x, rng, rate: float):
    """Per-example stochastic depth (keras ``Dropout(noise_shape=(B,1,1,1))``)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
    return jnp.where(mask, x / keep, 0.0)


class MBConv(nn.Module):
    """Mobile inverted bottleneck. ``se_ratio=0`` disables SE and
    ``activation=nn.relu6`` yields the MobileNetV2 inverted residual."""

    in_channels: int
    out_channels: int
    expand_ratio: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    norm: Any = nn.BatchNorm
    activation: Any = nn.swish
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        expanded = self.in_channels * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.Conv(expanded, (1, 1), use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name="expand_conv")(x)
            x = self.norm(name="expand_bn")(x)
            x = self.activation(x)
        # Depthwise (feature_group_count == channels). SAME padding in XLA
        # matches TF's asymmetric SAME used by keras EfficientNet.
        x = nn.Conv(expanded, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=expanded, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype,
                    name="dw_conv")(x)
        x = self.norm(name="dw_bn")(x)
        x = self.activation(x)
        if self.se_ratio:
            x = SqueezeExcite(self.in_channels, self.se_ratio,
                              dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype,
                    name="project_conv")(x)
        x = self.norm(name="project_bn")(x)
        if self.stride == 1 and self.in_channels == self.out_channels:
            if train and self.drop_rate > 0.0:
                rng = self.make_rng("dropout")
                x = drop_connect(x, rng, self.drop_rate)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """Backbone; returns the post-head-conv feature map [B, H/32, W/32, C]."""

    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    drop_connect_rate: float = 0.2
    bn_momentum: float = 0.99
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=1e-3,
                       dtype=self.dtype)
        w = self.width_coefficient
        x = nn.Conv(round_filters(32, w), (3, 3), (2, 2), padding="SAME",
                    use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                    name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.swish(x)

        total_blocks = sum(round_repeats(r, self.depth_coefficient)
                           for _, _, r, _, _ in _B0_BLOCKS)
        block_idx = 0
        in_ch = round_filters(32, w)
        for stage, (expand, ch, repeats, stride, kernel) in enumerate(
                _B0_BLOCKS):
            out_ch = round_filters(ch, w)
            for rep in range(round_repeats(repeats, self.depth_coefficient)):
                drop = self.drop_connect_rate * block_idx / total_blocks
                x = MBConv(in_channels=in_ch, out_channels=out_ch,
                           expand_ratio=expand, kernel=kernel,
                           stride=stride if rep == 0 else 1,
                           drop_rate=drop, norm=norm, dtype=self.dtype,
                           name=f"stage{stage + 1}_block{rep + 1}")(
                               x, train=train)
                in_ch = out_ch
                block_idx += 1

        x = nn.Conv(round_filters(1280, w), (1, 1), use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype,
                    name="head_conv")(x)
        x = norm(name="head_bn")(x)
        return nn.swish(x)


def build_efficientnet(name: str, **kw) -> EfficientNet:
    if name not in SCALINGS:
        raise ValueError(f"unknown efficientnet variant {name!r}; "
                         f"valid: {sorted(SCALINGS)}")
    width, depth, _ = SCALINGS[name]
    return EfficientNet(width_coefficient=width, depth_coefficient=depth,
                        **kw)
