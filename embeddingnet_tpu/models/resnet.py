"""ResNet family (18/34/50/101/152) in Flax.

TPU-native replacement for the reference's qubvel ``classification_models``
backbones (``embedding_net/backbones.py:100-104`` — any non-simple,
non-efficientnet ``backbone_name`` resolves to that zoo, most commonly
``resnet18``/``resnet50``). ``include_top=False`` semantics: the module
returns the final feature map; the embedding head is attached by
:class:`embeddingnet_tpu.models.registry.EmbeddingModule`.

Architecture is standard He et al. v1 post-activation. ``stride_in_3x3``
selects where a stage's downsampling stride lives in bottleneck blocks:
``True`` = torchvision "v1.5" placement (3x3 conv — today's default),
``False`` = original / keras.applications placement (first 1x1) — use the
latter when porting keras.applications ResNet50 weights.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from embeddingnet_tpu.ops.fused_conv import (BNScaleBias, FastConv3x3,
                                              FusedBNReluConv3x3)

Dtype = Any

he_normal = nn.initializers.he_normal


def _conv3x3(filters, strides, groups, use_bias, dtype, fast, name):
    """3x3 conv factory: the Pallas small-spatial path
    (``PERFORMANCE.pallas_conv``) when enabled and bias-free, else
    ``nn.Conv``. Both have the identical ``kernel`` param, so the flag
    never changes checkpoints or weight ports; FastConv3x3 itself falls
    back to ``lax`` for ineligible static shapes (stride 2, big maps).

    ``fast`` is False/True/"spmd": "spmd" (set by the Trainer under a
    >1-device mesh) selects the custom_partitioning-wrapped kernels so
    the convs shard over the batch mesh axis instead of gathering."""
    if fast and not use_bias:
        return FastConv3x3(filters, strides=tuple(strides),
                           feature_group_count=groups,
                           kernel_init=he_normal(), dtype=dtype,
                           spmd=(fast == "spmd"), name=name)
    return nn.Conv(filters, (3, 3), strides, padding=((1, 1), (1, 1)),
                   use_bias=use_bias, feature_group_count=groups,
                   kernel_init=he_normal(), dtype=dtype, name=name)


def _can_fuse_bn_conv(norm, fast, use_bias, groups, strides) -> bool:
    """Static gate for replacing a ``bn -> relu -> 3x3 conv`` chain with
    the fused :class:`BNScaleBias` + :class:`FusedBNReluConv3x3` pair
    (``PERFORMANCE.pallas_conv``): the norm must be a plain
    ``nn.BatchNorm`` partial, the conv bias-free/ungrouped/stride-1.
    The fused modules keep the exact unfused param/variable tree, so
    this only toggles the compute path, never the checkpoint format."""
    return (bool(fast) and not use_bias and groups == 1
            and tuple(strides) == (1, 1)
            and getattr(norm, "func", norm) is nn.BatchNorm)


def _fused_bn_relu_conv(norm, filters, dtype, fast, bn_name, conv_name, x):
    """``bn(bn_name) -> relu -> conv3x3(conv_name)`` with the BN affine
    apply + ReLU folded into the conv's Pallas prologue where the shape
    is eligible (ops/fused_conv.py "BN-apply + ReLU"): the normalized
    activation never round-trips HBM; batch statistics (and the running
    -average update) stay exact ``nn.BatchNorm`` semantics inside
    :class:`BNScaleBias`."""
    scale, bias = BNScaleBias(name=bn_name,
                              **dict(getattr(norm, "keywords", {})))(x)
    return FusedBNReluConv3x3(filters, kernel_init=he_normal(),
                              dtype=dtype, spmd=(fast == "spmd"),
                              name=conv_name)(x, scale, bias)


class SEModule(nn.Module):
    """Squeeze-excitation (Hu et al.) for the SE-ResNet variants the
    reference reaches through the qubvel zoo (``backbones.py:100-104``)."""

    channels: int
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(max(self.channels // self.reduction, 1),
                     dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)[:, None, None, :]


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity shortcut (ResNet-18/34)."""

    filters: int
    strides: tuple = (1, 1)
    norm: Callable = nn.BatchNorm
    use_bias: bool = False
    use_se: bool = False
    fast_conv: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        residual = x
        # explicit symmetric (1,1) padding: equals SAME at stride 1 and
        # matches torch's conv semantics at stride 2 (TF-SAME pads
        # asymmetrically there)
        y = _conv3x3(self.filters, self.strides, 1, self.use_bias,
                     self.dtype, self.fast_conv, "conv1")(x)
        if _can_fuse_bn_conv(self.norm, self.fast_conv, self.use_bias,
                             1, (1, 1)):
            y = _fused_bn_relu_conv(self.norm, self.filters, self.dtype,
                                    self.fast_conv, "bn1", "conv2", y)
        else:
            y = self.norm(name="bn1")(y)
            y = nn.relu(y)
            y = _conv3x3(self.filters, (1, 1), 1, self.use_bias,
                         self.dtype, self.fast_conv, "conv2")(y)
        y = self.norm(name="bn2")(y)
        if self.use_se:
            y = SEModule(self.filters, dtype=self.dtype, name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), self.strides,
                               use_bias=self.use_bias, kernel_init=he_normal(),
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(residual + y)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1(4x) bottleneck (ResNet-50/101/152)."""

    filters: int
    strides: tuple = (1, 1)
    norm: Callable = nn.BatchNorm
    stride_in_3x3: bool = True
    use_bias: bool = False
    use_se: bool = False
    groups: int = 1      # >1 = ResNeXt grouped 3x3
    expansion: int = 4   # out_channels = filters * expansion (ResNeXt: 2)
    fast_conv: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        residual = x
        s1 = (1, 1) if self.stride_in_3x3 else self.strides
        s3 = self.strides if self.stride_in_3x3 else (1, 1)
        y = nn.Conv(self.filters, (1, 1), s1, use_bias=self.use_bias,
                    kernel_init=he_normal(), dtype=self.dtype,
                    name="conv1")(x)
        if _can_fuse_bn_conv(self.norm, self.fast_conv, self.use_bias,
                             self.groups, s3):
            y = _fused_bn_relu_conv(self.norm, self.filters, self.dtype,
                                    self.fast_conv, "bn1", "conv2", y)
        else:
            y = self.norm(name="bn1")(y)
            y = nn.relu(y)
            y = _conv3x3(self.filters, s3, self.groups, self.use_bias,
                         self.dtype, self.fast_conv, "conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * self.expansion, (1, 1),
                    use_bias=self.use_bias,
                    kernel_init=he_normal(), dtype=self.dtype,
                    name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if self.use_se:
            y = SEModule(self.filters * self.expansion, dtype=self.dtype,
                         name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * self.expansion, (1, 1),
                               self.strides,
                               use_bias=self.use_bias, kernel_init=he_normal(),
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """Generic ResNet backbone; returns the final [B, H/32, W/32, C] map."""

    stage_sizes: Sequence[int]
    block_cls: Any
    num_filters: int = 64
    stride_in_3x3: bool = True
    use_bias: bool = False  # True for keras.applications weight ports
    use_se: bool = False    # SE-ResNet variants
    groups: int = 1         # >1 = ResNeXt (grouped bottleneck 3x3)
    width_per_group: int = 64
    bn_epsilon: float = 1.001e-5  # keras.applications resnet epsilon
    bn_momentum: float = 0.99
    fast_conv: bool = False  # PERFORMANCE.pallas_conv small-spatial path
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                       dtype=self.dtype)
        x = nn.Conv(self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=self.use_bias, kernel_init=he_normal(),
                    dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                filters = self.num_filters * 2 ** i
                expansion = 4
                if self.groups > 1:
                    # canonical ResNeXt (e.g. 32x4d): mid width =
                    # groups * width_per_group * 2^i, expansion 2
                    filters = (self.groups * self.width_per_group
                               * 2 ** i)
                    expansion = (self.num_filters * 4
                                 // (self.groups * self.width_per_group))
                kwargs = dict(filters=filters,
                              strides=strides, norm=norm, dtype=self.dtype,
                              use_bias=self.use_bias, use_se=self.use_se,
                              fast_conv=self.fast_conv,
                              name=f"stage{i + 1}_block{j + 1}")
                if self.block_cls is BottleneckBlock:
                    kwargs["stride_in_3x3"] = self.stride_in_3x3
                    kwargs["groups"] = self.groups
                    kwargs["expansion"] = expansion
                x = self.block_cls(**kwargs)(x)
        return x


def resnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BottleneckBlock, **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), block_cls=BottleneckBlock, **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 8, 36, 3), block_cls=BottleneckBlock, **kw)


def seresnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock,
                  use_se=True, **kw)


def seresnet34(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock,
                  use_se=True, **kw)


def seresnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BottleneckBlock,
                  use_se=True, **kw)


def seresnet101(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), block_cls=BottleneckBlock,
                  use_se=True, **kw)


def seresnet152(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 8, 36, 3), block_cls=BottleneckBlock,
                  use_se=True, **kw)


def seresnext50(**kw) -> ResNet:
    """SE-ResNeXt-50 32x4d (qubvel zoo name ``seresnext50``)."""
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BottleneckBlock,
                  groups=32, width_per_group=4, use_se=True, **kw)


def seresnext101(**kw) -> ResNet:
    """SE-ResNeXt-101 32x4d (the zoo's seresnext101 uses base width 4)."""
    return ResNet(stage_sizes=(3, 4, 23, 3), block_cls=BottleneckBlock,
                  groups=32, width_per_group=4, use_se=True, **kw)


def resnext50(**kw) -> ResNet:
    """ResNeXt-50 32x4d."""
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BottleneckBlock,
                  groups=32, width_per_group=4, **kw)


def resnext101(**kw) -> ResNet:
    """ResNeXt-101 32x8d."""
    return ResNet(stage_sizes=(3, 4, 23, 3), block_cls=BottleneckBlock,
                  groups=32, width_per_group=8, **kw)


class SENet154Block(nn.Module):
    """The SENet-154 bottleneck (Hu et al. 2018, the competition model;
    qubvel zoo name ``senet154``): 1x1 -> planes*2, grouped 3x3 ->
    planes*4 (groups=64), 1x1 -> planes*4, SE(reduction 16); the
    downsample shortcut uses a 3x3 conv (pad 1) instead of 1x1."""

    planes: int
    strides: tuple = (1, 1)
    norm: Callable = nn.BatchNorm
    groups: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        residual = x
        out_ch = self.planes * 4
        y = nn.Conv(self.planes * 2, (1, 1), use_bias=False,
                    kernel_init=he_normal(), dtype=self.dtype,
                    name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (3, 3), self.strides, padding=((1, 1), (1, 1)),
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=he_normal(), dtype=self.dtype,
                    name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, kernel_init=he_normal(),
                    dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        y = SEModule(out_ch, dtype=self.dtype, name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(out_ch, (3, 3), self.strides,
                               padding=((1, 1), (1, 1)), use_bias=False,
                               kernel_init=he_normal(), dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(residual + y)


class SENet154(nn.Module):
    """SENet-154 backbone: 3-conv stem (64, 64, 128) + (3, 8, 36, 3)
    stages of :class:`SENet154Block`. Returns the final 2048-ch map."""

    bn_epsilon: float = 1e-5
    bn_momentum: float = 0.99
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                       dtype=self.dtype)
        for i, (ch, s) in enumerate(((64, 2), (64, 1), (128, 1)), start=1):
            x = nn.Conv(ch, (3, 3), (s, s), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=he_normal(),
                        dtype=self.dtype, name=f"stem_conv{i}")(x)
            x = norm(name=f"stem_bn{i}")(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, block_count in enumerate((3, 8, 36, 3)):
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = SENet154Block(planes=64 * 2 ** i, strides=strides,
                                  norm=norm, dtype=self.dtype,
                                  name=f"stage{i + 1}_block{j + 1}")(x)
        return x


def senet154(**kw) -> SENet154:
    return SENet154(**kw)
