"""NASNet-A in Flax (Zoph et al. 2018, "Learning Transferable
Architectures for Scalable Image Recognition").

The last zoo name of the reference's backbone dispatch
(``embedding_net/backbones.py:100-104`` serves ``nasnetlarge`` /
``nasnetmobile`` via qubvel ``classification_models``). Mirrors
keras.applications.nasnet exactly — stem conv, two stem reduction cells,
3x ``num_blocks`` normal cells with a reduction cell between groups,
BN(momentum 0.9997, eps 1e-3), ``correct_pad`` asymmetric padding on
strided separable convs — and reuses the keras layer names, so
``pretrained.keras_nasnet_to_flax`` ports weights by a pure name walk.
Verified against a live Keras forward in ``tests/test_parity.py``.

``include_top=False`` semantics: returns the final relu'd
``penultimate_filters``-channel map (1056 mobile / 4032 large).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _correct_pad(x, k: int):
    """keras imagenet_utils.correct_pad: asymmetric zero-padding so a
    stride-2 VALID conv/pool covers the map like SAME would."""
    adjust = (1 - x.shape[1] % 2, 1 - x.shape[2] % 2)
    return ((k // 2 - adjust[0], k // 2), (k // 2 - adjust[1], k // 2))


def _avg_pool_same(x, window=(3, 3)):
    """AveragePooling2D(strides=1, padding='same'), TF mean semantics
    (padded cells excluded from the denominator)."""
    return nn.avg_pool(x, window, strides=(1, 1), padding="SAME",
                       count_include_pad=False)


class NASNet(nn.Module):
    penultimate_filters: int = 1056
    num_blocks: int = 4
    stem_block_filters: int = 32
    skip_reduction: bool = False
    filter_multiplier: int = 2
    bn_momentum: float = 0.9997
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if min(x.shape[1], x.shape[2]) < 32:
            raise ValueError(
                f"nasnet needs input >= 32px (keras min_size), got "
                f"{x.shape[1]}x{x.shape[2]}")

        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=self.bn_momentum, epsilon=1e-3,
                                dtype=self.dtype, name=name)(y)

        def conv(y, filters, name, kernel=(1, 1), strides=(1, 1),
                 padding="SAME"):
            return nn.Conv(filters, kernel, strides, padding=padding,
                           use_bias=False, dtype=self.dtype, name=name)(y)

        def sep_conv(y, filters, k, strides, padding, name):
            """SeparableConv2D(use_bias=False): depthwise + pointwise,
            matching keras' two-kernel weight layout."""
            in_ch = y.shape[-1]
            y = nn.Conv(in_ch, (k, k), strides, padding=padding,
                        feature_group_count=in_ch, use_bias=False,
                        dtype=self.dtype, name=f"{name}_dw")(y)
            return nn.Conv(filters, (1, 1), use_bias=False,
                           dtype=self.dtype, name=f"{name}_pw")(y)

        def sep_block(ip, filters, k=3, strides=(1, 1), bid=""):
            """_separable_conv_block: 2x [relu - sepconv - BN], the first
            sepconv optionally strided behind correct_pad."""
            y = nn.relu(ip)
            pad = _correct_pad(y, k) if strides == (2, 2) else "SAME"
            y = sep_conv(y, filters, k, strides, pad,
                         f"separable_conv_1_{bid}")
            y = bn(y, f"separable_conv_1_bn_{bid}")
            y = nn.relu(y)
            y = sep_conv(y, filters, k, (1, 1), "SAME",
                         f"separable_conv_2_{bid}")
            return bn(y, f"separable_conv_2_bn_{bid}")

        def adjust(p, ip, filters, bid):
            """_adjust_block: reconcile the previous-cell output with the
            current input's spatial size / channel count."""
            if p is None:
                return ip
            if p.shape[1] != ip.shape[1]:
                p = nn.relu(p)
                p1 = conv(p[:, ::2, ::2, :], filters // 2,
                          f"adjust_conv_1_{bid}")
                # shift one pixel down-right (zero at the far edge), then
                # stride-2 subsample — the zero-pad + crop + avgpool(1x1,2)
                # composite in keras.
                p2 = jnp.pad(p, ((0, 0), (0, 1), (0, 1), (0, 0)))[
                    :, 1::2, 1::2, :]
                p2 = conv(p2, filters // 2, f"adjust_conv_2_{bid}")
                return bn(jnp.concatenate([p1, p2], axis=-1),
                          f"adjust_bn_{bid}")
            if p.shape[-1] != filters:
                p = conv(nn.relu(p), filters,
                         f"adjust_conv_projection_{bid}")
                return bn(p, f"adjust_bn_{bid}")
            return p

        def normal_cell(ip, p, filters, bid):
            """_normal_a_cell (Fig. 4): 5 two-operand blocks, 6-way concat."""
            p = adjust(p, ip, filters, bid)
            h = bn(conv(nn.relu(ip), filters, f"normal_conv_1_{bid}"),
                   f"normal_bn_1_{bid}")
            x1 = (sep_block(h, filters, 5, bid=f"normal_left1_{bid}")
                  + sep_block(p, filters, 3, bid=f"normal_right1_{bid}"))
            x2 = (sep_block(p, filters, 5, bid=f"normal_left2_{bid}")
                  + sep_block(p, filters, 3, bid=f"normal_right2_{bid}"))
            x3 = _avg_pool_same(h) + p
            x4 = _avg_pool_same(p) + _avg_pool_same(p)
            x5 = sep_block(h, filters, 3, bid=f"normal_left5_{bid}") + h
            return jnp.concatenate([p, x1, x2, x3, x4, x5], axis=-1), ip

        def reduction_cell(ip, p, filters, bid):
            """_reduction_a_cell (Fig. 4): strided blocks, 4-way concat."""
            p = adjust(p, ip, filters, bid)
            h = bn(conv(nn.relu(ip), filters, f"reduction_conv_1_{bid}"),
                   f"reduction_bn_1_{bid}")
            # keras pools a ZeroPadding2D(correct_pad) output with VALID
            # windows — the max pads with ZEROS (not -inf) and the avg
            # counts the zeros in its denominator, so pad explicitly.
            pad3 = _correct_pad(h, 3)
            h3 = jnp.pad(h, ((0, 0), pad3[0], pad3[1], (0, 0)))
            x1 = (sep_block(h, filters, 5, (2, 2),
                            bid=f"reduction_left1_{bid}")
                  + sep_block(p, filters, 7, (2, 2),
                              bid=f"reduction_right1_{bid}"))
            x2 = (nn.max_pool(h3, (3, 3), (2, 2), padding="VALID")
                  + sep_block(p, filters, 7, (2, 2),
                              bid=f"reduction_right2_{bid}"))
            x3 = (nn.avg_pool(h3, (3, 3), (2, 2), padding="VALID")
                  + sep_block(p, filters, 5, (2, 2),
                              bid=f"reduction_right3_{bid}"))
            x4 = x2 + _avg_pool_same(x1)
            x5 = (sep_block(x1, filters, 3, bid=f"reduction_left4_{bid}")
                  + nn.max_pool(h3, (3, 3), (2, 2), padding="VALID"))
            return jnp.concatenate([x2, x3, x4, x5], axis=-1), ip

        mult = self.filter_multiplier
        filters = self.penultimate_filters // 24
        x = conv(x, self.stem_block_filters, "stem_conv1", kernel=(3, 3),
                 strides=(2, 2), padding="VALID")
        x = bn(x, "stem_bn1")

        p = None
        x, p = reduction_cell(x, p, filters // (mult ** 2), "stem_1")
        x, p = reduction_cell(x, p, filters // mult, "stem_2")
        for i in range(self.num_blocks):
            x, p = normal_cell(x, p, filters, f"{i}")
        x, p0 = reduction_cell(x, p, filters * mult,
                               f"reduce_{self.num_blocks}")
        p = p if self.skip_reduction else p0
        for i in range(self.num_blocks):
            x, p = normal_cell(x, p, filters * mult,
                               f"{self.num_blocks + i + 1}")
        x, p0 = reduction_cell(x, p, filters * mult ** 2,
                               f"reduce_{2 * self.num_blocks}")
        p = p if self.skip_reduction else p0
        for i in range(self.num_blocks):
            x, p = normal_cell(x, p, filters * mult ** 2,
                               f"{2 * self.num_blocks + i + 1}")
        return nn.relu(x)


def nasnetmobile(bn_momentum: float = 0.9997, **kw) -> NASNet:
    """NASNet-A (4 @ 1056) — keras.applications.NASNetMobile."""
    return NASNet(penultimate_filters=1056, num_blocks=4,
                  stem_block_filters=32, skip_reduction=False,
                  bn_momentum=bn_momentum, **kw)


def nasnetlarge(bn_momentum: float = 0.9997, **kw) -> NASNet:
    """NASNet-A (6 @ 4032) — keras.applications.NASNetLarge."""
    return NASNet(penultimate_filters=4032, num_blocks=6,
                  stem_block_filters=96, skip_reduction=True,
                  bn_momentum=bn_momentum, **kw)
