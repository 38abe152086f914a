"""VGG-16/19 in Flax (reference zoo surface, ``backbones.py:100-104``).

Plain 3x3-conv stacks with biases + 2x2 maxpools, matching
keras.applications.vgg16/vgg19 ``include_top=False`` layer for layer;
``pretrained.keras_vgg_to_flax`` ports weights verbatim (<1e-5,
``tests/test_parity.py``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class VGG(nn.Module):
    blocks: Sequence[Tuple[int, int]]   # (channels, n_convs) per block
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train  # no BN / dropout in the conv trunk
        for b, (ch, n_convs) in enumerate(self.blocks, start=1):
            for c in range(1, n_convs + 1):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"block{b}_conv{c}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def vgg16(**kw) -> VGG:
    kw.pop("bn_momentum", None)  # registry passes it; VGG has no BN
    return VGG(blocks=((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)),
               **kw)


def vgg19(**kw) -> VGG:
    kw.pop("bn_momentum", None)
    return VGG(blocks=((64, 2), (128, 2), (256, 4), (512, 4), (512, 4)),
               **kw)
