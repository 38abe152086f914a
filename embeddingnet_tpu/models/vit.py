"""Vision Transformer backbones (stretch surface, SURVEY.md §7 item 8).

CLIP-style ViT (pre-norm blocks, learned position embeddings, class token)
through the same backbone registry/config API as the CNNs — the modern
embedding-model configs (``BASELINE.json`` configs[4]: "CLIP ViT-L backbone
with ArcFace-style margin loss"). Returns the patch-token grid as a 4D
[B, H/p, W/p, D] feature map so the standard GAP embedding head applies
(mean-pool-over-patches — CLIP's attention-pool cousin); the class token
is folded in by averaging it into the grid.

Transformer layers are MXU-friendly by construction: all matmuls, static
shapes, fused attention via jnp.einsum (XLA flash-fuses at these sequence
lengths; L <= 257 needs no manual blocking — SURVEY.md §5 long-context
note).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        # exact (erf) GELU: matches torch/HF ViT checkpoints; the tanh
        # approximation drifts ~1e-3/layer through a 12-block stack
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y = MlpBlock(self.dim, self.dim * self.mlp_ratio, dtype=self.dtype,
                     name="mlp")(y)
        return x + y


class ViT(nn.Module):
    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, _ = x.shape
        if h % self.patch or w % self.patch:
            raise ValueError(
                f"input {h}x{w} not divisible by patch {self.patch}")
        gh, gw = h // self.patch, w // self.patch
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, gh * gw, self.dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)).astype(
            x.dtype), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, self.dim))
        x = x + pos.astype(x.dtype)

        for i in range(self.depth):
            x = EncoderBlock(self.dim, self.heads, dtype=self.dtype,
                             name=f"block{i + 1}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)

        cls_tok = x[:, :1, :]                       # [B, 1, D]
        grid = x[:, 1:, :].reshape(b, gh, gw, self.dim)
        # fold the class token into the grid so GAP sees it with weight
        # 1/(gh*gw) relative to each patch
        return grid + cls_tok[:, :, None, :] / (gh * gw)


_VARIANTS = {
    "vit-b32": dict(patch=32, dim=768, depth=12, heads=12),
    "vit-b16": dict(patch=16, dim=768, depth=12, heads=12),
    "vit-l16": dict(patch=16, dim=1024, depth=24, heads=16),
    "vit-l14": dict(patch=14, dim=1024, depth=24, heads=16),
}


def build_vit(name: str, **kw) -> ViT:
    if name not in _VARIANTS:
        raise ValueError(f"unknown vit variant {name!r}; "
                         f"valid: {sorted(_VARIANTS)}")
    return ViT(**_VARIANTS[name], **kw)
