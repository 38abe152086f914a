"""Vision Transformer backbones (stretch surface, SURVEY.md §7 item 8).

CLIP-style ViT (pre-norm blocks, learned position embeddings, class token)
through the same backbone registry/config API as the CNNs — the modern
embedding-model configs (``BASELINE.json`` configs[4]: "CLIP ViT-L backbone
with ArcFace-style margin loss"). Returns the patch-token grid as a 4D
[B, H/p, W/p, D] feature map so the standard GAP embedding head applies
(mean-pool-over-patches — CLIP's attention-pool cousin); the class token
is folded in by averaging it into the grid.

Two architecture families share this module:

* plain ViT (``vit-b16``/``vit-b32``/``vit-l16``): the HF
  ``transformers.ViTModel`` layout — exact GELU, biased patch embed, no
  pre-transformer LayerNorm. Weight source: ``hf_vit_to_flax``.
* CLIP vision tower (``vit-l14``): OpenAI CLIP's variant — ``ln_pre``
  after embedding, quick-GELU (``x * sigmoid(1.702 x)``), bias-free
  patch embed, and the ``visual_projection`` into the joint text-image
  space applied to every token (CLIP itself projects only the class
  token; projecting the grid too is the standard dense-feature reading
  and keeps the 4D backbone contract). Weight source:
  ``clip_vit_to_flax`` (models/pretrained.py). ViT-L/14 exists publicly
  *only* as a CLIP checkpoint, so the registry name ``vit-l14`` means
  the CLIP tower.

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


def quick_gelu(x):
    """CLIP's activation (openai/CLIP model.py QuickGELU): cheaper sigmoid
    approximation the checkpoints were trained with — substituting exact
    GELU drifts ~1e-2 per block."""
    return x * nn.sigmoid(1.702 * x)


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    use_quick_gelu: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        if self.use_quick_gelu:
            x = quick_gelu(x)
        else:
            # exact (erf) GELU: matches torch/HF ViT checkpoints; the tanh
            # approximation drifts ~1e-3/layer through a 12-block stack
            x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    use_quick_gelu: bool = False
    ln_eps: float = 1e-12
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="ln2")(x)
        y = MlpBlock(self.dim, self.dim * self.mlp_ratio,
                     use_quick_gelu=self.use_quick_gelu, dtype=self.dtype,
                     name="mlp")(y)
        return x + y


class ViT(nn.Module):
    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    # CLIP vision-tower knobs (HF CLIPVisionModel layout):
    ln_pre: bool = False        # LayerNorm after embedding, before blocks
    use_quick_gelu: bool = False
    patch_bias: bool = True     # CLIP's patch conv has no bias
    proj_dim: Optional[int] = None  # visual_projection into CLIP space
    # Checkpoint-exact LayerNorm eps: HF ViT default 1e-12, CLIP 1e-5.
    ln_eps: float = 1e-12

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_tokens: bool = False) -> jnp.ndarray:
        """[B, H, W, C] -> [B, H/p, W/p, D] patch grid (class token folded).

        ``return_tokens=True`` returns the raw [B, 1+L, D] token sequence
        after the final LayerNorm (and projection, if configured) instead —
        token 0 is then exactly CLIP's ``image_embeds`` path
        (``visual_projection(post_layernorm(cls))``), used by the
        checkpoint-parity tests.
        """
        b, h, w, _ = x.shape
        if h % self.patch or w % self.patch:
            raise ValueError(
                f"input {h}x{w} not divisible by patch {self.patch}")
        gh, gw = h // self.patch, w // self.patch
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    use_bias=self.patch_bias,
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, gh * gw, self.dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)).astype(
            x.dtype), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, self.dim))
        x = x + pos.astype(x.dtype)
        if self.ln_pre:
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                             name="ln_pre")(x)

        for i in range(self.depth):
            x = EncoderBlock(self.dim, self.heads,
                             use_quick_gelu=self.use_quick_gelu,
                             ln_eps=self.ln_eps,
                             dtype=self.dtype, name=f"block{i + 1}")(x)
        # plain ViT: HF final layernorm; CLIP: post_layernorm. CLIP applies
        # it only to the class token — extending it to every token is the
        # standard dense-feature reading (deliberate, documented deviation).
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="ln_final")(x)
        if self.proj_dim is not None:
            x = nn.Dense(self.proj_dim, use_bias=False, dtype=self.dtype,
                         name="proj")(x)
        if return_tokens:
            return x

        out_dim = x.shape[-1]
        cls_tok = x[:, :1, :]                       # [B, 1, D]
        grid = x[:, 1:, :].reshape(b, gh, gw, out_dim)
        # fold the class token into the grid so GAP sees it with weight
        # 1/(gh*gw) relative to each patch
        return grid + cls_tok[:, :, None, :] / (gh * gw)


_VARIANTS = {
    "vit-b32": dict(patch=32, dim=768, depth=12, heads=12),
    "vit-b16": dict(patch=16, dim=768, depth=12, heads=12),
    "vit-l16": dict(patch=16, dim=1024, depth=24, heads=16),
    # ViT-L/14 is CLIP's vision tower (the only public L/14 checkpoints);
    # projection 768 = CLIP ViT-L/14 joint-space width.
    "vit-l14": dict(patch=14, dim=1024, depth=24, heads=16,
                    ln_pre=True, use_quick_gelu=True, patch_bias=False,
                    proj_dim=768, ln_eps=1e-5),
    # CLIP ViT-B towers, for loading openai/clip-vit-base-* checkpoints.
    "clip-vit-b32": dict(patch=32, dim=768, depth=12, heads=12,
                         ln_pre=True, use_quick_gelu=True, patch_bias=False,
                         proj_dim=512, ln_eps=1e-5),
    "clip-vit-b16": dict(patch=16, dim=768, depth=12, heads=12,
                         ln_pre=True, use_quick_gelu=True, patch_bias=False,
                         proj_dim=512, ln_eps=1e-5),
}


def build_vit(name: str, **kw) -> ViT:
    if name not in _VARIANTS:
        raise ValueError(f"unknown vit variant {name!r}; "
                         f"valid: {sorted(_VARIANTS)}")
    return ViT(**_VARIANTS[name], **kw)
