"""On-device batch augmentation: the albumentations presets as JAX kernels.

The reference applies albumentations per image on host inside the
generator (``embedding_net/augmentations.py:4-55`` applied at
``datagenerators.py:154``) — a Python loop over cv2 ops on the training
thread. Here each preset is a fused batch transform over float BGR images
in 0..255 space, with per-image Bernoulli gates and parameter draws from a
threaded PRNG key: the whole pipeline jits into the train step and runs on
the VPU, overlapped with nothing because it *is* part of the step.

Preset parity (same ops, same probabilities, same parameter ranges):

* ``default``  — brightness/contrast, gamma, HSV shift, CLAHE, blur,
  gauss-noise (``augmentations.py:5-14``);
* ``plates``   — default + H/V flips + random-crop-to-2/3
  (``augmentations.py:15-29``; the reference's crop *changes the output
  shape* which would break the fixed-input model — here crop-and-resize
  keeps shapes static, the TPU-correct reading of the intent);
* ``deepfake`` — horizontal flip only (``augmentations.py:30-33``);
* ``plates2``  — CLAHE, flips, brightness, contrast, rot90, HSV, noise,
  center-crop-2/3 + resize back (``augmentations.py:34-51``).

CLAHE: true tile-based CLAHE (per-tile clipped CDFs + bilinear
interpolation between tile centers) implemented gather-free via
half-tile-shifted blocking (``clahe_tiled`` — closes the SURVEY.md §7
hard-part); a cheaper global approximation (``clahe_approx``) remains as
the fallback for tile-indivisible shapes.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

Image = jnp.ndarray  # [B, H, W, 3] float32, 0..255, BGR


def _gate(rng: jax.Array, p: float, batch: int) -> jnp.ndarray:
    """Per-image Bernoulli application mask [B, 1, 1, 1]."""
    return jax.random.bernoulli(rng, p, (batch, 1, 1, 1)).astype(jnp.float32)


def _blend(x: Image, y: Image, mask: jnp.ndarray) -> Image:
    return x * (1.0 - mask) + y * mask


def _uniform(rng, batch, lo, hi):
    return jax.random.uniform(rng, (batch, 1, 1, 1), minval=lo, maxval=hi)


# -- color ops -------------------------------------------------------------

def brightness_contrast(x: Image, rng: jax.Array, p: float = 0.4,
                        brightness_limit: float = 0.2,
                        contrast_limit: float = 0.2) -> Image:
    """albumentations RandomBrightnessContrast defaults
    (brightness_by_max=True: beta scales 255)."""
    b = x.shape[0]
    r1, r2, r3 = jax.random.split(rng, 3)
    alpha = 1.0 + _uniform(r1, b, -contrast_limit, contrast_limit)
    beta = _uniform(r2, b, -brightness_limit, brightness_limit) * 255.0
    out = jnp.clip(x * alpha + beta, 0.0, 255.0)
    return _blend(x, out, _gate(r3, p, b))


def random_brightness(x: Image, rng: jax.Array, p: float = 0.3,
                      limit: float = 0.2) -> Image:
    b = x.shape[0]
    r1, r2 = jax.random.split(rng)
    beta = _uniform(r1, b, -limit, limit) * 255.0
    return _blend(x, jnp.clip(x + beta, 0, 255), _gate(r2, p, b))


def random_contrast(x: Image, rng: jax.Array, p: float = 0.3,
                    limit: float = 0.2) -> Image:
    b = x.shape[0]
    r1, r2 = jax.random.split(rng)
    alpha = 1.0 + _uniform(r1, b, -limit, limit)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return _blend(x, jnp.clip((x - mean) * alpha + mean, 0, 255),
                  _gate(r2, p, b))


def random_gamma(x: Image, rng: jax.Array, p: float = 0.4,
                 gamma_limit: Tuple[float, float] = (80.0, 120.0)) -> Image:
    b = x.shape[0]
    r1, r2 = jax.random.split(rng)
    gamma = _uniform(r1, b, gamma_limit[0] / 100.0, gamma_limit[1] / 100.0)
    out = 255.0 * jnp.power(jnp.clip(x / 255.0, 1e-6, 1.0), gamma)
    return _blend(x, out, _gate(r2, p, b))


def _bgr_to_hsv(x: Image):
    """cv2-convention HSV from BGR floats (H in [0, 360) here; V 0..255)."""
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-6), 0.0)
    safe = jnp.maximum(delta, 1e-6)
    h = jnp.where(
        maxc == r, (g - b) / safe % 6.0,
        jnp.where(maxc == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = h * 60.0
    h = jnp.where(delta == 0, 0.0, h)
    return h, s, v


def _hsv_to_bgr(h, s, v) -> Image:
    """Branchless (Lolengine/K-function) HSV->RGB: algebraically identical
    to the 6-sector select form but ~3 elementwise ops per channel instead
    of a 6-way select chain — the select version measured 2x the VPU time
    at batch 1024 (docs/BENCHMARKS.md augmentation table)."""
    h = (h % 360.0) / 60.0

    def channel(n):
        k = (n + h) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    r = channel(5.0)
    g = channel(3.0)
    b = channel(1.0)
    return jnp.stack([b, g, r], axis=-1)


def hue_saturation_value(x: Image, rng: jax.Array, p: float = 0.4,
                         hue_shift_limit: float = 20.0,
                         sat_shift_limit: float = 30.0,
                         val_shift_limit: float = 30.0) -> Image:
    """HSV jitter in cv2 units: hue limit in cv2's 0..180 H scale
    (albumentations passes shifts straight to cv2)."""
    b = x.shape[0]
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    h, s, v = _bgr_to_hsv(x)
    # cv2 H unit = 2 degrees
    h_shift = _uniform(r1, b, -hue_shift_limit, hue_shift_limit)[..., 0] * 2.0
    s_shift = _uniform(r2, b, -sat_shift_limit, sat_shift_limit)[..., 0] / 255.0
    v_shift = _uniform(r3, b, -val_shift_limit, val_shift_limit)[..., 0]
    out = _hsv_to_bgr(h + h_shift, jnp.clip(s + s_shift, 0, 1),
                      jnp.clip(v + v_shift, 0, 255))
    return _blend(x, out, _gate(r4, p, b))


def clahe_approx(x: Image, rng: jax.Array, p: float = 0.4,
                 clip_limit: float = 4.0, n_bins: int = 64,
                 chunk: int = 32) -> Image:
    """Contrast-limited *global* histogram equalization on luminance —
    XLA-friendly CLAHE approximation (see module docstring).

    Histogram and CDF lookup are chunked broadcast-compare reductions
    (streamed on the VPU) — per-element scatter/gather would serialize on
    TPU (a scatter-add histogram at batch 1024 never finished compiling).
    64 bins keep the compare volume down; visually indistinguishable from
    256 for 8-bit contrast limiting.
    """
    b, hh, ww, _ = x.shape
    lum = 0.114 * x[..., 0] + 0.587 * x[..., 1] + 0.299 * x[..., 2]  # BGR
    flat = lum.reshape(b, -1)
    n = flat.shape[1]
    bins = jnp.clip((flat / 256.0 * n_bins).astype(jnp.int32), 0, n_bins - 1)

    # histogram: sum over pixels of (bin == level), level-chunked
    hists = []
    for k0 in range(0, n_bins, chunk):
        ks = k0 + jnp.arange(chunk, dtype=jnp.int32)
        hists.append(jnp.sum(
            (bins[:, :, None] == ks[None, None, :]).astype(jnp.float32),
            axis=1))
    hist = jnp.concatenate(hists, axis=1)                  # [B, n_bins]

    clip_count = clip_limit * n / n_bins
    clipped = jnp.minimum(hist, clip_count)
    excess = (jnp.sum(hist, axis=1, keepdims=True)
              - jnp.sum(clipped, axis=1, keepdims=True))
    cdf = jnp.cumsum(clipped + excess / n_bins, axis=1) / n  # [B, n_bins]

    # mapped[b, i] = cdf[b, bins[b, i]] as compare-multiply-reduce
    mapped = jnp.zeros_like(flat)
    for k0 in range(0, n_bins, chunk):
        ks = k0 + jnp.arange(chunk, dtype=jnp.int32)
        sel = (bins[:, :, None] == ks[None, None, :]).astype(jnp.float32)
        mapped = mapped + jnp.einsum("bik,bk->bi", sel,
                                     cdf[:, k0:k0 + chunk])
    mapped = mapped * 255.0

    new_lum = mapped.reshape(b, hh, ww)
    ratio = (new_lum / jnp.maximum(lum, 1e-3))[..., None]
    out = jnp.clip(x * ratio, 0, 255)
    return _blend(x, out, _gate(rng, p, b))


def clahe_tiled(x: Image, rng: jax.Array, p: float = 0.4,
                clip_limit: float = 4.0, grid: int = 4,
                n_bins: int = 64, chunk: int = 32,
                stats_stride: int = 2) -> Image:
    """True tile-based CLAHE on device (grid x grid tiles, bilinear
    interpolation between tile CDFs — the cv2 algorithm structure).

    Gather-free: pixels are re-blocked on a half-tile-shifted grid where
    every block shares the same four corner tiles, so the per-pixel CDF
    lookup becomes a block-wise compare-multiply-reduce against four
    statically-selected tile CDFs. Requires H and W divisible by
    ``2 * grid``. Matches a numpy oracle of the same definition exactly;
    differs from cv2.createCLAHE only in its integer-LUT rounding.

    ``stats_stride``: tile histograms are computed from every s-th pixel
    in each axis (s^2-fold cheaper statistics). Deliberate deviation from
    cv2 (which uses every pixel): the output shifts by ~2 gray levels
    mean on natural images (64px, grid 4 — measured 2.1 on the synthetic
    road signs, 3.2 on smooth gradients, 5.5 worst-case on uniform
    noise), i.e. a slightly different draw of an already-random contrast
    augmentation, not a correctness change. The *mapping* still runs per
    pixel. Set ``stats_stride=1`` for reference-exact statistics (the
    cv2-agreement test does).
    """
    b, hh, ww, _ = x.shape
    th, tw = hh // grid, ww // grid
    s = stats_stride
    if (th * grid != hh or tw * grid != ww or th % 2 or tw % 2
            or th % s or tw % s):
        # fall back for awkward shapes rather than mis-tile
        return clahe_approx(x, rng, p=p, clip_limit=clip_limit,
                            n_bins=n_bins, chunk=chunk)

    lum = 0.114 * x[..., 0] + 0.587 * x[..., 1] + 0.299 * x[..., 2]  # BGR
    bins = jnp.clip((lum / 256.0 * n_bins).astype(jnp.int32), 0, n_bins - 1)

    # per-tile clipped-CDFs from strided tile pixels: [B, G, G, n_bins]
    bins_s = bins[:, ::s, ::s]
    ths, tws = th // s, tw // s
    tile_bins = bins_s.reshape(b, grid, ths, grid, tws).transpose(
        0, 1, 3, 2, 4)
    tile_bins = tile_bins.reshape(b, grid * grid, ths * tws)
    hists = []
    for k0 in range(0, n_bins, chunk):
        ks = k0 + jnp.arange(chunk, dtype=jnp.int32)
        hists.append(jnp.sum(
            (tile_bins[:, :, :, None] == ks[None, None, None, :]
             ).astype(jnp.float32), axis=2))
    hist = jnp.concatenate(hists, axis=2)            # [B, G*G, n_bins]
    npix = ths * tws
    clip_count = clip_limit * npix / n_bins
    clipped = jnp.minimum(hist, clip_count)
    excess = (jnp.sum(hist, axis=2, keepdims=True)
              - jnp.sum(clipped, axis=2, keepdims=True))
    cdf = jnp.cumsum(clipped + excess / n_bins, axis=2) / npix
    cdf = cdf.reshape(b, grid, grid, n_bins)

    # half-tile-shifted blocking: edge-pad by (th/2, tw/2); shifted block
    # (i, j) of the padded image interpolates corner tiles
    # (i-1, i) x (j-1, j), clamped — identical for every pixel in it.
    hy, hx = th // 2, tw // 2
    bins_p = jnp.pad(bins, ((0, 0), (hy, hy), (hx, hx)), mode="edge")
    gb = grid + 1
    blocks = bins_p.reshape(b, gb, th, gb, tw).transpose(0, 1, 3, 2, 4)
    blocks = blocks.reshape(b, gb * gb, th * tw)     # [B, (G+1)^2, npix]

    iy = jnp.arange(gb)
    low = jnp.clip(iy - 1, 0, grid - 1)              # corner tile indices
    high = jnp.clip(iy, 0, grid - 1)

    # intra-block bilinear weights (position within the shifted block)
    py = (jnp.arange(th) + 0.5) / th                 # weight of 'high' in y
    px = (jnp.arange(tw) + 0.5) / tw
    wy = jnp.broadcast_to(py[:, None], (th, tw)).reshape(-1)
    wx = jnp.broadcast_to(px[None, :], (th, tw)).reshape(-1)
    corner_w = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                          wy * (1 - wx), wy * wx], axis=-1)   # [npix, 4]

    # stack the 4 statically-indexed corner CDF tables once so every
    # chunk's pixel-bin compare tensor is built ONCE and contracted
    # against all 4 corners (the old per-corner loop materialized the
    # [B, blocks, npix, chunk] compare 4x — it dominated the 6.1 ms cost;
    # restructure measured: aug preset overhead 12 ms -> 4.5 ms)
    corner_cdfs = []
    for dy in (0, 1):
        for dx in (0, 1):
            ty = (low, high)[dy]
            tx = (low, high)[dx]
            corner_cdfs.append(
                cdf[:, ty][:, :, tx].reshape(b, gb * gb, n_bins))
    csel = jnp.stack(corner_cdfs, axis=2)            # [B, blocks, 4, K]

    mapped = jnp.zeros_like(blocks, dtype=jnp.float32)
    for k0 in range(0, n_bins, chunk):
        ks = k0 + jnp.arange(chunk, dtype=jnp.int32)
        # bf16 storage for the one-hot compare tensor (values are exactly
        # 0/1, so no precision is lost): it is the dominant HBM traffic of
        # the whole augmentation pipeline — halving its bytes halves the
        # CLAHE mapping cost on TPU
        sel = (blocks[:, :, :, None] == ks[None, None, None, :]
               ).astype(jnp.bfloat16)                # [B, blocks, P, chunk]
        part = jnp.einsum("bgpk,bgck->bgpc", sel,
                          csel[:, :, :, k0:k0 + chunk],
                          preferred_element_type=jnp.float32)
        mapped = mapped + jnp.einsum("bgpc,pc->bgp", part, corner_w)

    mapped = mapped.reshape(b, gb, gb, th, tw).transpose(0, 1, 3, 2, 4)
    mapped = mapped.reshape(b, hh + th, ww + tw)[:, hy:hy + hh, hx:hx + ww]
    new_lum = mapped * 255.0
    ratio = (new_lum / jnp.maximum(lum, 1e-3))[..., None]
    out = jnp.clip(x * ratio, 0, 255)
    return _blend(x, out, _gate(rng, p, x.shape[0]))


# -- geometry --------------------------------------------------------------

def horizontal_flip(x: Image, rng: jax.Array, p: float = 0.5) -> Image:
    return _blend(x, x[:, :, ::-1, :], _gate(rng, p, x.shape[0]))


def vertical_flip(x: Image, rng: jax.Array, p: float = 0.5) -> Image:
    return _blend(x, x[:, ::-1, :, :], _gate(rng, p, x.shape[0]))


def random_rotate90(x: Image, rng: jax.Array, p: float = 0.3) -> Image:
    """Random k in {0,1,2,3} quarter-turns per image (requires H == W for
    static shapes; the reference's square inputs satisfy this). Selection
    is a masked sum over the four rotations — per-image gather would
    serialize on TPU."""
    b = x.shape[0]
    r1, r2 = jax.random.split(rng)
    k = jax.random.randint(r1, (b,), 0, 4)
    chosen = jnp.zeros_like(x)
    for rot in range(4):
        mask = (k == rot).astype(x.dtype)[:, None, None, None]
        chosen = chosen + mask * jnp.rot90(x, rot, axes=(1, 2))
    return _blend(x, chosen, _gate(r2, p, b))


def _interp_matrix(offset: jnp.ndarray, crop_size: int, out_size: int,
                   in_size: int) -> jnp.ndarray:
    """Per-image bilinear interpolation matrix [B, out_size, in_size].

    Row i holds the (<=2 nonzero) bilinear weights sampling full-image
    coordinate ``offset + (i + 0.5) * crop/out - 0.5``. Crop-and-resize
    becomes two batched matmuls (rows then cols) on the MXU — the
    vmapped dynamic_slice + jax.image.resize formulation gathers
    per-image and ran 55 ms at batch 1024 where this runs ~1 ms.
    """
    scale = crop_size / out_size
    i = jnp.arange(out_size, dtype=jnp.float32)
    src = offset[:, None].astype(jnp.float32) + (i[None, :] + 0.5) * scale \
        - 0.5                                           # [B, out]
    src = jnp.clip(src, 0.0, in_size - 1.0)
    j = jnp.arange(in_size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - j[None, None, :]))
    # clamped edges can leave a single weight < 1; renormalize rows
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-6)


def _crop_resize(x: Image, top: jnp.ndarray, left: jnp.ndarray,
                 ch: int, cw: int) -> Image:
    """Per-image crop (static crop size, dynamic offsets) + bilinear
    resize back to the input shape, as batched interpolation matmuls."""
    b, hh, ww, c = x.shape
    ry = _interp_matrix(top, ch, hh, hh)                # [B, H, H]
    rx = _interp_matrix(left, cw, ww, ww)               # [B, W, W]
    out = jnp.einsum("bij,bjwc->biwc", ry, x)
    return jnp.einsum("bkw,biwc->bikc", rx, out)


def random_crop(x: Image, rng: jax.Array, p: float = 0.8,
                scale: float = 2.0 / 3.0) -> Image:
    b, hh, ww, _ = x.shape
    ch, cw = max(int(hh * scale), 1), max(int(ww * scale), 1)
    r1, r2, r3 = jax.random.split(rng, 3)
    top = jax.random.randint(r1, (b,), 0, hh - ch + 1)
    left = jax.random.randint(r2, (b,), 0, ww - cw + 1)
    out = _crop_resize(x, top, left, ch, cw)
    return _blend(x, out, _gate(r3, p, b))


def center_crop_resize(x: Image, rng: jax.Array, p: float = 1.0,
                       scale: float = 2.0 / 3.0) -> Image:
    """CenterCrop(2/3) + Resize back (``augmentations.py:49-50``)."""
    b, hh, ww, _ = x.shape
    ch, cw = max(int(hh * scale), 1), max(int(ww * scale), 1)
    top = jnp.full((b,), (hh - ch) // 2)
    left = jnp.full((b,), (ww - cw) // 2)
    out = _crop_resize(x, top, left, ch, cw)
    return _blend(x, out, _gate(rng, p, b))


# -- filtering / noise -----------------------------------------------------

def blur3(x: Image, rng: jax.Array, p: float = 0.3) -> Image:
    """3x3 box blur (albumentations Blur normalizes blur_limit to >= 3).

    Separable shifted-add formulation: two padded 3-tap sum passes on the
    VPU. The conv_general formulation (channels folded into batch,
    feature dim 1) measured 1.4 ms at batch 1024 — single-channel convs
    waste the MXU; shifted adds fuse into ~2 memory passes."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    ysum = xp[:, :-2] + xp[:, 1:-1] + xp[:, 2:]
    xp = jnp.pad(ysum, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    blurred = (xp[:, :, :-2] + xp[:, :, 1:-1] + xp[:, :, 2:]) / 9.0
    return _blend(x, blurred, _gate(rng, p, x.shape[0]))


def gauss_noise(x: Image, rng: jax.Array, p: float = 0.3,
                var_limit: Tuple[float, float] = (50.0, 80.0)) -> Image:
    b = x.shape[0]
    r1, r2, r3 = jax.random.split(rng, 3)
    var = _uniform(r1, b, var_limit[0], var_limit[1])
    noise = jax.random.normal(r2, x.shape, x.dtype) * jnp.sqrt(var)
    return _blend(x, jnp.clip(x + noise, 0, 255), _gate(r3, p, b))


# -- presets ---------------------------------------------------------------

Op = Callable[[Image, jax.Array], Image]


def _compose(ops: Sequence[Op]) -> Callable[[Image, jax.Array], Image]:
    def apply(x: Image, rng: jax.Array) -> Image:
        # bf16 matmul passes for the augment-internal einsums (CLAHE
        # compare-reduce, crop interpolation matrices): measured 8.4 ->
        # 6.5 ms for the 'default' preset @[1024,64,64,3] on v5e, max
        # deviation 0.9 gray levels — under the uint8 quantization the
        # reference's albumentations pipeline applies anyway. No effect
        # on CPU (where the oracle tests run: CPU matmuls stay f32).
        with jax.default_matmul_precision("bfloat16"):
            keys = jax.random.split(rng, len(ops))
            for op, key in zip(ops, keys):
                x = op(x, key)
        return x

    return apply


def get_aug(name: str = "default", input_shape=None):
    """Preset name -> jittable ``fn(images, rng) -> images`` over float BGR
    batches in 0..255 (``augmentations.py:4-55`` dispatch; unknown name ->
    None, same as the reference's else-branch)."""
    if name == "default":
        return _compose([
            functools.partial(brightness_contrast, p=0.4),
            functools.partial(random_gamma, p=0.4),
            functools.partial(hue_saturation_value, p=0.4),
            functools.partial(clahe_tiled, p=0.4),
            functools.partial(blur3, p=0.3),
            functools.partial(gauss_noise, p=0.3, var_limit=(50, 80)),
        ])
    if name == "plates":
        return _compose([
            functools.partial(brightness_contrast, p=0.4),
            functools.partial(random_gamma, p=0.4),
            functools.partial(hue_saturation_value, p=0.4),
            functools.partial(clahe_tiled, p=0.4),
            functools.partial(horizontal_flip, p=0.5),
            functools.partial(vertical_flip, p=0.5),
            functools.partial(blur3, p=0.3),
            functools.partial(gauss_noise, p=0.3, var_limit=(50, 80)),
            functools.partial(random_crop, p=0.8, scale=2 / 3),
        ])
    if name == "deepfake":
        return _compose([functools.partial(horizontal_flip, p=0.5)])
    if name == "plates2":
        return _compose([
            functools.partial(clahe_tiled, p=0.3),
            functools.partial(horizontal_flip, p=0.5),
            functools.partial(vertical_flip, p=0.5),
            functools.partial(random_brightness, p=0.3),
            functools.partial(random_contrast, p=0.3),
            functools.partial(random_rotate90, p=0.3),
            functools.partial(hue_saturation_value, p=0.5,
                              hue_shift_limit=50, sat_shift_limit=15,
                              val_shift_limit=15),
            functools.partial(gauss_noise, p=0.3, var_limit=(10, 50)),
            functools.partial(center_crop_resize, p=1.0, scale=2 / 3),
        ])
    return None
