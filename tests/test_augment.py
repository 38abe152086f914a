"""On-device augmentation kernel tests (numpy/cv2 oracles where exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingnet_tpu.ops import augment


@pytest.fixture
def batch(rng_np):
    return jnp.array(rng_np.uniform(0, 255, size=(4, 16, 16, 3)),
                     dtype=jnp.float32)


def test_gate_probability_zero_is_identity(batch):
    rng = jax.random.PRNGKey(0)
    for op in (augment.horizontal_flip, augment.vertical_flip,
               augment.brightness_contrast, augment.random_gamma,
               augment.gauss_noise, augment.blur3):
        out = op(batch, rng, p=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(batch),
                                   atol=1e-4)


def test_horizontal_flip_exact(batch):
    out = augment.horizontal_flip(batch, jax.random.PRNGKey(0), p=1.0)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(batch)[:, :, ::-1, :])


def test_vertical_flip_exact(batch):
    out = augment.vertical_flip(batch, jax.random.PRNGKey(0), p=1.0)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(batch)[:, ::-1, :, :])


def test_blur3_matches_box_filter(batch):
    import cv2
    out = np.asarray(augment.blur3(batch, jax.random.PRNGKey(0), p=1.0))
    for i in range(batch.shape[0]):
        expected = cv2.blur(np.asarray(batch)[i], (3, 3),
                            borderType=cv2.BORDER_CONSTANT)
        # interior pixels must match exactly (border handling differs:
        # ours edge-pads, the cv2 oracle zero-pads)
        np.testing.assert_allclose(out[i][1:-1, 1:-1], expected[1:-1, 1:-1],
                                   rtol=1e-4, atol=1e-3)


def test_gamma_range(batch):
    out = np.asarray(augment.random_gamma(batch, jax.random.PRNGKey(1),
                                          p=1.0))
    assert out.min() >= 0 and out.max() <= 255


def test_hsv_roundtrip(batch):
    h, s, v = augment._bgr_to_hsv(batch)
    back = augment._hsv_to_bgr(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(batch),
                               atol=1e-2)


def test_hsv_hue_shift_changes_colors(batch):
    out = augment.hue_saturation_value(batch, jax.random.PRNGKey(2), p=1.0)
    assert not np.allclose(np.asarray(out), np.asarray(batch), atol=1.0)


def test_rotate90_is_exact_rotation():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    out = np.asarray(augment.random_rotate90(x, jax.random.PRNGKey(3),
                                             p=1.0))
    candidates = [np.asarray(jnp.rot90(x, k, axes=(1, 2))) for k in range(4)]
    for i in range(2):
        assert any(np.allclose(out[i], c[i]) for c in candidates)


def test_crop_resize_preserves_shape(batch):
    out = augment.random_crop(batch, jax.random.PRNGKey(4), p=1.0)
    assert out.shape == batch.shape
    out = augment.center_crop_resize(batch, jax.random.PRNGKey(5), p=1.0)
    assert out.shape == batch.shape


def test_center_crop_content():
    """Center 2/3 crop resized back: corners of the original disappear."""
    x = jnp.zeros((1, 12, 12, 3), jnp.float32)
    x = x.at[0, 0, 0].set(255.0)  # corner marker
    out = np.asarray(augment.center_crop_resize(x, jax.random.PRNGKey(0),
                                                p=1.0))
    assert out.max() == 0.0  # the corner is outside the center crop


def test_gauss_noise_statistics(rng_np):
    x = jnp.full((8, 32, 32, 3), 128.0)
    out = np.asarray(augment.gauss_noise(x, jax.random.PRNGKey(6), p=1.0,
                                         var_limit=(50.0, 50.0)))
    noise = out - 128.0
    assert 4.0 < noise.std() < 10.0  # sigma ~ sqrt(50) ~ 7.1 (clip shrinks)


def test_clahe_increases_contrast():
    rng = np.random.default_rng(0)
    # low-contrast image clustered around 100..140
    x = jnp.array(rng.uniform(100, 140, size=(2, 16, 16, 3)),
                  dtype=jnp.float32)
    out = np.asarray(augment.clahe_approx(x, jax.random.PRNGKey(7), p=1.0))
    assert out.std() > np.asarray(x).std() * 1.2


@pytest.mark.parametrize("name", ["default", "plates", "deepfake", "plates2"])
def test_presets_jit_and_shapes(batch, name):
    fn = augment.get_aug(name, (16, 16, 3))
    out = jax.jit(fn)(batch, jax.random.PRNGKey(0))
    assert out.shape == batch.shape
    assert np.isfinite(np.asarray(out)).all()
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 255


def test_unknown_preset_returns_none():
    assert augment.get_aug("nope") is None


def test_augment_deterministic_per_key(batch):
    fn = augment.get_aug("default", (16, 16, 3))
    a = fn(batch, jax.random.PRNGKey(9))
    b = fn(batch, jax.random.PRNGKey(9))
    c = fn(batch, jax.random.PRNGKey(10))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def np_clahe_tiled(lum, grid=4, clip_limit=4.0, n_bins=64,
                   stats_stride=2):
    """Numpy oracle of the same tile-CLAHE definition: per-tile clipped
    CDFs from every stats_stride-th pixel (the device kernel's documented
    deviation), bilinear interpolation between tile centers, edge clamp."""
    hh, ww = lum.shape
    th, tw = hh // grid, ww // grid
    s = stats_stride
    bins = np.clip((lum / 256.0 * n_bins).astype(int), 0, n_bins - 1)
    bins_s = bins[::s, ::s]
    ths, tws = th // s, tw // s
    cdfs = np.zeros((grid, grid, n_bins))
    npix = ths * tws
    clip_count = clip_limit * npix / n_bins
    for i in range(grid):
        for j in range(grid):
            tb = bins_s[i*ths:(i+1)*ths, j*tws:(j+1)*tws]
            hist = np.bincount(tb.ravel(), minlength=n_bins).astype(float)
            clipped = np.minimum(hist, clip_count)
            excess = hist.sum() - clipped.sum()
            cdfs[i, j] = np.cumsum(clipped + excess / n_bins) / npix
    out = np.zeros_like(lum, dtype=float)
    for y in range(hh):
        for x in range(ww):
            fy = (y + 0.5) / th - 0.5
            fx = (x + 0.5) / tw - 0.5
            y0 = int(np.floor(fy)); x0 = int(np.floor(fx))
            wy = fy - y0; wx = fx - x0
            y0c, y1c = np.clip([y0, y0+1], 0, grid-1)
            x0c, x1c = np.clip([x0, x0+1], 0, grid-1)
            k = bins[y, x]
            out[y, x] = ((1-wy)*(1-wx)*cdfs[y0c, x0c, k]
                         + (1-wy)*wx*cdfs[y0c, x1c, k]
                         + wy*(1-wx)*cdfs[y1c, x0c, k]
                         + wy*wx*cdfs[y1c, x1c, k])
    return out * 255.0


def test_clahe_tiled_matches_numpy_oracle(rng_np):
    x = jnp.asarray(rng_np.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    lum = 0.114*np.asarray(x)[..., 0] + 0.587*np.asarray(x)[..., 1] \
        + 0.299*np.asarray(x)[..., 2]
    out = np.asarray(augment.clahe_tiled(x, jax.random.PRNGKey(0), p=1.0,
                                         grid=4))
    out_lum = 0.114*out[..., 0] + 0.587*out[..., 1] + 0.299*out[..., 2]
    for b in range(2):
        expected = np_clahe_tiled(lum[b], grid=4)
        # out = x * new_lum/lum clipped; compare the luminance mapping
        ratio = expected / np.maximum(lum[b], 1e-3)
        # skip clipped pixels (channel saturation breaks the ratio)
        unclipped = (out[b] < 254.5).all(axis=-1)
        np.testing.assert_allclose(out_lum[b][unclipped],
                                   (lum[b] * ratio)[unclipped],
                                   rtol=5e-3, atol=0.5)


def test_clahe_tiled_close_to_cv2(rng_np):
    """Sanity vs cv2.createCLAHE on a grayscale image: same algorithm
    family, cv2 uses integer LUTs so agreement is loose."""
    import cv2
    gray = rng_np.uniform(30, 220, (32, 32)).astype(np.uint8)
    ref = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(4, 4)).apply(gray)
    # drive ours on a gray BGR image
    x = jnp.asarray(np.repeat(gray[None, :, :, None], 3, axis=-1),
                    jnp.float32)
    out = np.asarray(augment.clahe_tiled(x, jax.random.PRNGKey(0), p=1.0,
                                         grid=4, n_bins=256,
                                         stats_stride=1))[0, :, :, 0]
    corr = np.corrcoef(out.ravel(), ref.astype(float).ravel())[0, 1]
    assert corr > 0.98
    assert np.abs(out - ref).mean() < 12  # integer-LUT + border rounding


def test_clahe_tiled_fallback_on_awkward_shapes(rng_np):
    x = jnp.asarray(rng_np.uniform(0, 255, (2, 30, 30, 3)), jnp.float32)
    out = augment.clahe_tiled(x, jax.random.PRNGKey(0), p=1.0, grid=4)
    assert out.shape == x.shape  # falls back to the global approximation


def test_clahe_stats_stride_deviation_small(rng_np):
    """The stats_stride=2 histogram subsample (the r3 perf deviation) is
    bounded even on its worst case — uniform noise (64 samples for a
    64-bin tile histogram); natural images measure ~2 gray levels mean
    (documented at the definition site)."""
    x = jnp.asarray(rng_np.uniform(0, 255, (4, 64, 64, 3)), jnp.float32)
    full = np.asarray(augment.clahe_tiled(x, jax.random.PRNGKey(0), p=1.0,
                                          grid=4, stats_stride=1))
    sub = np.asarray(augment.clahe_tiled(x, jax.random.PRNGKey(0), p=1.0,
                                         grid=4, stats_stride=2))
    assert np.abs(full - sub).mean() < 7.0
