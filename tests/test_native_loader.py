"""Native C++ decode/resize library vs the cv2 oracle."""

import os

import numpy as np
import pytest

from embeddingnet_tpu.data import native_loader

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native loader not built")


@pytest.fixture
def image_files(tmp_path, rng_np):
    import cv2
    paths = []
    for i, (h, w) in enumerate([(37, 53), (64, 64), (16, 100)]):
        img = rng_np.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = str(tmp_path / f"img_{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    jp = str(tmp_path / "img.jpg")
    cv2.imwrite(jp, rng_np.integers(0, 255, (48, 48, 3), dtype=np.uint8))
    paths.append(jp)
    return paths


def test_exact_png_decode(image_files):
    import cv2
    ref = cv2.imread(image_files[0])
    out = native_loader.decode_batch([image_files[0]], ref.shape[0],
                                     ref.shape[1])
    np.testing.assert_array_equal(out[0], ref)  # BGR, bit-exact


def test_resize_matches_cv2_within_rounding(image_files):
    import cv2
    out = native_loader.decode_batch(image_files, 32, 32, n_threads=4)
    for i, p in enumerate(image_files):
        ref = cv2.resize(cv2.imread(p), (32, 32))
        diff = np.abs(out[i].astype(int) - ref.astype(int)).max()
        assert diff <= 1, f"{p}: max diff {diff}"


def test_jpeg_decode_close_to_cv2(image_files):
    import cv2
    jp = image_files[-1]
    ref = cv2.imread(jp)
    out = native_loader.decode_batch([jp], ref.shape[0], ref.shape[1])
    # different IDCT implementations may differ by a few LSBs
    assert np.abs(out[0].astype(int) - ref.astype(int)).max() <= 2


def test_missing_file_zeroed(image_files, tmp_path):
    out = native_loader.decode_batch([image_files[0],
                                      str(tmp_path / "missing.png")], 16, 16)
    assert out[1].max() == 0
    assert out[0].max() > 0


def test_preallocated_buffer(image_files):
    buf = np.zeros((len(image_files), 24, 24, 3), np.uint8)
    out = native_loader.decode_batch(image_files, 24, 24, out=buf)
    assert out is buf
    assert buf.max() > 0


def test_batch_loader_native_backend(tiny_dataset):
    from embeddingnet_tpu.data import BatchLoader, ENDataLoader, PKSampler
    dl = ENDataLoader(tiny_dataset, validate=True, val_ratio=0.2)
    s = PKSampler(dl.train_data, dl.class_names, k_classes=2, k_samples=3)
    native = BatchLoader(s, (16, 16, 3), n_batches=1, backend="native")
    images_n, labels_n = next(iter(native))
    s2 = PKSampler(dl.train_data, dl.class_names, k_classes=2, k_samples=3)
    python = BatchLoader(s2, (16, 16, 3), n_batches=1, backend="python")
    images_p, labels_p = next(iter(python))
    # same sampler seed -> same files -> near-identical pixels
    np.testing.assert_array_equal(labels_n, labels_p)
    assert np.abs(images_n.astype(int) - images_p.astype(int)).max() <= 1


@pytest.fixture
def smooth_jpegs(tmp_path, rng_np):
    """Photograph-like (smooth) jpegs where DCT-prescale stays accurate."""
    import cv2
    paths = []
    yy, xx = np.mgrid[0:128, 0:128]
    for i in range(3):
        img = np.stack([(yy + 40 * i) % 256, (xx * 2) % 256,
                        ((yy + xx) // 2 + 10 * i) % 256],
                       axis=-1).astype(np.uint8)
        img = cv2.GaussianBlur(img, (5, 5), 2.0)
        p = str(tmp_path / f"smooth_{i}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_fast_decode_close_to_exact(smooth_jpegs):
    """fast=True (DCT M/8 prescale) stays within a few gray levels of the
    exact path on smooth content, at the same output shape."""
    exact = native_loader.decode_batch(smooth_jpegs, 64, 64)
    fast = native_loader.decode_batch(smooth_jpegs, 64, 64, fast=True)
    assert fast.shape == exact.shape
    d = np.abs(fast.astype(int) - exact.astype(int))
    assert d.mean() < 3.0, d.mean()
    assert np.percentile(d, 99) <= 16, np.percentile(d, 99)


def test_fast_decode_png_still_exact(image_files):
    """PNGs bypass the JPEG prescale: fast=True output is bit-identical."""
    exact = native_loader.decode_batch(image_files[:3], 32, 32)
    fast = native_loader.decode_batch(image_files[:3], 32, 32, fast=True)
    np.testing.assert_array_equal(exact, fast)


def test_batch_loader_fast_decode(tiny_dataset):
    """PERFORMANCE.fast_decode wires through BatchLoader to the native
    backend (auto picks native even on 1 core when fast is requested)."""
    from embeddingnet_tpu.data import BatchLoader, ENDataLoader, PKSampler
    dl = ENDataLoader(tiny_dataset, validate=False)
    s = PKSampler(dl.train_data, dl.class_names, k_classes=2, k_samples=2)
    loader = BatchLoader(s, (16, 16, 3), n_batches=1, fast_decode=True)
    assert loader.backend == "native"
    images, labels = next(iter(loader))
    assert images.shape[1:] == (16, 16, 3)
    assert images.max() > 0
