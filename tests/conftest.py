"""Test configuration: force an 8-device CPU mesh before JAX initializes.

The distributed-without-a-cluster trick (SURVEY.md §4): all tests run on a
virtual 8-device CPU platform so sharded code paths execute exactly as they
would across a real TPU slice, minus the ICI.
"""

import os

# Force CPU even if the ambient environment selects a TPU platform —
# unit tests must be hermetic and run the virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Site hooks may re-register a TPU platform on top of JAX_PLATFORMS; the
# config update wins as long as no computation has run yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(42)


@pytest.fixture
def tiny_dataset(tmp_path):
    """Folder-per-class synthetic dataset: 6 classes x 10 tiny images."""
    import cv2

    root = tmp_path / "dataset"
    rng = np.random.default_rng(0)
    for cls in range(6):
        cls_dir = root / f"class_{cls}"
        cls_dir.mkdir(parents=True)
        for i in range(10):
            # Class-correlated colors so training can actually separate them.
            base = np.zeros((16, 16, 3), np.uint8)
            base[..., cls % 3] = 40 * (cls + 1)
            noise = rng.integers(0, 40, size=(16, 16, 3), dtype=np.uint8)
            img = np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8)
            cv2.imwrite(str(cls_dir / f"img_{i}.png"), img)
    return str(root)
