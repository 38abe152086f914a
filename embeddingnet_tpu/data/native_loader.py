"""ctypes bindings for the native C++ decode/resize library.

``native/enloader.cpp`` decodes a whole batch in parallel C++ threads
(libjpeg/libpng) and resizes with cv2-compatible bilinear sampling
directly into a preallocated uint8 BGR batch buffer — the GIL-free
replacement for the per-image cv2 loop
(``embedding_net/datagenerators.py:145-156``). Builds on demand with the
repo Makefile; ``available()`` gates callers so every path falls back to
the Python/cv2 loader when a toolchain is absent.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libenloader.so")

_lib = None
_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "libenloader.so"],
                       check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        log.warning("native loader build failed (%r); using Python decode",
                    e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(_NATIVE_DIR, "enloader.cpp")
            if not (os.path.exists(src) and _build()):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            log.warning("native loader unavailable (%r)", e)
            return None
        lib.en_decode_batch.restype = ctypes.c_int
        lib.en_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        if hasattr(lib, "en_decode_batch_ex"):  # v2+
            lib.en_decode_batch_ex.restype = ctypes.c_int
            lib.en_decode_batch_ex.argtypes = \
                lib.en_decode_batch.argtypes + [ctypes.c_int]
        lib.en_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(paths: Sequence[str], height: int, width: int,
                 n_threads: int = 8,
                 out: Optional[np.ndarray] = None,
                 fast: bool = False) -> np.ndarray:
    """Decode+resize ``paths`` into a [N, H, W, 3] uint8 BGR array.

    Failed slots are zeroed (same contract as the Python loader). Pass
    ``out`` to reuse a preallocated buffer across batches.

    ``fast=True`` enables DCT-domain prescaled JPEG decode (libjpeg M/8
    scaling): ~1.5x faster for >= 2:1 downscales, but the result deviates
    from the cv2-exact path (measured mean ~1.2 / p99 ~8 gray levels on
    photographic content — under the training augmentation noise floor).
    Exact by default; PNGs are always exact.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not available; check available()")
    n = len(paths)
    if out is None:
        out = np.zeros((n, height, width, 3), np.uint8)
    else:
        assert out.shape == (n, height, width, 3) and out.dtype == np.uint8
        assert out.flags["C_CONTIGUOUS"]
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    optr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    if fast and hasattr(lib, "en_decode_batch_ex"):
        lib.en_decode_batch_ex(arr, n, optr, height, width, n_threads, 1)
    else:
        lib.en_decode_batch(arr, n, optr, height, width, n_threads)
    return out
