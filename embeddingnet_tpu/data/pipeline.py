"""Host decode pipeline: sampler -> threaded cv2 decode -> device prefetch.

The reference decodes images one-by-one in the generator's ``__getitem__``
on the training thread (``embedding_net/datagenerators.py:145-156``) — the
device idles during decode. Here decode runs in a thread pool overlapped
with device compute, batches are queued ahead, and arrays cross to HBM as
uint8 (4x less PCIe/DMA traffic than the reference's float64 ``/255.``
host arrays) — normalization and augmentation run on device.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from embeddingnet_tpu.data.images import get_image


class DecodeCache:
    """In-RAM cache of decoded+resized uint8 images, shared across the
    per-epoch BatchLoader instances (PERFORMANCE.decode_cache_mb).

    Exact — augmentation runs on device from fresh RNG, so cached pixels
    are identical to a re-decode. After the first epoch a cached dataset
    feeds the device at memcpy speed instead of jpeg-decode speed (the
    1-CPU end-to-end wall in docs/BENCHMARKS.md is decode). The byte
    budget caps growth and simply stops inserting once full — epoch
    access is near-uniform, so evictions would thrash.
    """

    def __init__(self, budget_mb: int):
        self.budget = int(budget_mb) * (1 << 20)
        self._data = {}
        self._bytes = 0
        self._lock = threading.Lock()

    def get_many(self, paths):
        with self._lock:
            return [self._data.get(p) for p in paths]

    def put(self, path, img: np.ndarray):
        if img.base is not None:
            # Never retain a view: a row of a [M, h, w, 3] decode buffer
            # would pin the whole buffer while _bytes accounts only the
            # row, blowing the byte budget silently.
            img = img.copy()
        with self._lock:
            if path in self._data or self._bytes + img.nbytes > self.budget:
                return
            self._data[path] = img
            self._bytes += img.nbytes


class BatchLoader:
    """Iterate device-ready uint8 batches from a sampler.

    ``sampler`` yields ``(paths, labels)`` where paths is a list of file
    paths or a tuple of such lists (pairs/triplets). Output mirrors that
    structure with stacked uint8 arrays [B, H, W, 3] (BGR).
    """

    def __init__(self, sampler, input_shape: Sequence[int],
                 num_workers: int = 8, prefetch: int = 4,
                 n_batches: Optional[int] = None, backend: str = "auto",
                 fast_decode: bool = False,
                 cache: Optional[DecodeCache] = None):
        self.sampler = sampler
        self.input_shape = tuple(input_shape)
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.n_batches = n_batches
        self._cache = cache
        # PERFORMANCE.fast_decode: DCT-prescaled JPEG decode in the native
        # loader (~1.5x on >= 2:1 downscales, approximate — see
        # native_loader.decode_batch); forces the native backend.
        self.fast_decode = bool(fast_decode)
        if backend == "auto":
            # The C++ loader's win is GIL-free multi-core scaling (or the
            # fast-decode path); on a single-core host cv2's SIMD decode
            # is otherwise ~25% faster, so only prefer native when there
            # are cores to scale across.
            import os as _os
            from embeddingnet_tpu.data import native_loader
            multi_core = (_os.cpu_count() or 1) > 1
            backend = ("native"
                       if (multi_core or self.fast_decode)
                       and native_loader.available() else "python")
        if backend not in ("native", "python"):
            raise ValueError(f"unknown decode backend {backend!r}")
        self.backend = backend
        if self.fast_decode and self.backend != "native":
            import logging
            logging.getLogger(__name__).warning(
                "fast_decode requested but native loader unavailable; "
                "using exact cv2 decode")

    def _decode_many(self, pool: ThreadPoolExecutor,
                     paths: Sequence[str]) -> np.ndarray:
        h, w = self.input_shape[0], self.input_shape[1]
        if self._cache is None:
            return self._decode_uncached(pool, paths)

        out = np.zeros((len(paths), h, w, 3), np.uint8)
        miss_idx = []
        for i, im in enumerate(self._cache.get_many(paths)):
            if im is not None:
                out[i] = im
            else:
                miss_idx.append(i)
        if miss_idx:
            decoded = self._decode_uncached(
                pool, [paths[i] for i in miss_idx])
            for j, i in enumerate(miss_idx):
                out[i] = decoded[j]
                self._cache.put(paths[i], decoded[j])
        return out

    def _decode_uncached(self, pool: ThreadPoolExecutor,
                         paths: Sequence[str]) -> np.ndarray:
        h, w = self.input_shape[0], self.input_shape[1]
        if self.backend == "native":
            # GIL-free C++ decode+resize straight into the batch buffer
            from embeddingnet_tpu.data import native_loader
            return native_loader.decode_batch(paths, h, w,
                                              n_threads=self.num_workers,
                                              fast=self.fast_decode)
        imgs = list(pool.map(lambda p: get_image(p, self.input_shape), paths))
        out = np.zeros((len(paths), h, w, 3), np.uint8)
        for i, im in enumerate(imgs):
            if im is not None:
                out[i] = im
        return out

    def _decode_batch(self, pool, item):
        paths, labels = item
        if isinstance(paths, tuple):
            images = tuple(self._decode_many(pool, p) for p in paths)
        else:
            images = self._decode_many(pool, paths)
        return images, labels

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields batches; a background thread keeps ``prefetch`` batches
        decoded ahead of the consumer."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        sentinel = object()

        def producer():
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            try:
                it = iter(self.sampler)
                count = 0
                while not stop.is_set():
                    if self.n_batches is not None and count >= self.n_batches:
                        break
                    try:
                        item = next(it)
                    except StopIteration:
                        # Finite sampler exhausted (e.g. n_batches unset on
                        # an exactly-divisible epoch): end the epoch via the
                        # sentinel below. Letting StopIteration escape would
                        # kill the thread with an unhandled exception.
                        break
                    batch = self._decode_batch(pool, item)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    count += 1
            finally:
                pool.shutdown(wait=False)
                # The sentinel MUST be delivered or the consumer blocks on
                # q.get() forever (epoch-end hang whenever decode outpaces
                # compute and the queue is full) — retry until consumed or
                # the consumer has signalled stop.
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    return
                yield item
        finally:
            stop.set()


def to_device_batch(images: np.ndarray, labels: np.ndarray, sharding=None):
    """Transfer a host batch to device(s), optionally sharded over a mesh."""
    import jax

    if sharding is not None:
        return (jax.device_put(images, sharding),
                jax.device_put(labels, sharding))
    return jax.device_put((images, labels))
