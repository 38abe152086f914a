"""Serving: batched embedding + kNN inference over HTTP.

The production-deployment face of the framework (the reference stops at a
broken test CLI). One jitted program per (batch-shape) serves encode +
top-k classification; concurrent requests are micro-batched: a collector
thread drains the request queue up to ``max_batch`` and runs one device
program for the whole bucket — the TPU sees large batches even under
many small clients.

Endpoints (stdlib http.server, zero extra deps):

* ``POST /classify``       — raw image bytes (jpeg/png) ->
  ``{"label": ..., "top5": [...]}``
* ``POST /classify_batch`` — concatenated multipart-free batch: body is
  ``<4-byte big-endian count> (<4-byte length> <image bytes>)*`` ->
  ``{"labels": [...]}`` — one device program for the whole request
* ``POST /embed``          — raw image bytes -> ``{"embedding": [...]}``
* ``GET  /healthz``        — liveness + model/DB metadata
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class InferenceEngine:
    """Micro-batching wrapper around an :class:`EmbeddingNet` + DB."""

    def __init__(self, net, max_batch: int = 32,
                 max_wait_ms: float = 2.0, quantize_db: bool = False):
        import jax
        import jax.numpy as jnp
        from embeddingnet_tpu.ops import knn as knn_ops

        self.net = net
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.quantized = quantize_db
        db_emb, label_ids, classes = net._db()
        self.classes = classes
        self.labels = net.encoded_training_data["labels"]
        self._db_labels = jnp.asarray(label_ids)
        if quantize_db:
            # int8 DB: 4x less HBM, Gram matmul on the int8 MXU path
            self._db_values, self._db_scales = knn_ops.quantize_db(
                jnp.asarray(db_emb))
            self._db_emb = None
        else:
            self._db_emb = jnp.asarray(db_emb)
        k = int(net.params.get("encodings", {}).get("knn_k", 1) or 1)
        self.k = min(k, len(label_ids))
        self.k5 = min(5, len(label_ids))

        @jax.jit
        def infer(variables, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            emb = net.module.apply(variables, x, train=False).astype(
                jnp.float32)
            if quantize_db:
                pred, idxs = knn_ops.knn_classify_quantized(
                    self._db_values, self._db_scales, self._db_labels,
                    emb, k=max(self.k, self.k5), n_classes=len(classes))
                idx5 = idxs[:, :self.k5]
            else:
                pred, _ = knn_ops.knn_classify(
                    self._db_emb, self._db_labels, emb, k=self.k,
                    n_classes=len(classes))
                _, idx5 = knn_ops.knn_neighbors(self._db_emb, emb,
                                                k=self.k5)
            return emb, pred, idx5

        self._infer = infer
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self.ready = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        # warm the compile off the request path; /healthz reports ready
        threading.Thread(target=self._warmup, daemon=True).start()

    def _warmup(self):
        import jax.numpy as jnp
        h, w, _ = self.net.input_shape
        dummy = np.zeros((self.max_batch, h, w, 3), np.uint8)
        out = self._infer(self.net.variables, jnp.asarray(dummy))
        np.asarray(out[1])
        self.ready.set()

    def _decode(self, data: bytes) -> Optional[np.ndarray]:
        import cv2
        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            return None
        # cv2 dsize is (W, H); input_shape is (H, W, C) — see
        # data/images.py:get_image for the documented reference deviation
        return cv2.resize(img, (self.net.input_shape[1],
                                self.net.input_shape[0]))

    def _loop(self):
        """Collector: drain up to max_batch requests, one device program."""
        import jax.numpy as jnp
        h, w, _ = self.net.input_shape
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            bucket = [first]
            deadline = self.max_wait_s
            while len(bucket) < self.max_batch:
                try:
                    bucket.append(self._queue.get(timeout=deadline))
                except queue.Empty:
                    break
            images = np.zeros((self.max_batch, h, w, 3), np.uint8)
            for i, (img, _event, _out) in enumerate(bucket):
                images[i] = img
            emb, pred, idx5 = self._infer(self.net.variables,
                                          jnp.asarray(images))
            emb = np.asarray(emb)
            pred = np.asarray(pred)
            idx5 = np.asarray(idx5)
            for i, (_img, event, out) in enumerate(bucket):
                out["embedding"] = emb[i]
                out["label"] = self.classes[int(pred[i])]
                out["top5"] = [self.labels[int(j)] for j in idx5[i]]
                event.set()

    def infer_many(self, images_bytes, timeout: float = 120.0):
        """Batch entry: decode all, enqueue together (they share device
        programs via the collector), gather results in order."""
        # Same warmup gate as infer_one: requests during the first compile
        # should wait for readiness, not burn their timeout in the queue.
        if not self.ready.wait(timeout):
            raise TimeoutError("model still compiling; try again")
        pending = []
        for data in images_bytes:
            img = self._decode(data)
            if img is None:
                pending.append(None)
                continue
            event = threading.Event()
            out: dict = {}
            self._queue.put((img, event, out))
            pending.append((event, out))
        results = []
        for item in pending:
            if item is None:
                results.append(None)
                continue
            event, out = item
            if not event.wait(timeout):
                raise TimeoutError("inference timed out")
            results.append(out)
        return results

    def infer_one(self, image_bytes: bytes, timeout: float = 120.0) -> dict:
        if not self.ready.wait(timeout):
            raise TimeoutError("model still compiling; try again")
        img = self._decode(image_bytes)
        if img is None:
            raise ValueError("could not decode image bytes")
        event = threading.Event()
        out: dict = {}
        self._queue.put((img, event, out))
        if not event.wait(timeout):
            raise TimeoutError("inference timed out")
        return out

    def close(self):
        self._stop.set()
        self._worker.join(timeout=2)


def make_server(engine: InferenceEngine, host: str = "127.0.0.1",
                port: int = 8000) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok" if engine.ready.is_set() else "warming",
                    "ready": engine.ready.is_set(),
                    "backbone": engine.net.params_model["backbone_name"],
                    "encodings_len":
                        engine.net.params_model["encodings_len"],
                    "db_size": len(engine.labels),
                    "n_classes": len(engine.classes),
                    "knn_k": engine.k,
                })
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path not in ("/classify", "/classify_batch", "/embed"):
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._send(400, {"error": "empty body; send image bytes"})
                return
            data = self.rfile.read(length)
            if self.path == "/classify_batch":
                import struct
                try:
                    (n,) = struct.unpack(">I", data[:4])
                    images, off = [], 4
                    for _ in range(n):
                        (ln,) = struct.unpack(">I", data[off:off + 4])
                        off += 4
                        images.append(data[off:off + ln])
                        off += ln
                except struct.error:
                    self._send(400, {"error": "malformed batch framing"})
                    return
                try:
                    results = engine.infer_many(images)
                except TimeoutError as e:
                    self._send(503, {"error": str(e)})
                    return
                self._send(200, {"labels": [
                    r["label"] if r else None for r in results]})
                return
            try:
                out = engine.infer_one(data)
            except ValueError as e:
                self._send(400, {"error": str(e)})
                return
            except TimeoutError as e:
                self._send(503, {"error": str(e)})
                return
            if self.path == "/classify":
                self._send(200, {"label": out["label"],
                                 "top5": out["top5"]})
            else:
                self._send(200,
                           {"embedding": out["embedding"].tolist()})

    return ThreadingHTTPServer((host, port), Handler)
