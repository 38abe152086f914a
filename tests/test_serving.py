"""Serving engine + HTTP server tests (CPU, real socket)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from embeddingnet_tpu.config import params_from_dict
from embeddingnet_tpu.data import ENDataLoader
from embeddingnet_tpu.models import EmbeddingNet
from embeddingnet_tpu.serving import InferenceEngine, make_server


@pytest.fixture
def served(tmp_path, tiny_dataset):
    params = params_from_dict({
        "MODEL": {"input_shape": [32, 32, 3], "encodings_len": 16,
                  "mode": "triplet", "backbone_name": "simple2",
                  "backbone_weights": None},
        "DATALOADER": {"dataset_path": tiny_dataset},
        "GENERATOR": {"k_classes": 3, "k_samples": 3},
        "ENCODINGS": {"knn_k": 1},
        "GENERAL": {"project_name": "serve_test",
                    "work_dir": str(tmp_path)},
    })
    loader = ENDataLoader(tiny_dataset, validate=False)
    net = EmbeddingNet(params)
    net.generate_encodings(loader, max_n_samples=4)
    engine = InferenceEngine(net, max_batch=4, max_wait_ms=1.0)
    server = make_server(engine, "127.0.0.1", 0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", loader
    server.shutdown()
    engine.close()


def _png_bytes(rng, shape=(20, 20, 3)):
    import cv2
    img = rng.integers(0, 255, shape, dtype=np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return buf.tobytes()


def test_healthz(served):
    url, _ = served
    import time
    # readiness gate: 'warming' until the compile finishes, then 'ok'
    for _ in range(120):
        with urllib.request.urlopen(f"{url}/healthz") as r:
            data = json.loads(r.read())
        if data["ready"]:
            break
        time.sleep(0.5)
    assert data["status"] == "ok"
    assert data["backbone"] == "simple2"
    assert data["db_size"] > 0


def test_classify(served, rng_np):
    url, loader = served
    req = urllib.request.Request(f"{url}/classify",
                                 data=_png_bytes(rng_np), method="POST")
    with urllib.request.urlopen(req) as r:
        data = json.loads(r.read())
    assert data["label"] in loader.class_names
    assert len(data["top5"]) == 5


def test_classify_real_image(served, tiny_dataset):
    url, loader = served
    path = loader.train_data["class_2"][0]
    with open(path, "rb") as f:
        body = f.read()
    req = urllib.request.Request(f"{url}/classify", data=body,
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        data = json.loads(r.read())
    assert data["label"] in loader.class_names


def test_embed(served, rng_np):
    url, _ = served
    req = urllib.request.Request(f"{url}/embed", data=_png_bytes(rng_np),
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        data = json.loads(r.read())
    assert len(data["embedding"]) == 16


def test_concurrent_requests_microbatch(served, rng_np):
    url, loader = served
    results = []

    def hit():
        req = urllib.request.Request(f"{url}/classify",
                                     data=_png_bytes(rng_np),
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            results.append(json.loads(r.read()))

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert len(results) == 8
    assert all(r["label"] in loader.class_names for r in results)


def test_bad_requests(served):
    url, _ = served
    # garbage bytes
    req = urllib.request.Request(f"{url}/classify", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    # unknown path
    req = urllib.request.Request(f"{url}/nope", data=b"x", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 404
    # empty body
    req = urllib.request.Request(f"{url}/classify", data=b"",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_quantized_engine(tmp_path, tiny_dataset, rng_np):
    from embeddingnet_tpu.serving import InferenceEngine
    params = params_from_dict({
        "MODEL": {"input_shape": [32, 32, 3], "encodings_len": 16,
                  "mode": "triplet", "backbone_name": "simple2",
                  "backbone_weights": None},
        "DATALOADER": {"dataset_path": tiny_dataset},
        "GENERAL": {"project_name": "qserve", "work_dir": str(tmp_path)},
    })
    loader = ENDataLoader(tiny_dataset, validate=False)
    net = EmbeddingNet(params)
    net.generate_encodings(loader, max_n_samples=4)
    engine = InferenceEngine(net, max_batch=4, quantize_db=True)
    try:
        import cv2
        img = rng_np.integers(0, 255, (20, 20, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".png", img)
        out = engine.infer_one(buf.tobytes())
        assert out["label"] in loader.class_names
        assert len(out["top5"]) == 5
    finally:
        engine.close()


def test_classify_batch_endpoint(served, tiny_dataset, rng_np):
    import struct
    url, loader = served
    bodies = []
    for cls in ["class_0", "class_1", "class_2"]:
        with open(loader.train_data[cls][0], "rb") as f:
            bodies.append(f.read())
    bodies.append(b"not an image")  # decode failure slot -> null label
    payload = struct.pack(">I", len(bodies)) + b"".join(
        struct.pack(">I", len(b)) + b for b in bodies)
    req = urllib.request.Request(f"{url}/classify_batch", data=payload,
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        data = json.loads(r.read())
    assert len(data["labels"]) == 4
    assert all(l in loader.class_names for l in data["labels"][:3])
    assert data["labels"][3] is None
    # malformed framing -> 400
    req = urllib.request.Request(f"{url}/classify_batch", data=b"\x00\x00",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
