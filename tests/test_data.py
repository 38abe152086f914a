"""Dataset index, sampler, and pipeline tests on synthetic datasets."""

import os

import numpy as np
import pytest

from embeddingnet_tpu.data import (BatchLoader, ENDataLoader, PairSampler,
                                   PKSampler, SimpleSampler, TripletSampler)


def test_folder_index(tiny_dataset):
    dl = ENDataLoader(tiny_dataset, validate=True, val_ratio=0.2)
    assert dl.n_classes == 6
    assert sorted(dl.class_names) == [f"class_{i}" for i in range(6)]
    for cls in dl.class_names:
        assert dl.n_samples[cls] == 10
        assert len(dl.train_data[cls]) == 8
        assert len(dl.val_data[cls]) == 2


def test_folder_index_no_validate(tiny_dataset):
    dl = ENDataLoader(tiny_dataset, validate=False)
    assert dl.val_data == {}
    assert all(len(v) == 10 for v in dl.train_data.values())


def test_split_deterministic(tiny_dataset):
    a = ENDataLoader(tiny_dataset, val_ratio=0.2)
    b = ENDataLoader(tiny_dataset, val_ratio=0.2)
    assert a.train_data == b.train_data  # random_state=42 fixed split


def test_csv_index(tiny_dataset, tmp_path):
    rows = ["file_path,class_name"]
    for cls in sorted(os.listdir(tiny_dataset)):
        for f in sorted(os.listdir(os.path.join(tiny_dataset, cls))):
            rows.append(f"{cls}/{f},{cls}")
    csv = tmp_path / "train.csv"
    csv.write_text("\n".join(rows))
    dl = ENDataLoader(tiny_dataset, train_csv_file=str(csv),
                      image_id_column="file_path", label_column="class_name",
                      val_ratio=0.2, cache_dir=str(tmp_path / "cache"))
    assert dl.n_classes == 6
    some_path = dl.train_data[dl.class_names[0]][0]
    assert os.path.isfile(some_path)


def test_csv_cache_is_per_file(tiny_dataset, tmp_path):
    """The reference reuses one tmp/data.pickle for every CSV
    (datagenerators.py:63-71) — val CSV silently returned the train index.
    Verify the fix: two different CSVs give different indexes."""
    def write_csv(name, classes):
        rows = ["file_path,class_name"]
        for cls in classes:
            for f in sorted(os.listdir(os.path.join(tiny_dataset, cls))):
                rows.append(f"{cls}/{f},{cls}")
        p = tmp_path / name
        p.write_text("\n".join(rows))
        return str(p)

    cache = str(tmp_path / "cache")
    csv_a = write_csv("a.csv", ["class_0", "class_1"])
    csv_b = write_csv("b.csv", ["class_2", "class_3", "class_4"])
    dl_a = ENDataLoader(tiny_dataset, train_csv_file=csv_a,
                        image_id_column="file_path",
                        label_column="class_name", cache_dir=cache,
                        val_ratio=0.2)
    dl_b = ENDataLoader(tiny_dataset, train_csv_file=csv_b,
                        image_id_column="file_path",
                        label_column="class_name", cache_dir=cache,
                        val_ratio=0.2)
    assert dl_a.n_classes == 2
    assert dl_b.n_classes == 3
    # second load of A hits the cache and still returns A's index
    dl_a2 = ENDataLoader(tiny_dataset, train_csv_file=csv_a,
                         image_id_column="file_path",
                         label_column="class_name", cache_dir=cache,
                         val_ratio=0.2)
    assert dl_a2.n_classes == 2


def test_flat_view(tiny_dataset):
    dl = ENDataLoader(tiny_dataset, val_ratio=0.2)
    paths, labels = dl.flat("val")
    assert len(paths) == len(labels) == 6 * 2
    assert set(labels) == set(dl.class_names)


def test_pk_sampler_distribution(tiny_dataset):
    dl = ENDataLoader(tiny_dataset, val_ratio=0.2)
    s = PKSampler(dl.train_data, dl.class_names, k_classes=3, k_samples=4,
                  seed=1)
    paths, labels = s.sample()
    assert len(paths) == 12
    assert labels.shape == (12,)
    # k_classes distinct classes, k_samples each
    uniq, counts = np.unique(labels, return_counts=True)
    assert len(uniq) == 3
    assert (counts == 4).all()


def test_pk_sampler_caps_k_classes(tiny_dataset):
    dl = ENDataLoader(tiny_dataset, val_ratio=0.2)
    s = PKSampler(dl.train_data, dl.class_names, k_classes=100, k_samples=2)
    paths, labels = s.sample()
    assert len(np.unique(labels)) == 6  # capped at n_classes


def test_pair_sampler_targets(tiny_dataset):
    dl = ENDataLoader(tiny_dataset, val_ratio=0.2)
    s = PairSampler(dl.train_data, dl.class_names, batch_size=8, seed=2)
    (left, right), targets = s.sample()
    assert len(left) == len(right) == 8
    np.testing.assert_array_equal(targets[:4], 1.0)
    np.testing.assert_array_equal(targets[4:], 0.0)


def test_triplet_sampler(tiny_dataset):
    dl = ENDataLoader(tiny_dataset, val_ratio=0.2)
    s = TripletSampler(dl.train_data, dl.class_names, batch_size=6, seed=3)
    (a, p, n), labels = s.sample()
    assert len(a) == len(p) == len(n) == 6
    for ai, pi, ni in zip(a, p, n):
        cls_a = os.path.basename(os.path.dirname(ai))
        cls_p = os.path.basename(os.path.dirname(pi))
        cls_n = os.path.basename(os.path.dirname(ni))
        assert cls_a == cls_p
        assert cls_a != cls_n


def test_batch_loader_decodes(tiny_dataset):
    dl = ENDataLoader(tiny_dataset, val_ratio=0.2)
    s = PKSampler(dl.train_data, dl.class_names, k_classes=2, k_samples=3)
    loader = BatchLoader(s, input_shape=(16, 16, 3), num_workers=2,
                         n_batches=3)
    batches = list(loader)
    assert len(batches) == 3
    images, labels = batches[0]
    assert images.shape == (6, 16, 16, 3)
    assert images.dtype == np.uint8
    assert labels.shape == (6,)


def test_batch_loader_finite_sampler_drains_cleanly(tiny_dataset):
    """A finite sampler with n_batches unset must end the epoch via the
    sentinel, not by letting StopIteration escape the producer thread
    (VERDICT r3 weak #5 — the escape surfaced as
    PytestUnhandledThreadExceptionWarning on every suite run)."""
    import threading

    dl = ENDataLoader(tiny_dataset, val_ratio=0.2)
    s = PKSampler(dl.train_data, dl.class_names, k_classes=2, k_samples=3)
    batches = [next(iter(s)) for _ in range(4)]  # exactly-divisible epoch

    class FiniteSampler:
        def __iter__(self):
            return iter(batches)

    thread_errors = []
    prev_hook = threading.excepthook
    threading.excepthook = lambda args: thread_errors.append(args)
    try:
        loader = BatchLoader(FiniteSampler(), input_shape=(16, 16, 3),
                             num_workers=2, backend="python")
        out = list(loader)       # n_batches=None: drain to exhaustion
        out2 = list(loader)      # loader is re-iterable across epochs
    finally:
        threading.excepthook = prev_hook
    assert len(out) == 4 and len(out2) == 4
    assert thread_errors == []


def test_batch_loader_tuple_structure(tiny_dataset):
    dl = ENDataLoader(tiny_dataset, val_ratio=0.2)
    s = PairSampler(dl.train_data, dl.class_names, batch_size=4)
    loader = BatchLoader(s, input_shape=(16, 16, 3), num_workers=2,
                         n_batches=2)
    (imgs, targets) = next(iter(loader))
    assert isinstance(imgs, tuple) and len(imgs) == 2
    assert imgs[0].shape == (4, 16, 16, 3)


def test_missing_image_dropped(tmp_path):
    from embeddingnet_tpu.data.images import get_images
    import cv2
    p = tmp_path / "ok.png"
    cv2.imwrite(str(p), np.zeros((8, 8, 3), np.uint8))
    imgs = get_images([str(p), str(tmp_path / "missing.png")], (8, 8, 3))
    assert imgs.shape == (1, 8, 8, 3)


def test_bgr_channel_order(tmp_path):
    """cv2.imread returns BGR — parity-critical (utils.py:13-21)."""
    import cv2
    from embeddingnet_tpu.data.images import get_image
    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 2] = 255  # red channel in BGR write order
    cv2.imwrite(str(tmp_path / "red.png"), img)
    loaded = get_image(str(tmp_path / "red.png"))
    assert loaded[..., 2].min() == 255  # stays BGR: red in channel 2
    assert loaded[..., 0].max() == 0


def test_csv_google_layout(tmp_path):
    """is_google=True: <root>/<c0>/<c1>/<c2>/<id>.jpg path scheme
    (datagenerators.py:79)."""
    import cv2
    root = tmp_path / "gdata"
    rng = np.random.default_rng(0)
    rows = ["image_id,label"]
    for i, image_id in enumerate(["abc123", "abd456", "xyz789"]):
        d = root / image_id[0] / image_id[1] / image_id[2]
        d.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(d / f"{image_id}.jpg"),
                    rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
        rows.append(f"{image_id},cls_{i % 2}")
    csv = tmp_path / "g.csv"
    csv.write_text("\n".join(rows))
    dl = ENDataLoader(str(root) + "/", train_csv_file=str(csv),
                      is_google=True, validate=False,
                      cache_dir=str(tmp_path / "cache"))
    assert dl.n_classes == 2
    for paths in dl.train_data.values():
        for p in paths:
            assert os.path.isfile(p), p


def test_csv_with_separate_val_csv(tiny_dataset, tmp_path):
    """val_csv_file: train index untouched, val loaded from its own file
    (datagenerators.py:42-44)."""
    def write_csv(name, classes, lo, hi):
        rows = ["file_path,class_name"]
        for cls in classes:
            files = sorted(os.listdir(os.path.join(tiny_dataset, cls)))
            for f in files[lo:hi]:
                rows.append(f"{cls}/{f},{cls}")
        p = tmp_path / name
        p.write_text("\n".join(rows))
        return str(p)

    classes = [f"class_{i}" for i in range(6)]
    train_csv = write_csv("train.csv", classes, 0, 8)
    val_csv = write_csv("val.csv", classes, 8, 10)
    dl = ENDataLoader(tiny_dataset, train_csv_file=train_csv,
                      val_csv_file=val_csv,
                      image_id_column="file_path",
                      label_column="class_name", validate=True,
                      cache_dir=str(tmp_path / "cache"))
    assert all(len(v) == 8 for v in dl.train_data.values())
    assert all(len(v) == 2 for v in dl.val_data.values())
    # train data NOT split when a val CSV is given
    assert dl.train_data == dl.class_files_paths


def test_decode_cache_hits_and_budget(tmp_path):
    """DecodeCache: second pass serves identical pixels from RAM; the
    byte budget stops inserts without evicting."""
    import cv2
    from embeddingnet_tpu.data.pipeline import BatchLoader, DecodeCache

    paths = []
    rng = np.random.default_rng(0)
    for i in range(6):
        p = str(tmp_path / f"im{i}.png")
        cv2.imwrite(p, rng.integers(0, 255, (20, 20, 3)).astype(np.uint8))
        paths.append(p)

    class OneBatch:
        def __iter__(self):
            yield paths, np.arange(len(paths), dtype=np.int32)

    cache = DecodeCache(budget_mb=1)
    loader = BatchLoader(OneBatch(), (16, 16, 3), n_batches=1,
                         backend="python", cache=cache)
    (first, _), = list(loader)
    assert len(cache._data) == 6          # all cached (6 * 768 B << 1 MB)
    # a second epoch-style loader sharing the cache returns identical pixels
    loader2 = BatchLoader(OneBatch(), (16, 16, 3), n_batches=1,
                          backend="python", cache=cache)
    (second, _), = list(loader2)
    np.testing.assert_array_equal(first, second)

    tiny = DecodeCache(budget_mb=0)       # zero budget: nothing inserts
    loader3 = BatchLoader(OneBatch(), (16, 16, 3), n_batches=1,
                          backend="python", cache=tiny)
    (third, _), = list(loader3)
    assert len(tiny._data) == 0
    np.testing.assert_array_equal(first, third)


def test_train_sampler_epochs_differ(tmp_path, tiny_dataset):
    """Each epoch must draw a DIFFERENT random batch sequence (the
    reference reshuffles per epoch, datagenerators.py:121-127): with a
    fixed per-epoch seed the old code replayed epoch 0 forever."""
    from embeddingnet_tpu.config import params_from_dict
    from embeddingnet_tpu.data import ENDataLoader
    from embeddingnet_tpu.train import Trainer

    params = params_from_dict({
        "MODEL": {"input_shape": [32, 32, 3], "encodings_len": 8,
                  "mode": "triplet", "backbone_name": "simple2",
                  "backbone_weights": None},
        "DATALOADER": {"dataset_path": tiny_dataset, "validate": False},
        "GENERATOR": {"negatives_selection_mode": "batch_all",
                      "k_classes": 3, "k_samples": 2, "n_batches": 2},
        "TRAIN": {"optimizer": "adam", "n_epochs": 2,
                  "plot_history": False},
        "GENERAL": {"project_name": "p", "work_dir": str(tmp_path / "wd")},
        "PERFORMANCE": {"compute_dtype": "float32"},
    })
    loader = ENDataLoader(tiny_dataset, validate=False)
    trainer = Trainer(params, loader, log_fn=lambda *a: None)

    def epoch_paths(epoch):
        trainer._current_epoch = epoch
        sampler_batches = []
        it = iter(trainer._train_loader().sampler)
        for _ in range(2):
            paths, _labels = next(it)
            sampler_batches.append(tuple(paths))
        return sampler_batches

    assert epoch_paths(0) != epoch_paths(1)
    assert epoch_paths(0) == epoch_paths(0)  # still reproducible


def test_decode_cache_never_retains_views():
    """put() must copy row views: retaining a view of a [M, h, w, 3]
    decode buffer would pin the whole buffer while _bytes accounts only
    the row (round-3 review finding)."""
    from embeddingnet_tpu.data.pipeline import DecodeCache

    cache = DecodeCache(budget_mb=1)
    batch = np.arange(4 * 8 * 8 * 3, dtype=np.uint8).reshape(4, 8, 8, 3)
    cache.put("a", batch[0])              # a view
    stored = cache._data["a"]
    assert stored.base is None            # owns its memory
    np.testing.assert_array_equal(stored, batch[0])
    # standalone arrays are stored as-is (no redundant copy)
    solo = np.zeros((8, 8, 3), np.uint8)
    cache.put("b", solo)
    assert cache._data["b"] is solo
