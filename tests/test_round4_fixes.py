"""Regression tests for the round-4 VERDICT items.

1. Staged mining (TRAIN.mining_warmup_epochs): configs[2]'s proven
   semihard -> batch_hard recipe runs in ONE invocation (VERDICT r3
   weak #6).
2. BatchLoader finite-sampler drain lives in test_data.py; GSPMD
   parity-mode mining lives in test_sharded.py.
"""

import numpy as np
import pytest

from embeddingnet_tpu.config import ConfigError, params_from_dict
from embeddingnet_tpu.data import ENDataLoader
from embeddingnet_tpu.train import Trainer


def make_params(tmp_path, dataset, train_extra=None, gen_extra=None):
    return params_from_dict({
        "MODEL": {"input_shape": [32, 32, 3], "encodings_len": 16,
                  "mode": "triplet", "backbone_name": "simple2",
                  "backbone_weights": None},
        "DATALOADER": {"dataset_path": dataset, "validate": True,
                       "val_ratio": 0.2},
        "GENERATOR": {"negatives_selection_mode": "batch_hard",
                      "k_classes": 3, "k_samples": 3, "margin": 0.5,
                      "batch_size": 6, "n_batches": 2, "n_batches_val": 1,
                      **(gen_extra or {})},
        "TRAIN": {"optimizer": "adam", "learning_rate": 0.001,
                  "n_epochs": 3, "plot_history": False,
                  **(train_extra or {})},
        "GENERAL": {"project_name": "r4_staged",
                    "work_dir": str(tmp_path / "wd"), "seed": 0},
        "PERFORMANCE": {"compute_dtype": "float32"},
    })


def test_mining_warmup_switches_mode_mid_run(tmp_path, tiny_dataset):
    """Epochs [0, warmup) run mining_warmup_mode, then the step is
    rebuilt for GENERATOR.negatives_selection_mode — one invocation, no
    manual --resume_from dance."""
    params = make_params(tmp_path, tiny_dataset,
                         train_extra={"mining_warmup_epochs": 2,
                                      "mining_warmup_mode": "semihard"})
    logs = []
    dl = ENDataLoader(tiny_dataset, validate=True, val_ratio=0.2)
    trainer = Trainer(params, dl, log_fn=lambda *a: logs.append(" ".join(
        str(x) for x in a)))
    assert trainer._mining_mode == "semihard"          # warmup stage
    history = trainer.fit()
    assert trainer._mining_mode == "batch_hard"        # switched at epoch 2
    assert len(history.history["loss"]) == 3
    assert np.isfinite(history.history["loss"]).all()
    assert any("mining mode semihard -> batch_hard" in l for l in logs)


@pytest.mark.slow  # 40-140s compile on the quick-loop box; full suite only
def test_mining_warmup_resume_lands_in_right_stage(tmp_path, tiny_dataset):
    """The active mode is a pure function of the epoch: a resume past the
    warmup boundary must build the main mode, not replay the warmup."""
    params = make_params(tmp_path, tiny_dataset,
                         train_extra={"mining_warmup_epochs": 1})
    dl = ENDataLoader(tiny_dataset, validate=True, val_ratio=0.2)
    t1 = Trainer(params, dl, log_fn=lambda *a: None)
    t1.fit(n_epochs=2)                                  # epochs 0 (warm), 1
    t2 = Trainer(params, dl, log_fn=lambda *a: None).resume()
    assert t2.start_epoch == 2
    t2.fit(n_epochs=3)                                  # epoch 2: main mode
    assert t2._mining_mode == "batch_hard"


def test_mining_warmup_off_keeps_reference_behavior(tmp_path, tiny_dataset):
    params = make_params(tmp_path, tiny_dataset)
    dl = ENDataLoader(tiny_dataset, validate=True, val_ratio=0.2)
    trainer = Trainer(params, dl, log_fn=lambda *a: None)
    assert trainer._mining_mode == "batch_hard"
    trainer.fit(n_epochs=1)
    assert trainer._mining_mode == "batch_hard"


def test_mining_warmup_validation():
    with pytest.raises(ConfigError):
        params_from_dict({"TRAIN": {"mining_warmup_epochs": -1}})
    with pytest.raises(ConfigError):
        params_from_dict({"TRAIN": {"mining_warmup_mode": "bogus"}})


def test_sync_headline_rewrites_from_bench_artifact(tmp_path, monkeypatch):
    """README headline single-source-of-truth (VERDICT r3 weak #7): the
    sync tool rewrites the marker block from the newest BENCH artifact
    and refuses null-value watchdog artifacts."""
    import importlib.util
    import json
    import os
    spec = importlib.util.spec_from_file_location(
        "sync_headline", os.path.join(os.path.dirname(__file__),
                                      "..", "tools", "sync_headline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    (tmp_path / "README.md").write_text(
        "# x\n<!-- HEADLINE:BEGIN -->\nold\n<!-- HEADLINE:END -->\ntail\n")
    (tmp_path / "BENCH_r07.json").write_text(json.dumps({
        "parsed": {"value": 12345.6, "vs_baseline": 100.1,
                   "vs_reference_genuine": 900.0,
                   "augmented_value": 11111.0}}))
    monkeypatch.setattr(mod, "ROOT", str(tmp_path))
    monkeypatch.setattr(mod, "sys", type(mod.sys)("sys"))
    mod.sys.argv = ["sync_headline.py"]
    mod.main()
    text = (tmp_path / "README.md").read_text()
    assert "12,346 images/sec/chip" in text
    assert "BENCH_r07.json" in text
    assert "old" not in text and text.endswith("tail\n")
    # idempotent
    mod.main()
    assert (tmp_path / "README.md").read_text().count("HEADLINE:BEGIN") == 1

    (tmp_path / "BENCH_r08.json").write_text(json.dumps({
        "parsed": {"value": None}}))
    with pytest.raises(SystemExit):
        mod.main()
