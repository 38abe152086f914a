"""Round-2 regression tests: VERDICT.md 'missing' items + ADVICE.md fixes.

Covers: loud named-preset weight resolution (+ $EMBEDDINGNET_WEIGHTS_DIR
cache), reference-granularity freeze mode, softmax-pretraining callback
fidelity (plateau lowers LR, early stop restores best weights, val epoch
consumes ``val_steps``), arcface pretraining handoff, the decode-pipeline
end-of-stream sentinel, and the CSV index cache key.
"""

import os
import time

import numpy as np
import pytest

import jax

from embeddingnet_tpu.config import ConfigError, SoftmaxPretrainConfig
from embeddingnet_tpu.data import ENDataLoader
from embeddingnet_tpu.train import Trainer

from test_train_loop import make_params


@pytest.fixture
def loader(tiny_dataset):
    return ENDataLoader(tiny_dataset, validate=True, val_ratio=0.2)


# -- backbone_weights resolution (VERDICT missing #3) ------------------------

def test_named_preset_without_cache_fails_loudly(tmp_path, tiny_dataset,
                                                 loader, monkeypatch):
    monkeypatch.delenv("EMBEDDINGNET_WEIGHTS_DIR", raising=False)
    params = make_params(tmp_path, tiny_dataset,
                         extra_model={"backbone_weights": "imagenet"})
    with pytest.raises(FileNotFoundError, match="named preset"):
        Trainer(params, loader, log_fn=lambda *a: None)


def test_missing_weights_file_fails_loudly(tmp_path, tiny_dataset, loader):
    params = make_params(
        tmp_path, tiny_dataset,
        extra_model={"backbone_weights": str(tmp_path / "nope.npz")})
    with pytest.raises(FileNotFoundError, match="not found"):
        Trainer(params, loader, log_fn=lambda *a: None)


def test_named_preset_resolves_from_weights_dir(tmp_path, tiny_dataset,
                                                loader, monkeypatch):
    from embeddingnet_tpu.models import pretrained

    # build a donor model, save its params as the cached 'imagenet' file
    params = make_params(tmp_path, tiny_dataset)
    donor = Trainer(params, loader, log_fn=lambda *a: None)
    flat = pretrained.flatten_params(donor.variables)
    wdir = tmp_path / "weights_cache"
    wdir.mkdir()
    np.savez(wdir / "simple2_imagenet.npz", **flat)
    donor_leaf = np.asarray(
        jax.tree_util.tree_leaves(donor.variables["params"]["backbone"])[0])

    monkeypatch.setenv("EMBEDDINGNET_WEIGHTS_DIR", str(wdir))
    params2 = make_params(tmp_path, tiny_dataset,
                          extra_model={"backbone_weights": "imagenet"})
    params2.general.seed = 99  # different init; loaded weights must win
    t2 = Trainer(params2, loader, log_fn=lambda *a: None)
    got_leaf = np.asarray(
        jax.tree_util.tree_leaves(t2.state.params["backbone"])[0])
    np.testing.assert_allclose(got_leaf, donor_leaf)


def test_weights_load_into_siamese_encoder_subtree(tmp_path, tiny_dataset,
                                                   loader):
    from embeddingnet_tpu.models import pretrained

    params = make_params(tmp_path, tiny_dataset)
    donor = Trainer(params, loader, log_fn=lambda *a: None)
    wfile = tmp_path / "enc.npz"
    np.savez(wfile, **pretrained.flatten_params(donor.variables))

    params2 = make_params(tmp_path, tiny_dataset, mode="siamese",
                          extra_model={"backbone_weights": str(wfile)})
    t2 = Trainer(params2, loader, log_fn=lambda *a: None)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(
            t2.state.params["encoder"]["backbone"])[0]),
        np.asarray(jax.tree_util.tree_leaves(
            donor.variables["params"]["backbone"])[0]))


# -- freeze granularity (VERDICT missing #4) ---------------------------------

def test_freeze_except_last_2_mask():
    from embeddingnet_tpu.models import EmbeddingModule
    from embeddingnet_tpu.models.registry import backbone_param_mask
    import jax.numpy as jnp

    m = EmbeddingModule(backbone_name="resnet18", encodings_len=16)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((1, 32, 32, 3)), train=False)
    params = v["params"]
    backbone_keys = list(params["backbone"].keys())
    mask = backbone_param_mask(params, "except_last_2")

    def all_leaves(tree):
        return jax.tree_util.tree_leaves(tree)

    # last two backbone submodules trainable, the rest frozen
    for k in backbone_keys[:-2]:
        assert not any(all_leaves(mask["backbone"][k]))
    for k in backbone_keys[-2:]:
        assert all(all_leaves(mask["backbone"][k]))
    # head stays trainable
    assert all(all_leaves(mask["head"]))

    # 'all' mode: whole backbone frozen
    mask_all = backbone_param_mask(params, True)
    assert not any(all_leaves(mask_all["backbone"]))
    assert all(all_leaves(mask_all["head"]))


def test_freeze_except_last_2_trains(tmp_path, tiny_dataset, loader):
    params = make_params(tmp_path, tiny_dataset,
                         extra_model={"freeze_backbone": "except_last_2"})
    trainer = Trainer(params, loader, log_fn=lambda *a: None)
    first_key = list(trainer.state.params["backbone"].keys())[0]
    before = np.asarray(jax.tree_util.tree_leaves(
        trainer.state.params["backbone"][first_key])[0]).copy()
    trainer.fit(n_epochs=1)
    after = np.asarray(jax.tree_util.tree_leaves(
        trainer.state.params["backbone"][first_key])[0])
    np.testing.assert_array_equal(before, after)  # frozen early layer


def test_freeze_backbone_config_validation(tmp_path, tiny_dataset):
    with pytest.raises(ConfigError, match="freeze_backbone"):
        make_params(tmp_path, tiny_dataset,
                    extra_model={"freeze_backbone": "bogus"})


# -- softmax pretraining parity (VERDICT missing #2 / next #4) ---------------

def _scripted_pretrain_trainer(tmp_path, tiny_dataset, loader, losses,
                               n_epochs):
    """Trainer whose pretrain epochs return scripted val_loss values and
    bump a param each epoch (so snapshots differ between epochs)."""
    params = make_params(tmp_path, tiny_dataset)
    params.softmax = SoftmaxPretrainConfig(
        optimizer="sgd", learning_rate=0.0, n_epochs=n_epochs, batch_size=4,
        steps_per_epoch=1, val_steps=1,
        input_shape=params.model.input_shape)

    class Scripted(Trainer):
        def __init__(self, *a, **kw):
            self.epoch_i = 0
            super().__init__(*a, **kw)

        def _pretrain_epoch(self, state, *a, **kw):
            loss = losses[min(self.epoch_i, len(losses) - 1)]
            self.epoch_i += 1
            # perturb one param leaf so each epoch's snapshot is distinct
            params_ = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
            state = state.replace(params=params_, step=state.step + 1)
            return state, {"loss": loss, "val_loss": loss}

    return Scripted(params, loader, log_fn=lambda *a: None)


def test_pretrain_plateau_lowers_lr(tmp_path, tiny_dataset, loader):
    from embeddingnet_tpu.train import optim
    # constant val_loss: no improvement after epoch 0 -> plateau (patience
    # 4) fires at epoch 4 and the LR scale drops by 0.1
    t = _scripted_pretrain_trainer(tmp_path, tiny_dataset, loader,
                                   losses=[1.0], n_epochs=6)
    state = t.pretrain_softmax()
    assert optim.get_plateau_scale(state.opt_state) == pytest.approx(0.1)


def test_pretrain_restores_best_weights(tmp_path, tiny_dataset, loader):
    # best val_loss at epoch 1 (0-indexed); later epochs worsen. The
    # handed-off state must be the epoch-1 snapshot: scripted epochs add
    # +1.0 to every pretrain param per epoch, so the restored backbone is
    # exactly init + 2.0 (epochs 0 and 1), NOT init + 4.0 (final live).
    t = _scripted_pretrain_trainer(
        tmp_path, tiny_dataset, loader,
        losses=[1.0, 0.5, 2.0, 3.0], n_epochs=4)
    init_backbone = np.asarray(jax.tree_util.tree_leaves(
        t.state.params["backbone"])[0]).copy()
    state = t.pretrain_softmax()
    assert int(state.step) == 4  # all epochs ran (patience not hit)
    restored = np.asarray(jax.tree_util.tree_leaves(
        state.params["backbone"])[0])
    np.testing.assert_allclose(restored, init_backbone + 2.0, rtol=1e-6)
    # and the handoff wrote the restored backbone into the main model
    main_leaf = np.asarray(jax.tree_util.tree_leaves(
        t.state.params["backbone"])[0])
    np.testing.assert_allclose(main_leaf, restored)


def test_pretrain_val_epoch_runs(tmp_path, tiny_dataset, loader):
    """val_steps is actually consumed: val metrics appear and drive the
    monitor when validation data exists."""
    params = make_params(tmp_path, tiny_dataset)
    params.softmax = SoftmaxPretrainConfig(
        optimizer="adam", learning_rate=1e-3, n_epochs=1, batch_size=4,
        steps_per_epoch=2, val_steps=2, input_shape=params.model.input_shape)
    logs = []
    t = Trainer(params, loader, log_fn=lambda msg: logs.append(str(msg)))
    t.pretrain_softmax()
    pretrain_logs = [l for l in logs if "softmax-pretrain" in l]
    assert pretrain_logs and "val_loss" in pretrain_logs[0]


def test_pretrain_arcface_handoff(tmp_path, tiny_dataset, loader):
    """ADVICE medium #2: pretraining in arcface mode must preserve the
    {'encoder', 'class_weights'} tree and leave training runnable."""
    params = make_params(tmp_path, tiny_dataset, mode="arcface")
    params.softmax = SoftmaxPretrainConfig(
        optimizer="adam", learning_rate=1e-3, n_epochs=1, batch_size=4,
        steps_per_epoch=1, val_steps=0, input_shape=params.model.input_shape)
    t = Trainer(params, loader, log_fn=lambda *a: None)
    before_cw = np.asarray(t.state.params["class_weights"]).copy()
    t.pretrain_softmax()
    assert set(t.state.params.keys()) == {"encoder", "class_weights"}
    np.testing.assert_array_equal(
        np.asarray(t.state.params["class_weights"]), before_cw)
    history = t.fit(n_epochs=1)
    assert np.isfinite(history.history["loss"]).all()


def test_pretrained_weight_flow_end_to_end(tmp_path, tiny_dataset, loader):
    """ROADMAP: the full pretrained-weight flow — softmax-pretrain a
    backbone, export it as ``.npz`` (the converter exchange format),
    start a NEW training via ``MODEL.backbone_weights``, and verify the
    weights actually flowed (initial embeddings match the donor) and
    train normally from there."""
    from embeddingnet_tpu.models import pretrained

    params = make_params(tmp_path, tiny_dataset)
    params.softmax = SoftmaxPretrainConfig(
        optimizer="adam", learning_rate=1e-3, n_epochs=1, batch_size=4,
        steps_per_epoch=2, val_steps=0, input_shape=params.model.input_shape)
    donor = Trainer(params, loader, log_fn=lambda *a: None)
    donor.pretrain_softmax()
    wfile = tmp_path / "pretrained_backbone.npz"
    np.savez(wfile, **pretrained.flatten_params(
        {"params": donor.state.params,
         "batch_stats": donor.state.batch_stats}))

    params2 = make_params(tmp_path, tiny_dataset,
                          extra_model={"backbone_weights": str(wfile)})
    params2.general.seed = 7  # different random init; file must win
    t2 = Trainer(params2, loader, log_fn=lambda *a: None)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(
            t2.state.params["backbone"])[0]),
        np.asarray(jax.tree_util.tree_leaves(
            donor.state.params["backbone"])[0]))

    before = np.asarray(jax.tree_util.tree_leaves(
        t2.state.params["backbone"])[0]).copy()
    history = t2.fit(n_epochs=1)
    assert np.isfinite(history.history["loss"]).all()
    after = np.asarray(jax.tree_util.tree_leaves(
        t2.state.params["backbone"])[0])
    assert not np.allclose(before, after)  # pretrained init trained on


def test_fingerprint_stable_across_save_load(tmp_path, tiny_dataset, loader):
    """The weights fingerprint must survive the train-CLI export ->
    test-CLI load round trip: the Trainer's variables tree and a fresh
    ``module.init`` template carry different dict insertion orders, and
    hashing the msgpack bytes made matching weights look mismatched."""
    import warnings
    from embeddingnet_tpu.models import EmbeddingNet

    params = make_params(tmp_path, tiny_dataset)
    trainer = Trainer(params, loader, log_fn=lambda *a: None)
    trainer.fit(n_epochs=1)

    net = EmbeddingNet(params)
    net.variables = trainer.encoder_variables()  # trainer tree order
    import jax as _jax
    net._encode_jit = _jax.jit(
        lambda v, x: net.module.apply(v, x, train=False))
    db = net.generate_encodings(loader, max_n_samples=2)
    net.save_encodings(db, str(tmp_path), "enc.pkl")
    wpath = net.save_base_model(str(tmp_path))

    net2 = EmbeddingNet(params)  # fresh init template order
    net2.load_model(wpath)
    assert net2.weights_fingerprint() == net.weights_fingerprint()
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any mismatch warning -> fail
        net2.load_encodings(str(tmp_path / "enc.pkl"))


# -- decode pipeline sentinel (ADVICE medium #1) ------------------------------

def test_pipeline_sentinel_delivered_when_queue_full(tiny_dataset):
    """Slow consumer + tiny queue: the end-of-stream sentinel must still
    arrive (pre-fix, a full queue dropped it and the epoch hung)."""
    from embeddingnet_tpu.data import BatchLoader
    from embeddingnet_tpu.data.samplers import SimpleSampler

    dl = ENDataLoader(tiny_dataset, validate=False)
    sampler = SimpleSampler(dl.train_data, dl.class_names, batch_size=2,
                            seed=0)
    loader = BatchLoader(sampler, (16, 16, 3), n_batches=6, prefetch=1,
                         num_workers=2)
    seen = 0
    deadline = time.time() + 60
    for _batch in loader:
        time.sleep(0.3)  # let the producer hit the full queue at the end
        seen += 1
        assert time.time() < deadline, "epoch did not terminate"
    assert seen == 6


# -- CSV index cache key (ADVICE low #4) --------------------------------------

def test_csv_cache_key_includes_columns(tmp_path):
    csv = tmp_path / "ann.csv"
    csv.write_text("image_id,label,alt\na.jpg,x,p\nb.jpg,y,q\n")
    cache = tmp_path / "cache"
    dl1 = ENDataLoader(str(tmp_path), train_csv_file=str(csv),
                       validate=False, cache_dir=str(cache))
    dl2 = ENDataLoader(str(tmp_path), train_csv_file=str(csv),
                       label_column="alt", validate=False,
                       cache_dir=str(cache))
    assert set(dl1.class_names) == {"x", "y"}
    assert set(dl2.class_names) == {"p", "q"}  # stale-cache bug would say x,y


def test_async_checkpoint_roundtrip(tmp_path, tiny_dataset, loader):
    """PERFORMANCE.async_checkpoint: saves complete in background, resume
    drains in-flight writes and restores the same state."""
    params = make_params(tmp_path, tiny_dataset)
    params.performance.async_checkpoint = True
    t1 = Trainer(params, loader, log_fn=lambda *a: None)
    t1.fit(n_epochs=1)
    step_before = int(t1.state.step)
    t1.ckpt_mgr.close()

    t2 = Trainer(params, loader, log_fn=lambda *a: None).resume()
    assert int(t2.state.step) == step_before


def test_performance_knobs_parse(tmp_path, tiny_dataset):
    """README's PERFORMANCE example keys all exist (device_prefetch was
    documented but unimplemented — the exact declared-but-unimplemented
    sin VERDICT r1 flags in the reference)."""
    from embeddingnet_tpu.config import params_from_dict
    p = params_from_dict({
        "MODEL": {"input_shape": [16, 16, 3], "encodings_len": 8,
                  "mode": "triplet", "backbone_name": "simple2"},
        "DATALOADER": {"dataset_path": str(tiny_dataset)},
        "GENERATOR": {"k_classes": 2, "k_samples": 2, "n_batches": 1},
        "TRAIN": {"learning_rate": 1e-3, "n_epochs": 1},
        "GENERAL": {"project_name": "knobs", "work_dir": str(tmp_path)},
        "PERFORMANCE": {"compute_dtype": "bfloat16",
                        "device_prefetch": False,
                        "async_checkpoint": True,
                        "ema_decay": 0.0,
                        "fast_decode": True},
    })
    assert p.performance.device_prefetch is False
    assert p.performance.fast_decode is True


def test_sync_transfer_path_trains(tmp_path, tiny_dataset, loader):
    """device_prefetch: false degrades to synchronous transfer and the
    epoch still runs to the same metrics structure."""
    params = make_params(tmp_path, tiny_dataset, n_epochs=1)
    params.performance.device_prefetch = False
    t = Trainer(params, loader, log_fn=lambda *a: None)
    hist = t.fit(1)
    assert hist.last("loss") is not None
