"""Round-3 regression tests: ADVICE.md (r2) fixes + VERDICT.md weak #3.

Covers: strict load_model (allowlisted classifier leniency only), exact
classifier-key fingerprint exclusion + dtype/shape folding, token-based
monitor_mode resolution, stats NaN-poisoning on P-K layout violation, and
the Trainer's one-time host-side fail-fast on ungrouped P-K batches.
"""

import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import serialization

from embeddingnet_tpu.models import EmbeddingNet
from embeddingnet_tpu.train import Trainer
from embeddingnet_tpu.train.callbacks import monitor_mode
from embeddingnet_tpu.ops.mining import parity_mined_loss_large

from test_train_loop import make_params


@pytest.fixture
def loader(tiny_dataset):
    from embeddingnet_tpu.data import ENDataLoader
    return ENDataLoader(tiny_dataset, validate=True, val_ratio=0.2)


# -- load_model strictness (ADVICE r2 medium #1) ------------------------------

def _net(tmp_path, tiny_dataset):
    return EmbeddingNet(make_params(tmp_path, tiny_dataset))


def test_load_model_round_trip(tmp_path, tiny_dataset):
    net = _net(tmp_path, tiny_dataset)
    path = net.save_base_model(str(tmp_path / "m"))
    fp = net.weights_fingerprint()
    net2 = _net(tmp_path, tiny_dataset)
    net2.load_model(path)
    assert net2.weights_fingerprint() == fp


def test_load_model_missing_classifier_is_lenient(tmp_path, tiny_dataset):
    net = _net(tmp_path, tiny_dataset)
    raw = serialization.msgpack_restore(
        serialization.to_bytes(net.variables))
    # encoder-view export: drop the classifier head everywhere it appears
    for coll in list(raw):
        if isinstance(raw[coll], dict):
            raw[coll].pop("classifier", None)
    p = tmp_path / "encoder_view.msgpack"
    p.write_bytes(serialization.msgpack_serialize(raw))
    net2 = _net(tmp_path, tiny_dataset)
    net2.load_model(str(p))  # must not raise
    assert net2.weights_fingerprint() == net.weights_fingerprint()


def test_load_model_truncated_checkpoint_raises(tmp_path, tiny_dataset):
    net = _net(tmp_path, tiny_dataset)
    raw = serialization.msgpack_restore(
        serialization.to_bytes(net.variables))
    # drop a NON-classifier subtree: must raise, not silently keep
    # fresh-random weights
    params = raw["params"]
    victim = next(k for k in params if k != "classifier")
    params.pop(victim)
    p = tmp_path / "truncated.msgpack"
    p.write_bytes(serialization.msgpack_serialize(raw))
    net2 = _net(tmp_path, tiny_dataset)
    with pytest.raises(KeyError, match="missing required subtree"):
        net2.load_model(str(p))


def test_load_model_extra_keys_warn(tmp_path, tiny_dataset):
    net = _net(tmp_path, tiny_dataset)
    raw = serialization.msgpack_restore(
        serialization.to_bytes(net.variables))
    raw["params"]["bogus_extra_head"] = {"kernel": np.zeros((2, 2),
                                                            np.float32)}
    p = tmp_path / "extra.msgpack"
    p.write_bytes(serialization.msgpack_serialize(raw))
    net2 = _net(tmp_path, tiny_dataset)
    with pytest.warns(UserWarning, match="bogus_extra_head"):
        net2.load_model(str(p))


# -- fingerprint exactness (ADVICE r2 low #3) ---------------------------------

def test_fingerprint_sensitive_to_shape(tmp_path, tiny_dataset):
    net = _net(tmp_path, tiny_dataset)
    fp1 = net.weights_fingerprint()
    # reshape one leaf: identical bytes, different shape -> must differ
    flat = jax.tree_util.tree_leaves(net.variables)
    target = next(a for a in flat if np.asarray(a).ndim >= 2)

    def reshape_first(tree):
        done = [False]

        def f(a):
            if not done[0] and a is target:
                done[0] = True
                return jnp.reshape(a, (-1,))
            return a
        return jax.tree_util.tree_map(f, tree)

    net.variables = reshape_first(net.variables)
    assert net.weights_fingerprint() != fp1


def test_fingerprint_excludes_exact_classifier_key_only(tmp_path,
                                                        tiny_dataset):
    net = _net(tmp_path, tiny_dataset)
    fp1 = net.weights_fingerprint()
    # mutating the real classifier head must NOT change the fingerprint

    def bump_classifier(tree, path=()):
        if not isinstance(tree, dict):
            return (tree + 1.0 if len(path) >= 2 and path[1] == "classifier"
                    else tree)
        return {k: bump_classifier(v, path + (k,)) for k, v in tree.items()}

    net.variables = bump_classifier(net.variables)
    assert net.weights_fingerprint() == fp1


# -- monitor_mode token matching (ADVICE r2 low #5) ---------------------------

@pytest.mark.parametrize("name,mode", [
    ("val_loss", "min"),
    ("loss", "min"),
    ("val_recall1", "max"),
    ("recall5", "max"),
    ("val_acc", "max"),
    ("accuracy", "max"),
    ("top5_acc", "max"),
    ("fmeasure", "max"),
    # substring 'acc' inside a token must NOT max-mode
    ("val_jaccard_loss", "min"),
    ("vaccination_rate", "min"),
])
def test_monitor_mode_tokens(name, mode):
    assert monitor_mode(name) == mode


# -- stats poisoning on layout violation (ADVICE r2 low #2) -------------------

def test_parity_pk_violation_poisons_stats():
    rng = np.random.default_rng(0)
    b, k = 16, 4
    emb = jnp.asarray(rng.normal(size=(b, 64)), jnp.float32)
    # ungrouped: interleave two classes across groups
    labels = jnp.asarray(np.arange(b) % 4, jnp.int32)
    loss, stats = parity_mined_loss_large(
        emb, labels, margin=0.5, mode="semihard",
        rng=jax.random.PRNGKey(0), max_positives=k - 1)
    assert np.isnan(float(loss))
    assert np.isnan(float(stats.frac_mined))
    assert np.isnan(float(stats.mean_pos_dist))
    assert int(stats.n_triplets) == -1
    assert int(stats.n_candidates) == -1


def test_parity_pk_grouped_batch_unpoisoned():
    rng = np.random.default_rng(0)
    b, k = 16, 4
    emb = jnp.asarray(rng.normal(size=(b, 64)), jnp.float32)
    labels = jnp.asarray(np.repeat(np.arange(b // k), k), jnp.int32)
    loss, stats = parity_mined_loss_large(
        emb, labels, margin=0.5, mode="semihard",
        rng=jax.random.PRNGKey(0), max_positives=k - 1)
    assert np.isfinite(float(loss))
    assert int(stats.n_triplets) >= 0


# -- Trainer fail-fast on ungrouped first batch (VERDICT r2 weak #3) ----------

def test_trainer_rejects_ungrouped_custom_loader(tmp_path, tiny_dataset,
                                                 loader):
    params = make_params(tmp_path, tiny_dataset)
    trainer = Trainer(params, loader, log_fn=lambda *a: None)

    def bad_loader():
        images = np.zeros((6, 32, 32, 3), np.float32)
        labels = np.array([0, 1, 2, 0, 1, 2], np.int32)  # k_samples=3 layout
        yield images, labels

    trainer._train_loader = bad_loader
    with pytest.raises(ValueError, match="grouped P-K"):
        trainer.fit(n_epochs=1)


def test_trainer_pk_sampler_layout_passes(tmp_path, tiny_dataset, loader):
    params = make_params(tmp_path, tiny_dataset)
    trainer = Trainer(params, loader, log_fn=lambda *a: None)
    history = trainer.fit(n_epochs=1)
    assert np.isfinite(history.history["loss"]).all()
