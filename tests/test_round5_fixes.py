"""Regression tests for the round-5 ADVICE (r4) items.

1. The Trainer's host-side P-K layout guard checks EVERY batch, not
   just batch 0 — a violating remainder batch from a custom loader must
   raise the named error, not NaN-poison the run.
2. StatePacker passes through params-shaped opt subtrees whose leaf
   dtypes diverge from params (e.g. a bf16 moment) instead of silently
   upcasting them through the f32 flat buffer.
3. tools/sync_headline.py emits well-formed text when vs_baseline /
   vs_reference_genuine are absent from the artifact.

(The sharded n_triplets sentinel fix is asserted where the poison test
already lives, tests/test_sharded.py::test_sharded_batch_all_pk_poisons_
on_ungrouped.)
"""

import importlib.util
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embeddingnet_tpu.data import ENDataLoader
from embeddingnet_tpu.train import Trainer

from test_train_loop import make_params


@pytest.fixture
def loader(tiny_dataset):
    return ENDataLoader(tiny_dataset, validate=True, val_ratio=0.2)


# -- 1. P-K layout guard covers every batch (ADVICE r4 #1) --------------------

def test_trainer_rejects_ungrouped_later_batch(tmp_path, tiny_dataset,
                                               loader):
    """A custom loader whose FIRST batch is fine but whose second batch
    violates the grouped P-K layout (the remainder-batch scenario) must
    hit the named ValueError, not NaN-poison the run."""
    params = make_params(tmp_path, tiny_dataset)
    trainer = Trainer(params, loader, log_fn=lambda *a: None)

    def bad_second_batch_loader():
        images = np.zeros((6, 32, 32, 3), np.float32)
        good = np.array([0, 0, 0, 1, 1, 1], np.int32)   # grouped, k=3
        bad = np.array([0, 1, 2, 0, 1, 2], np.int32)    # interleaved
        yield images, good
        yield images, bad

    trainer._train_loader = bad_second_batch_loader
    with pytest.raises(ValueError, match="grouped P-K"):
        trainer.fit(n_epochs=1)


def test_trainer_rejects_duplicate_group_labels(tmp_path, tiny_dataset,
                                                loader):
    """Two groups of the same class split one class across groups — the
    O(B) distinct-heads check must catch what the old [B,B] counts check
    caught."""
    params = make_params(tmp_path, tiny_dataset)
    trainer = Trainer(params, loader, log_fn=lambda *a: None)

    def dup_group_loader():
        images = np.zeros((6, 32, 32, 3), np.float32)
        labels = np.array([0, 0, 0, 0, 0, 0], np.int32)  # grouped but dup
        yield images, labels

    trainer._train_loader = dup_group_loader
    with pytest.raises(ValueError, match="grouped P-K"):
        trainer.fit(n_epochs=1)


# -- 2. StatePacker dtype guard (ADVICE r4 #5) --------------------------------

def _tiny_state():
    import optax
    from embeddingnet_tpu.models import EmbeddingModule
    from embeddingnet_tpu.train import TrainState

    module = EmbeddingModule(backbone_name="simple2", encodings_len=16,
                             embeddings_normalization=True,
                             dtype=jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((2, 32, 32, 3), jnp.float32),
                            train=False)
    return TrainState.create(variables, optax.adam(1e-3),
                             rng=jax.random.PRNGKey(1))


def test_packer_passes_through_mismatched_dtype_subtree():
    from embeddingnet_tpu.train.packing import StatePacker

    state = _tiny_state()
    adam = state.opt_state[0]
    bf16_mu = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), adam.mu)
    state = state.replace(
        opt_state=(adam._replace(mu=bf16_mu),) + tuple(state.opt_state[1:]))

    packer = StatePacker(state)
    packed = packer.pack_state(state)
    # nu (f32, params-shaped) is packed into the flat-buffer form; the
    # bf16 mu passes through as the original (flat-free) params tree
    assert "flat" in packed.opt_state[0].nu
    assert "flat" not in packed.opt_state[0].mu
    leaf = jax.tree_util.tree_leaves(packed.opt_state[0].mu)[0]
    assert leaf.dtype == jnp.bfloat16

    restored = packer.unpack_state(packed)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_packer_roundtrip_still_exact_on_normal_state():
    from embeddingnet_tpu.train.packing import StatePacker

    state = _tiny_state()
    packer = StatePacker(state)
    restored = packer.unpack_state(packer.pack_state(state))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -- 3. sync_headline robustness (ADVICE r4 #2) -------------------------------

def _load_sync_headline():
    path = os.path.join(os.path.dirname(__file__), os.pardir, "tools",
                        "sync_headline.py")
    spec = importlib.util.spec_from_file_location("sync_headline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sync_headline_handles_missing_vs_fields(tmp_path, monkeypatch):
    sh = _load_sync_headline()
    readme = tmp_path / "README.md"
    readme.write_text("intro\n" + sh.BEGIN + " -->\nold\n" + sh.END
                      + "\noutro\n")
    artifact = tmp_path / "BENCH_r99.json"
    artifact.write_text(json.dumps(
        {"parsed": {"value": 12345.6}}))  # no vs_baseline / vs_gen / aug
    monkeypatch.setattr(sh, "ROOT", str(tmp_path))
    monkeypatch.setattr("sys.argv", ["sync_headline.py", str(artifact)])
    sh.main()  # must not raise
    text = readme.read_text()
    assert "12,346" in text
    assert "(\n" not in text.split(sh.BEGIN)[1].split(sh.END)[0]
    assert "outro" in text


def test_batch_all_rowblock_cliff_warns_at_scale():
    """VERDICT r4 weak #2: large general-label batch-all must warn loudly
    that it landed on the 26x rowblock-sort path. Trace-time only
    (eval_shape) — no compile, no compute."""
    import warnings
    from embeddingnet_tpu.ops.mining import batch_all_loss

    emb = jax.ShapeDtypeStruct((2048, 64), jnp.float32)
    labels = jax.ShapeDtypeStruct((2048,), jnp.int32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        jax.eval_shape(lambda e, l: batch_all_loss(e, l), emb, labels)
    assert any("rowblock-sort path" in str(x.message) for x in w)

    # grouped P-K path (max_positives set) must NOT warn
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        jax.eval_shape(
            lambda e, l: batch_all_loss(e, l, max_positives=3), emb, labels)
    assert not any("rowblock" in str(x.message) for x in w)
