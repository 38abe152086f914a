"""Tensor-parallel (model-axis) sharding tests — parallel/tp.py.

Runs on the conftest's virtual 8-device CPU mesh: a (data=2, model=4)
mesh trains a tiny ViT with Megatron-style param sharding and must match
the single-device step exactly; unmatched models degrade to replicated
(TP is a safe no-op).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from embeddingnet_tpu.models.vit import ViT
from embeddingnet_tpu.parallel import build_mesh, batch_sharding
from embeddingnet_tpu.parallel.tp import (spec_for_path, tp_shardings,
                                          shard_train_step_tp)
from embeddingnet_tpu.train import TrainState
from embeddingnet_tpu.train.steps import make_triplet_train_step

from jax.sharding import PartitionSpec as P


class TinyViTEncoder(nn.Module):
    """ViT grid -> mean pool -> Dense embedding (test-sized)."""

    dim: int = 32
    heads: int = 4
    out: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = ViT(patch=8, dim=self.dim, depth=2, heads=self.heads,
                name="vit")(x, train=train)
        return nn.Dense(self.out, name="head")(jnp.mean(g, axis=(1, 2)))


def test_spec_for_path_rules():
    assert spec_for_path(("a", "mlp", "fc1", "kernel"), 2) == \
        P(None, "model")
    assert spec_for_path(("b", "mlp", "fc2", "kernel"), 2) == \
        P("model", None)
    assert spec_for_path(("attn", "query", "kernel"), 3) == \
        P(None, "model", None)
    assert spec_for_path(("attn", "out", "kernel"), 3) == \
        P("model", None, None)
    assert spec_for_path(("class_weights",), 2) == P("model", None)
    # adam mu/nu mirror the param tree under a different prefix
    assert spec_for_path(
        ("opt_state", "0", "mu", "block1", "mlp", "fc1", "kernel"), 2) == \
        P(None, "model")
    # unknown leaves and rank mismatches stay replicated
    assert spec_for_path(("stem_conv", "kernel"), 4) == P()
    assert spec_for_path(("class_weights",), 1) == P()


def _make_state_and_step():
    module = TinyViTEncoder()
    rng = jax.random.PRNGKey(0)
    variables = module.init({"params": rng},
                            jnp.zeros((2, 16, 16, 3), jnp.float32),
                            train=False)
    optimizer = optax.adam(1e-2)
    state = TrainState.create(variables, optimizer,
                              rng=jax.random.PRNGKey(1))
    step = make_triplet_train_step(module, optimizer, margin=0.5,
                                   mode="batch_all")
    return state, step


def test_tp_step_matches_single_device():
    mesh = build_mesh(data=2, model=4)
    state, step = _make_state_and_step()

    rs = np.random.default_rng(0)
    images = jnp.asarray(rs.integers(0, 255, (8, 16, 16, 3)), jnp.uint8)
    labels = jnp.asarray(np.repeat(np.arange(4), 2), jnp.int32)

    ref_state, ref_metrics = jax.jit(step)(state, images, labels)

    tp_step = shard_train_step_tp(step, mesh, state, donate=False)
    new_state, metrics = tp_step(
        state,
        jax.device_put(images, batch_sharding(mesh)),
        jax.device_put(labels, batch_sharding(mesh)))

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    # parameters really are model-sharded, and training matches exactly
    fc1 = new_state.params["vit"]["block1"]["mlp"]["fc1"]["kernel"]
    assert fc1.sharding.spec == P(None, "model")
    qk = new_state.params["vit"]["block1"]["attn"]["query"]["kernel"]
    assert qk.sharding.spec == P(None, "model", None)
    np.testing.assert_allclose(
        np.asarray(fc1),
        np.asarray(ref_state.params["vit"]["block1"]["mlp"]["fc1"]["kernel"]),
        atol=2e-6)
    # adam state follows the same specs (suffix rules see through 'mu')
    mu = jax.tree_util.tree_leaves_with_path(new_state.opt_state)
    assert any(
        getattr(leaf, "sharding", None) is not None
        and getattr(leaf.sharding, "spec", P()) == P(None, "model")
        for _, leaf in mu)


def test_tp_shardings_safe_noop_for_convs():
    """A model with no matching rule (CNN) gets fully replicated specs —
    MESH.model > 1 never breaks a config."""
    from embeddingnet_tpu.models import EmbeddingModule
    mesh = build_mesh(data=4, model=2)
    m = EmbeddingModule(backbone_name="simple2", encodings_len=16)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout":
                jax.random.PRNGKey(1)},
               jnp.zeros((1, 32, 32, 3)), train=False)
    shards = tp_shardings(v, mesh)
    for leaf in jax.tree_util.tree_leaves(shards):
        assert leaf.spec == P()


@pytest.mark.slow  # 40-140s compile on the quick-loop box; full suite only
def test_trainer_runs_with_model_axis(tmp_path, tiny_dataset):
    """Trainer wiring: MESH.model=2 trains a CNN config end to end (TP
    rules match nothing -> replicated), proving the config path."""
    from embeddingnet_tpu.data import ENDataLoader
    from embeddingnet_tpu.train import Trainer
    from test_train_loop import make_params

    params = make_params(tmp_path, tiny_dataset,
                         extra_gen={"k_classes": 4, "k_samples": 2,
                                    "batch_size": 8})
    params.mesh.data = 2
    params.mesh.model = 2
    loader = ENDataLoader(tiny_dataset, validate=True, val_ratio=0.2)
    trainer = Trainer(params, loader, log_fn=lambda *a: None)
    history = trainer.fit(n_epochs=1)
    assert np.isfinite(history.history["loss"]).all()
