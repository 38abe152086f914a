"""Distributed-without-a-cluster tests: 8-device virtual CPU mesh.

Sharded mining must be bitwise-comparable to the single-device path
(SURVEY.md §4) and the sharded train step must run a real update.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingnet_tpu.ops import mining
from embeddingnet_tpu.parallel import (build_mesh, batch_sharding,
                                       shard_train_step,
                                       sharded_batch_all_loss)
from embeddingnet_tpu.parallel.sharded import sharded_batch_hard_loss


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return build_mesh(data=8, model=1)


def make_batch(k_classes=8, k_samples=8, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    labels = np.repeat(np.arange(k_classes), k_samples).astype(np.int32)
    centers = rng.normal(size=(k_classes, dim)) * 2
    emb = (centers[labels]
           + rng.normal(size=(len(labels), dim)) * 0.5).astype(np.float32)
    return jnp.array(emb), jnp.array(labels)


def test_mesh_shapes(mesh):
    assert mesh.shape == {"data": 8, "model": 1}


def test_sharded_batch_all_matches_single_device(mesh):
    emb, labels = make_batch()
    fn = jax.jit(sharded_batch_all_loss(mesh, margin=0.5))
    loss_sharded, stats_sharded = fn(emb, labels)
    loss_single, stats_single = mining.batch_all_loss(emb, labels,
                                                      margin=0.5)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)
    assert int(stats_sharded.n_triplets) == int(stats_single.n_triplets)
    assert int(stats_sharded.n_candidates) == int(stats_single.n_candidates)
    np.testing.assert_allclose(float(stats_sharded.mean_pos_dist),
                               float(stats_single.mean_pos_dist), rtol=1e-5)


def test_sharded_batch_all_gradients_match(mesh):
    emb, labels = make_batch(k_classes=4, k_samples=4, dim=8)
    fn = sharded_batch_all_loss(mesh, margin=0.5)
    g_sharded = jax.grad(lambda e: fn(e, labels)[0])(emb)
    g_single = jax.grad(
        lambda e: mining.batch_all_loss(e, labels, margin=0.5)[0])(emb)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-4, atol=1e-6)


def test_sharded_batch_hard_matches_single_device(mesh):
    emb, labels = make_batch(seed=3)
    fn = jax.jit(sharded_batch_hard_loss(mesh, margin=0.5))
    loss_sharded = fn(emb, labels)
    loss_single, _ = mining.batch_hard_loss(emb, labels, margin=0.5)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)


def test_sharded_train_step_runs_and_matches_semantics(mesh):
    """Full GSPMD train step on the mesh: one update step, loss finite,
    params actually move, batch physically sharded."""
    import optax
    from embeddingnet_tpu.models import EmbeddingModule
    from embeddingnet_tpu.train import TrainState
    from embeddingnet_tpu.train.steps import make_triplet_train_step

    module = EmbeddingModule(backbone_name="simple2", encodings_len=16)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((8, 32, 32, 3), jnp.float32)
    variables = module.init({"params": rng, "dropout": rng}, dummy,
                            train=False, method="init_all")
    opt = optax.adam(1e-3)
    state = TrainState.create(variables, opt)

    step = make_triplet_train_step(module, opt, margin=0.5, mode="batch_all")
    sharded_step = shard_train_step(step, mesh, donate=False)

    rng_np = np.random.default_rng(0)
    images = jnp.array(rng_np.integers(0, 255, (16, 32, 32, 3)), jnp.uint8)
    labels = jnp.array(np.repeat(np.arange(8), 2), jnp.int32)
    images = jax.device_put(images, batch_sharding(mesh))
    labels = jax.device_put(labels, batch_sharding(mesh))

    new_state, metrics = sharded_step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    before = jax.tree_util.tree_leaves(state.params)[0]
    after = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_batch_sharding_places_shards(mesh):
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_uneven_mesh_raises():
    with pytest.raises(ValueError):
        build_mesh(data=-1, model=3)  # 8 % 3 != 0


@pytest.mark.slow  # 40-140s compile on the quick-loop box; full suite only
def test_trainer_with_mesh_config(tmp_path, tiny_dataset):
    """Trainer end-to-end with MESH.data=8: batches sharded over the
    virtual mesh, GSPMD train step."""
    from embeddingnet_tpu.config import params_from_dict
    from embeddingnet_tpu.data import ENDataLoader
    from embeddingnet_tpu.train import Trainer

    params = params_from_dict({
        "MODEL": {"input_shape": [32, 32, 3], "encodings_len": 16,
                  "mode": "triplet", "backbone_name": "simple2",
                  "backbone_weights": None},
        "DATALOADER": {"dataset_path": tiny_dataset, "validate": True,
                       "val_ratio": 0.2},
        "GENERATOR": {"negatives_selection_mode": "batch_all",
                      "k_classes": 4, "k_samples": 4, "margin": 0.5,
                      "batch_size": 16, "n_batches": 2, "n_batches_val": 1},
        "TRAIN": {"optimizer": "adam", "learning_rate": 0.001,
                  "n_epochs": 1, "plot_history": False},
        "GENERAL": {"project_name": "mesh_proj",
                    "work_dir": str(tmp_path / "wd")},
        "MESH": {"data": 8, "model": 1},
        "PERFORMANCE": {"compute_dtype": "float32"},
    })
    loader = ENDataLoader(tiny_dataset, validate=True, val_ratio=0.2)
    trainer = Trainer(params, loader, log_fn=lambda *a: None)
    assert trainer.mesh is not None
    assert trainer.mesh.shape == {"data": 8, "model": 1}
    history = trainer.fit(n_epochs=1)
    assert np.isfinite(history.history["loss"]).all()


def test_sharded_batch_all_pk_matches_single_device(mesh):
    """max_positives (grouped P-K) path: value + gradient parity with the
    single-device miner across the 8-device mesh."""
    emb, labels = make_batch(k_classes=16, k_samples=4)  # 8 rows/shard
    fn = jax.jit(sharded_batch_all_loss(mesh, margin=0.5, max_positives=3))
    loss_sharded, stats_sharded = fn(emb, labels)
    loss_single, stats_single = mining.batch_all_loss(emb, labels,
                                                      margin=0.5)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)
    assert int(stats_sharded.n_triplets) == int(stats_single.n_triplets)

    fn2 = sharded_batch_all_loss(mesh, margin=0.5, max_positives=3)
    g_sharded = jax.grad(lambda e: fn2(e, labels)[0])(emb)
    g_single = jax.grad(
        lambda e: mining.batch_all_loss(e, labels, margin=0.5)[0])(emb)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-4, atol=1e-6)


def test_sharded_batch_all_pk_poisons_on_ungrouped(mesh):
    """Shuffled (non-grouped) labels: the psum'd predicate NaN-poisons
    the loss on every shard (r4 — max_positives asserts the layout; the
    former per-shard lax.cond fallback was a fusion barrier)."""
    emb, labels = make_batch(k_classes=16, k_samples=4)
    perm = np.random.default_rng(3).permutation(len(labels))
    emb = emb[perm]
    labels = labels[perm]
    fn = jax.jit(sharded_batch_all_loss(mesh, margin=0.5, max_positives=3))
    loss_sharded, stats = fn(emb, labels)
    assert np.isnan(float(loss_sharded))
    # Sentinel convention mirrors the single-device path (r5, ADVICE r4):
    # integer counts -> -1, float stats -> NaN (ops/mining.py:329).
    assert float(stats.n_triplets) == -1.0
    assert float(stats.n_candidates) == -1.0
    assert np.isnan(float(stats.frac_mined))
    assert np.isnan(float(stats.mean_pos_dist))


def test_sharded_knn_matches_single_device(mesh):
    """DB sharded over 8 devices: predictions, distances and neighbor ids
    all equal the single-device kNN ops."""
    from embeddingnet_tpu.ops import knn as knn_ops
    from embeddingnet_tpu.parallel import sharded_knn

    rng = np.random.default_rng(0)
    n, d, q, k, n_classes = 256, 16, 10, 5, 12
    db = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, n_classes, n), jnp.int32)
    queries = jnp.asarray(rng.normal(size=(q, d)), jnp.float32)

    fn = jax.jit(sharded_knn(mesh, k=k, n_classes=n_classes))
    pred_s, dist_s, idx_s = fn(db, labels, queries)

    pred_1, _ = knn_ops.knn_classify(db, labels, queries, k=k,
                                     n_classes=n_classes)
    dist_1, idx_1 = knn_ops.knn_neighbors(db, queries, k=k)
    np.testing.assert_array_equal(np.asarray(pred_s), np.asarray(pred_1))
    np.testing.assert_allclose(np.asarray(dist_s), np.asarray(dist_1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_1))


def test_sharded_knn_quantized_agrees(mesh):
    """Int8 sharded DB: predictions match the single-device quantized kNN
    and mostly agree with float (quantization tolerance)."""
    from embeddingnet_tpu.ops import knn as knn_ops
    from embeddingnet_tpu.parallel import sharded_knn_quantized

    rng = np.random.default_rng(1)
    n, d, q, k, n_classes = 256, 16, 16, 3, 8
    db = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, n_classes, n), jnp.int32)
    queries = jnp.asarray(rng.normal(size=(q, d)), jnp.float32)
    values, scales = knn_ops.quantize_db(db)

    fn = jax.jit(sharded_knn_quantized(mesh, k=k, n_classes=n_classes))
    pred_s, _dist, _idx = fn(values, scales, labels, queries)
    pred_1, _ = knn_ops.knn_classify_quantized(
        values, scales, labels, queries, k=k, n_classes=n_classes)
    np.testing.assert_array_equal(np.asarray(pred_s), np.asarray(pred_1))


@pytest.mark.parametrize("mode", ["semihard", "hardest", "random_hard"])
def test_gspmd_parity_mode_mining_matches_single_device(mesh, mode):
    """Parity-mode mining under plain GSPMD (VERDICT r3 weak #8): the
    Trainer runs semihard/hardest/random_hard on >1-device meshes as an
    ordinary jitted program over sharded batch inputs (train/loop.py
    _build_steps — no shard_map). Same loss, stats, and embedding
    gradient as the single-device miner, sharded inputs or not."""
    emb, labels = make_batch(k_classes=16, k_samples=4)
    rng = jax.random.PRNGKey(11)

    def loss_fn(e, lab):
        loss, stats = mining.mined_triplet_loss(
            e, lab, margin=0.5, mode=mode, rng=rng, max_positives=3)
        return loss, stats

    (l1, st1), g1 = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(emb, labels)
    emb_s = jax.device_put(emb, batch_sharding(mesh))
    lab_s = jax.device_put(labels, batch_sharding(mesh))
    (l2, st2), g2 = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(emb_s, lab_s)
    assert len(emb_s.sharding.device_set) == 8

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    assert int(st1.n_triplets) == int(st2.n_triplets)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-7)


def test_gspmd_semihard_train_step_matches_single_device(mesh):
    """Full semihard train step under GSPMD vs single-device: mining
    decisions (triplet count, mined fraction) and loss must agree
    exactly/tightly; parameter updates agree to the conv/BN
    reduction-order noise floor (global-batch BN statistics psum in a
    different order on the mesh — measured ~1e-3 after one SGD(0.1)
    step, and present for deterministic batch_all too, so it is network
    numerics, not a mining divergence)."""
    import optax
    from embeddingnet_tpu.models import EmbeddingModule
    from embeddingnet_tpu.train import TrainState
    from embeddingnet_tpu.train.steps import make_triplet_train_step

    module = EmbeddingModule(backbone_name="simple2", encodings_len=16)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((8, 32, 32, 3), jnp.float32)
    variables = module.init({"params": rng, "dropout": rng}, dummy,
                            train=False, method="init_all")
    opt = optax.sgd(0.1)

    # grouped P-K batch (8 classes x 4) — the asserted-layout miner path
    step = make_triplet_train_step(module, opt, margin=0.5, mode="semihard",
                                   max_positives=3)
    rng_np = np.random.default_rng(0)
    images = jnp.array(rng_np.integers(0, 255, (32, 32, 32, 3)), jnp.uint8)
    labels = jnp.array(np.repeat(np.arange(8), 4), jnp.int32)

    s1, m1 = jax.jit(step)(
        TrainState.create(variables, opt, rng=jax.random.PRNGKey(7)),
        images, labels)

    sharded_step = shard_train_step(step, mesh, donate=False)
    s2, m2 = sharded_step(
        TrainState.create(variables, opt, rng=jax.random.PRNGKey(7)),
        jax.device_put(images, batch_sharding(mesh)),
        jax.device_put(labels, batch_sharding(mesh)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    assert float(m1["n_triplets"]) == float(m2["n_triplets"])
    np.testing.assert_allclose(float(m1["frac_mined"]),
                               float(m2["frac_mined"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)
