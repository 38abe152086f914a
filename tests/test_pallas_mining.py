"""Pallas fused-mining kernel vs the jnp reference (interpret mode on CPU;
the same kernel compiles on real TPU — exercised by bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingnet_tpu.ops import mining
from embeddingnet_tpu.ops.pallas.mining_kernel import (
    fused_hard_indices, pallas_batch_hard_loss)


def make_batch(k_classes=16, k_samples=8, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    labels = np.repeat(np.arange(k_classes), k_samples).astype(np.int32)
    centers = rng.normal(size=(k_classes, dim)) * 2
    emb = (centers[labels]
           + rng.normal(size=(len(labels), dim)) * 0.5).astype(np.float32)
    return jnp.array(emb), jnp.array(labels)


@pytest.mark.parametrize("tile", [32, 64, 128])
def test_fused_indices_match_dense(tile):
    emb, labels = make_batch()
    hp_val, hp_idx, hn_val, hn_idx = fused_hard_indices(
        emb, labels, tile_a=tile, tile_n=tile, interpret=True)

    from embeddingnet_tpu.ops.distances import pairwise_sq_l2
    sq = np.asarray(pairwise_sq_l2(emb))
    lab = np.asarray(labels)
    b = len(lab)
    same = lab[:, None] == lab[None, :]
    np.fill_diagonal(same, False)
    pos = np.where(same, sq, -np.inf)
    neg = np.where(lab[:, None] != lab[None, :], sq, np.inf)

    np.testing.assert_allclose(np.asarray(hp_val), pos.max(1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hn_val), neg.min(1), rtol=1e-5)
    # indices achieve the same value (ties may pick another argmax)
    np.testing.assert_allclose(
        sq[np.arange(b), np.asarray(hp_idx)], pos.max(1), rtol=1e-5)
    np.testing.assert_allclose(
        sq[np.arange(b), np.asarray(hn_idx)], neg.min(1), rtol=1e-5)


def test_pallas_loss_matches_jnp():
    emb, labels = make_batch(seed=2)
    loss_pl = pallas_batch_hard_loss(emb, labels, margin=0.5, tile_a=64,
                                     tile_n=64, interpret=True)
    loss_jnp, _ = mining.batch_hard_loss(emb, labels, margin=0.5)
    np.testing.assert_allclose(float(loss_pl), float(loss_jnp), rtol=1e-5)


def test_pallas_loss_gradients_match_jnp():
    emb, labels = make_batch(k_classes=8, k_samples=4, dim=16, seed=3)
    g_pl = jax.grad(lambda e: pallas_batch_hard_loss(
        e, labels, margin=0.5, tile_a=32, tile_n=32, interpret=True))(emb)
    g_jnp = jax.grad(
        lambda e: mining.batch_hard_loss(e, labels, margin=0.5)[0])(emb)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_jnp),
                               rtol=1e-4, atol=1e-6)


def test_indivisible_batch_raises():
    emb, labels = make_batch(k_classes=5, k_samples=5)  # B=25
    with pytest.raises(ValueError, match="not divisible"):
        fused_hard_indices(emb, labels, tile_a=16, tile_n=16,
                           interpret=True)


def test_single_tile_batch_works():
    """tile > B clamps to one tile."""
    emb, labels = make_batch(k_classes=5, k_samples=5)  # B=25
    hp_val, _, hn_val, _ = fused_hard_indices(emb, labels, tile_a=512,
                                              tile_n=512, interpret=True)
    assert hp_val.shape == (25,)
    assert np.isfinite(np.asarray(hp_val)).all()
