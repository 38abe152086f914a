"""Loss-function unit tests vs numpy oracles replicating
``embedding_net/losses_and_accuracies.py`` formulas."""

import numpy as np
import jax.numpy as jnp

from embeddingnet_tpu.ops import losses


def np_contrastive(y_true, y_pred, margin=1.0):
    # oracle for losses_and_accuracies.py:4-11
    return np.mean(y_true * y_pred ** 2
                   + (1 - y_true) * np.maximum(margin - y_pred, 0) ** 2)


def np_triplet(merged, margin):
    # oracle for losses_and_accuracies.py:26-42
    third = merged.shape[-1] // 3
    a, p, n = merged[:, :third], merged[:, third:2 * third], merged[:, 2 * third:]
    pos = np.sum((a - p) ** 2, axis=1)
    neg = np.sum((a - n) ** 2, axis=1)
    return np.maximum(pos - neg + margin, 0.0)


def test_contrastive_matches_oracle(rng_np):
    y_true = rng_np.integers(0, 2, size=64).astype(np.float32)
    y_pred = rng_np.uniform(0, 2, size=64).astype(np.float32)
    got = losses.contrastive_loss(jnp.array(y_true), jnp.array(y_pred))
    np.testing.assert_allclose(got, np_contrastive(y_true, y_pred), rtol=1e-6)


def test_contrastive_margin_default_is_one(rng_np):
    y_pred = rng_np.uniform(0, 2, size=16).astype(np.float32)
    zeros = np.zeros(16, np.float32)
    got = losses.contrastive_loss(jnp.array(zeros), jnp.array(y_pred))
    np.testing.assert_allclose(got, np_contrastive(zeros, y_pred, 1.0),
                               rtol=1e-6)


def test_triplet_loss_per_sample_no_mean(rng_np):
    merged = rng_np.normal(size=(8, 3 * 32)).astype(np.float32)
    for margin in (0.2, 0.5, 1.0):
        got = losses.triplet_loss(margin)(jnp.array(merged))
        assert got.shape == (8,)  # per-sample, no reduction (ref line 42)
        np.testing.assert_allclose(got, np_triplet(merged, margin),
                                   rtol=5e-5, atol=1e-5)


def test_triplet_hinge_matches_concat_form(rng_np):
    a = rng_np.normal(size=(8, 32)).astype(np.float32)
    p = rng_np.normal(size=(8, 32)).astype(np.float32)
    n = rng_np.normal(size=(8, 32)).astype(np.float32)
    merged = np.concatenate([a, p, n], axis=-1)
    np.testing.assert_allclose(
        losses.triplet_hinge(jnp.array(a), jnp.array(p), jnp.array(n), 0.5),
        losses.triplet_loss(0.5)(jnp.array(merged)), rtol=1e-5, atol=1e-6)


def test_accuracy_threshold(rng_np):
    # oracle for losses_and_accuracies.py:47-50: mean(y == (d < 0.5))
    y_true = rng_np.integers(0, 2, size=100).astype(np.float32)
    y_pred = rng_np.uniform(0, 1, size=100).astype(np.float32)
    expected = np.mean(y_true == (y_pred < 0.5).astype(np.float32))
    got = losses.accuracy(jnp.array(y_true), jnp.array(y_pred))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_softmax_cross_entropy(rng_np):
    logits = rng_np.normal(size=(16, 10)).astype(np.float32)
    labels = rng_np.integers(0, 10, size=16)
    onehot = np.eye(10, dtype=np.float32)[labels]
    # stable numpy oracle
    z = logits - logits.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    expected = -np.mean((onehot * logp).sum(axis=1))
    got = losses.softmax_cross_entropy(jnp.array(logits), jnp.array(onehot))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_arcface_reduces_target_logit(rng_np):
    emb = rng_np.normal(size=(8, 16)).astype(np.float32)
    labels = rng_np.integers(0, 4, size=8)
    weights = rng_np.normal(size=(4, 16)).astype(np.float32)
    with_margin = losses.arcface_loss(jnp.array(emb), jnp.array(labels),
                                      jnp.array(weights), margin=0.5)
    without = losses.arcface_loss(jnp.array(emb), jnp.array(labels),
                                  jnp.array(weights), margin=0.0)
    # adding angular margin can only make the target logit smaller -> loss up
    assert float(with_margin) > float(without)
