"""Distance-kernel tests vs scipy/sklearn oracles (the reference's metric
source, ``embedding_net/datagenerators.py:219``)."""

import numpy as np
import jax.numpy as jnp
from sklearn.metrics import pairwise_distances

from embeddingnet_tpu.ops import distances


def test_pairwise_l2_matches_sklearn(rng_np):
    a = rng_np.normal(size=(32, 64)).astype(np.float32)
    got = distances.pairwise_l2(jnp.array(a))
    expected = pairwise_distances(a)  # sklearn default = euclidean
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4,
                               atol=1e-4)


def test_pairwise_l2_rectangular(rng_np):
    a = rng_np.normal(size=(8, 16)).astype(np.float32)
    b = rng_np.normal(size=(12, 16)).astype(np.float32)
    got = distances.pairwise_l2(jnp.array(a), jnp.array(b))
    expected = pairwise_distances(a, b)
    assert got.shape == (8, 12)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4,
                               atol=1e-4)


def test_sq_l2_nonnegative_and_zero_diag(rng_np):
    a = rng_np.normal(size=(16, 8)).astype(np.float32) * 100
    d2 = np.asarray(distances.pairwise_sq_l2(jnp.array(a)))
    assert (d2 >= 0).all()
    np.testing.assert_allclose(np.diag(d2), 0.0, atol=1e-2)


def test_pairwise_l1(rng_np):
    a = rng_np.normal(size=(10, 8)).astype(np.float32)
    got = distances.pairwise_l1(jnp.array(a))
    expected = pairwise_distances(a, metric="manhattan")
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5,
                               atol=1e-5)


def test_pairwise_cosine(rng_np):
    a = rng_np.normal(size=(10, 8)).astype(np.float32)
    got = distances.pairwise_cosine(jnp.array(a))
    expected = pairwise_distances(a, metric="cosine")
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4,
                               atol=1e-5)


def test_bfloat16_inputs_return_float32(rng_np):
    a = jnp.array(rng_np.normal(size=(8, 8)), dtype=jnp.bfloat16)
    d = distances.pairwise_sq_l2(a)
    assert d.dtype == jnp.float32
