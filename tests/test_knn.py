"""kNN op tests vs sklearn KNeighborsClassifier (the reference's engine,
``embedding_net/models.py:128-142``)."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.neighbors import KNeighborsClassifier

from embeddingnet_tpu.ops import knn


@pytest.fixture
def db(rng_np):
    n_classes, per_class, dim = 5, 20, 16
    centers = rng_np.normal(size=(n_classes, dim)) * 3
    labels = np.repeat(np.arange(n_classes), per_class)
    emb = centers[labels] + rng_np.normal(size=(len(labels), dim)) * 0.3
    return emb.astype(np.float32), labels.astype(np.int32)


@pytest.mark.parametrize("k", [1, 3, 5])
def test_knn_matches_sklearn(db, rng_np, k):
    emb, labels = db
    queries = emb[::7] + rng_np.normal(size=emb[::7].shape).astype(
        np.float32) * 0.1
    sk = KNeighborsClassifier(n_neighbors=k).fit(emb, labels)
    expected = sk.predict(queries)
    got, _ = knn.knn_classify(jnp.array(emb), jnp.array(labels),
                              jnp.array(queries), k=k, n_classes=5)
    # Allow disagreement only where sklearn itself had a tie
    agree = np.mean(np.asarray(got) == expected)
    assert agree >= 0.95


def test_knn_neighbors_matches_sklearn(db):
    emb, labels = db
    queries = emb[:10]
    sk = KNeighborsClassifier(n_neighbors=5).fit(emb, labels)
    dist_sk, idx_sk = sk.kneighbors(queries, n_neighbors=5)
    dist, idx = knn.knn_neighbors(jnp.array(emb), jnp.array(queries), k=5)
    # |a|^2+|b|^2-2ab cancellation leaves ~6e-3 noise on exact-zero
    # self-distances (query == DB row); ranking is unaffected.
    np.testing.assert_allclose(np.asarray(dist), dist_sk, atol=1e-2)
    np.testing.assert_array_equal(np.sort(np.asarray(idx), axis=1),
                                  np.sort(idx_sk, axis=1))


def test_class_centers(db):
    emb, labels = db
    centers = np.asarray(knn.class_centers(jnp.array(emb),
                                           jnp.array(labels), 5))
    for c in range(5):
        np.testing.assert_allclose(centers[c], emb[labels == c].mean(0),
                                   atol=1e-4)


def test_knn_self_query_returns_self(db):
    emb, labels = db
    got, idx = knn.knn_classify(jnp.array(emb), jnp.array(labels),
                                jnp.array(emb[:5]), k=1, n_classes=5)
    np.testing.assert_array_equal(np.asarray(got), labels[:5])
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(5))


def test_quantized_knn_matches_float(db):
    emb, labels = db
    values, scales = knn.quantize_db(jnp.array(emb))
    assert values.dtype == jnp.int8
    queries = emb[::5]
    pred_f, _ = knn.knn_classify(jnp.array(emb), jnp.array(labels),
                                 jnp.array(queries), k=3, n_classes=5)
    pred_q, _ = knn.knn_classify_quantized(values, scales,
                                           jnp.array(labels),
                                           jnp.array(queries), k=3,
                                           n_classes=5)
    # int8 rounding may flip ties; vast agreement required
    agree = np.mean(np.asarray(pred_f) == np.asarray(pred_q))
    assert agree >= 0.95


def test_quantize_roundtrip_error(db):
    emb, _ = db
    values, scales = knn.quantize_db(jnp.array(emb))
    recon = np.asarray(values, np.float32) * np.asarray(scales)[:, None]
    rel = np.abs(recon - emb).max() / np.abs(emb).max()
    assert rel < 0.01  # int8 symmetric: <1% of row absmax
