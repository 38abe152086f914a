"""Mining-engine tests vs a numpy oracle replicating the reference's
host-side mining loop (``embedding_net/datagenerators.py:188-258``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embeddingnet_tpu.ops import mining


def make_batch(rng_np, k_classes=4, k_samples=4, dim=16):
    """P-K batch like the reference sampler (datagenerators.py:202-205)."""
    labels = np.repeat(np.arange(k_classes), k_samples)
    # cluster structure so mining finds structure
    centers = rng_np.normal(size=(k_classes, dim)) * 2.0
    emb = centers[labels] + rng_np.normal(size=(len(labels), dim)) * 0.5
    return emb.astype(np.float32), labels.astype(np.int32)


def oracle_mine(emb, labels, margin, mode, seed=0):
    """Numpy oracle of datagenerators.py:201-258 given precomputed embeddings.

    Returns (set of (a, p) selected pairs, dict pair -> candidate negative
    index set, loss of the 'hardest' deterministic choice).
    """
    from itertools import combinations
    from sklearn.metrics import pairwise_distances

    dist = pairwise_distances(emb)
    b = len(labels)
    selected = {}
    for a, p in combinations(range(b), 2):
        if labels[a] != labels[p]:
            continue
        negs = np.where(labels != labels[a])[0]
        loss_values = dist[a, p] - dist[a, negs] + margin
        if mode == "hardest":
            i = np.argmax(loss_values)
            cand = [negs[i]] if loss_values[i] > 0 else []
        elif mode == "random_hard":
            cand = list(negs[np.where(loss_values > 0)[0]])
        elif mode == "semihard":
            cand = list(negs[np.where((loss_values > 0)
                                      & (loss_values < margin))[0]])
        if cand:
            selected[(a, p)] = set(cand)
    return selected


def sq_hinge(emb, a, p, n, margin):
    d_ap = np.sum((emb[a] - emb[p]) ** 2)
    d_an = np.sum((emb[a] - emb[n]) ** 2)
    return max(d_ap - d_an + margin, 0.0)


@pytest.mark.parametrize("margin", [0.3, 0.5, 1.0])
def test_hardest_matches_oracle(rng_np, margin):
    emb, labels = make_batch(rng_np)
    oracle = oracle_mine(emb, labels, margin, "hardest")
    loss, stats = mining.mined_triplet_loss(
        jnp.array(emb), jnp.array(labels), margin=margin, mode="hardest",
        rng=jax.random.PRNGKey(0))
    expected = [sq_hinge(emb, a, p, next(iter(ns)), margin)
                for (a, p), ns in oracle.items()]
    expected_loss = np.mean(expected) if expected else 0.0
    np.testing.assert_allclose(float(loss), expected_loss, rtol=1e-4)
    assert int(stats.n_triplets) == len(oracle)


@pytest.mark.parametrize("mode", ["random_hard", "semihard"])
def test_stochastic_modes_select_within_candidate_set(rng_np, mode):
    emb, labels = make_batch(rng_np, k_classes=3, k_samples=3)
    margin = 0.5
    oracle = oracle_mine(emb, labels, margin, mode)
    loss, stats = mining.mined_triplet_loss(
        jnp.array(emb), jnp.array(labels), margin=margin, mode=mode,
        rng=jax.random.PRNGKey(7))
    # same number of mined pairs as the oracle's candidate support
    assert int(stats.n_triplets) == len(oracle)
    # loss must be within [min, max] over possible candidate choices
    if oracle:
        lo = np.mean([min(sq_hinge(emb, a, p, n, margin) for n in ns)
                      for (a, p), ns in oracle.items()])
        hi = np.mean([max(sq_hinge(emb, a, p, n, margin) for n in ns)
                      for (a, p), ns in oracle.items()])
        assert lo - 1e-5 <= float(loss) <= hi + 1e-5


def test_semihard_empty_batch_returns_zero(rng_np):
    # Collapse all embeddings to one point: every d == 0, loss_values ==
    # margin everywhere -> semihard needs 0 < lv < margin -> nothing mined.
    emb = np.zeros((8, 4), np.float32)
    labels = np.repeat(np.arange(2), 4).astype(np.int32)
    loss, stats = mining.mined_triplet_loss(
        jnp.array(emb), jnp.array(labels), margin=0.5, mode="semihard",
        rng=jax.random.PRNGKey(0))
    assert float(loss) == 0.0
    assert int(stats.n_triplets) == 0


def test_batch_hard_oracle(rng_np):
    emb, labels = make_batch(rng_np)
    margin = 0.5
    sq = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    b = len(labels)
    per_anchor = []
    for a in range(b):
        pos = [j for j in range(b) if labels[j] == labels[a] and j != a]
        neg = [j for j in range(b) if labels[j] != labels[a]]
        if not pos or not neg:
            continue
        per_anchor.append(max(sq[a, pos].max() - sq[a, neg].min() + margin, 0))
    expected = np.mean(per_anchor)
    loss, _ = mining.batch_hard_loss(jnp.array(emb), jnp.array(labels),
                                     margin=margin)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


@pytest.mark.parametrize("k_classes,k_samples", [(4, 4), (3, 5), (8, 2)])
def test_batch_all_fast_equals_naive(rng_np, k_classes, k_samples):
    emb, labels = make_batch(rng_np, k_classes, k_samples)
    margin = 0.5
    fast, stats_f = mining.batch_all_loss(jnp.array(emb), jnp.array(labels),
                                          margin=margin)
    naive, stats_n = mining.batch_all_loss_reference(
        jnp.array(emb), jnp.array(labels), margin=margin)
    np.testing.assert_allclose(float(fast), float(naive), rtol=1e-4)
    assert int(stats_f.n_triplets) == int(stats_n.n_triplets)


def test_batch_all_fast_gradients_match_naive(rng_np):
    emb, labels = make_batch(rng_np, 3, 4, dim=8)
    margin = 0.5

    def f_fast(e):
        return mining.batch_all_loss(e, jnp.array(labels), margin=margin)[0]

    def f_naive(e):
        return mining.batch_all_loss_reference(
            e, jnp.array(labels), margin=margin)[0]

    g_fast = jax.grad(f_fast)(jnp.array(emb))
    g_naive = jax.grad(f_naive)(jnp.array(emb))
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_naive),
                               rtol=1e-3, atol=1e-5)


def test_mined_loss_is_jittable(rng_np):
    emb, labels = make_batch(rng_np)
    for mode in mining.ALL_MODES:
        fn = jax.jit(lambda e, l, r, m=mode: mining.mined_triplet_loss(
            e, l, margin=0.5, mode=m, rng=r)[0])
        val = fn(jnp.array(emb), jnp.array(labels), jax.random.PRNGKey(0))
        assert np.isfinite(float(val))


def test_stats_fields(rng_np):
    emb, labels = make_batch(rng_np)
    _, stats = mining.batch_all_loss(jnp.array(emb), jnp.array(labels))
    assert 0.0 <= float(stats.frac_mined) <= 1.0
    assert float(stats.mean_pos_dist) > 0
    assert float(stats.mean_neg_dist) > float(stats.mean_pos_dist) * 0.1


@pytest.mark.parametrize("k_classes,k_samples", [(8, 4), (16, 8), (5, 3)])
def test_batch_all_compressed_matches_full(rng_np, k_classes, k_samples):
    """max_positives (P-K top-k threshold compression) is value- and
    gradient-identical to the full path."""
    emb, labels = make_batch(rng_np, k_classes, k_samples)
    kp = k_samples - 1
    full, sf = mining.batch_all_loss(jnp.array(emb), jnp.array(labels),
                                     margin=0.5)
    comp, sc = mining.batch_all_loss(jnp.array(emb), jnp.array(labels),
                                     margin=0.5, max_positives=kp)
    np.testing.assert_allclose(float(comp), float(full), rtol=1e-5)
    assert int(sc.n_triplets) == int(sf.n_triplets)

    g_full = jax.grad(lambda e: mining.batch_all_loss(
        e, jnp.array(labels), margin=0.5)[0])(jnp.array(emb))
    g_comp = jax.grad(lambda e: mining.batch_all_loss(
        e, jnp.array(labels), margin=0.5,
        max_positives=kp)[0])(jnp.array(emb))
    np.testing.assert_allclose(np.asarray(g_comp), np.asarray(g_full),
                               rtol=1e-4, atol=1e-6)


def test_batch_all_compressed_poisons_on_violation(rng_np):
    """max_positives ASSERTS the grouped P-K layout (parity-mode
    convention, r4): a violating batch NaN-poisons loss/grad/stats
    instead of silently using wrong block-diagonal thresholds. (The
    previous lax.cond fallback cost ~0.8 ms/step at B=1024 — the cond is
    a fusion barrier; the Trainer guards the layout host-side.)"""
    emb, labels = make_batch(rng_np, k_classes=4, k_samples=6)
    # claim max_positives=2 but rows have 5 positives -> poison
    comp, stats = mining.batch_all_loss(jnp.array(emb), jnp.array(labels),
                                        margin=0.5, max_positives=2)
    assert np.isnan(float(comp))
    assert int(stats.n_triplets) == -1
    g = jax.grad(lambda e: mining.batch_all_loss(
        e, jnp.array(labels), margin=0.5, max_positives=2)[0])(
            jnp.array(emb))
    assert np.all(np.isnan(np.asarray(g)))
