"""Production-scale parity mining (VERDICT round-1 #6): the O(B^2 log B)
sorted-window implementation of semihard / hardest / random_hard must
reproduce the [B,B,B] enumeration's selection semantics exactly — checked
against both the small-batch path and the numpy oracle — with an analytic
gradient equal to autodiff of the realized selection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embeddingnet_tpu.ops import mining

from test_mining import make_batch, oracle_mine, sq_hinge


# -- primitives ---------------------------------------------------------------

def test_count_below_inclusive_and_strict(rng_np):
    keys = rng_np.normal(size=(4, 12)).astype(np.float32)
    keys[1, 3] = keys[1, 7] = 0.25  # engineered ties
    queries = np.concatenate(
        [rng_np.normal(size=(4, 5)).astype(np.float32),
         np.full((4, 1), 0.25, np.float32)], axis=1)
    inc = mining._count_below(jnp.array(keys), jnp.array(queries),
                              inclusive=True)
    strict = mining._count_below(jnp.array(keys), jnp.array(queries),
                                 inclusive=False)
    exp_inc = (keys[:, :, None] <= queries[:, None, :]).sum(1)
    exp_strict = (keys[:, :, None] < queries[:, None, :]).sum(1)
    np.testing.assert_array_equal(np.asarray(inc), exp_inc)
    np.testing.assert_array_equal(np.asarray(strict), exp_strict)


def test_fetch_at_rank(rng_np):
    vals = np.sort(rng_np.normal(size=(3, 10)).astype(np.float32), axis=1)
    ids = rng_np.permutation(np.arange(30).reshape(3, 10)).astype(np.int32)
    ranks = rng_np.integers(0, 10, size=(3, 6)).astype(np.float32)
    v, i = mining._fetch_at_rank(jnp.array(vals), jnp.array(ids),
                                 jnp.array(ranks))
    r = ranks.astype(int)
    np.testing.assert_allclose(np.asarray(v),
                               np.take_along_axis(vals, r, axis=1))
    np.testing.assert_array_equal(np.asarray(i),
                                  np.take_along_axis(ids, r, axis=1))


def test_row_histogram(rng_np):
    ids = rng_np.integers(0, 8, size=(5, 20))
    # sentinel 8 = ignored
    ids[0, :4] = 8
    out = mining._row_histogram(jnp.array(ids, jnp.int32), 8)
    exp = np.stack([np.bincount(row[row < 8], minlength=8)
                    for row in ids])
    np.testing.assert_array_equal(np.asarray(out), exp)


# -- hardest: deterministic, must match the cube path exactly ----------------

@pytest.mark.parametrize("margin", [0.3, 0.5, 1.0])
def test_hardest_large_matches_cube(rng_np, margin):
    emb, labels = make_batch(rng_np, k_classes=6, k_samples=4)
    l_small, s_small = mining._parity_mined_loss(
        jnp.array(emb), jnp.array(labels), margin=margin, mode="hardest",
        rng=jax.random.PRNGKey(0))
    l_large, s_large = mining.parity_mined_loss_large(
        jnp.array(emb), jnp.array(labels), margin=margin, mode="hardest",
        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(l_large), float(l_small), rtol=1e-5)
    assert int(s_large.n_triplets) == int(s_small.n_triplets)


def test_hardest_large_gradient_matches_cube_autodiff(rng_np):
    emb, labels = make_batch(rng_np, k_classes=4, k_samples=3, dim=8)
    margin = 0.5
    g_cube = jax.grad(lambda e: mining._parity_mined_loss(
        e, jnp.array(labels), margin=margin, mode="hardest",
        rng=jax.random.PRNGKey(0))[0])(jnp.array(emb))
    g_large = jax.grad(lambda e: mining.parity_mined_loss_large(
        e, jnp.array(labels), margin=margin, mode="hardest",
        rng=jax.random.PRNGKey(0))[0])(jnp.array(emb))
    np.testing.assert_allclose(np.asarray(g_large), np.asarray(g_cube),
                               rtol=1e-3, atol=1e-5)


# -- stochastic modes: selection support + membership + distribution ---------

@pytest.mark.parametrize("mode", ["random_hard", "semihard"])
def test_large_selection_matches_oracle_support(rng_np, mode):
    emb, labels = make_batch(rng_np, k_classes=4, k_samples=4)
    margin = 0.5
    oracle = oracle_mine(emb, labels, margin, mode)
    loss, stats, w, aux = mining._parity_forward_large(
        jnp.array(emb), jnp.array(labels), margin, mode,
        jax.random.PRNGKey(3))
    sel = np.asarray(aux["selected"])
    n_star = np.asarray(aux["n_star"])
    got_pairs = {(a, p) for a, p in zip(*np.nonzero(sel))}
    assert got_pairs == set(oracle.keys())
    # every sampled negative lies in the oracle's candidate set
    for (a, p) in got_pairs:
        assert n_star[a, p] in oracle[(a, p)], (a, p, n_star[a, p])
    # loss within the candidate-choice envelope
    if oracle:
        lo = np.mean([min(sq_hinge(emb, a, p, n, margin) for n in ns)
                      for (a, p), ns in oracle.items()])
        hi = np.mean([max(sq_hinge(emb, a, p, n, margin) for n in ns)
                      for (a, p), ns in oracle.items()])
        assert lo - 1e-5 <= float(loss) <= hi + 1e-5


@pytest.mark.parametrize("mode", ["random_hard", "semihard"])
def test_large_sampling_covers_all_candidates(mode):
    """Uniform-choice parity: over many keys every candidate is hit."""
    margin = 0.5
    multi = []
    for seed in range(20):  # find a draw with a multi-candidate pair
        # unstructured embeddings: clusters overlap -> rich candidate sets
        r = np.random.default_rng(seed)
        emb = r.normal(size=(9, 16)).astype(np.float32) * 0.4
        labels = np.repeat(np.arange(3), 3).astype(np.int32)
        oracle = oracle_mine(emb, labels, margin, mode)
        multi = [(pair, ns) for pair, ns in oracle.items() if len(ns) >= 2]
        if multi:
            break
    assert multi, "no multi-candidate pair found in 20 draws"
    pair, ns = multi[0]
    seen = set()
    fwd = jax.jit(lambda r: mining._parity_forward_large(
        jnp.array(emb), jnp.array(labels), margin, mode, r)[3]["n_star"])
    for s in range(120):
        n_star = np.asarray(fwd(jax.random.PRNGKey(s)))
        seen.add(int(n_star[pair]))
        if seen == ns:
            break
    assert seen == ns


@pytest.mark.parametrize("mode", ["random_hard", "semihard"])
def test_large_gradient_matches_realized_selection(rng_np, mode):
    """Custom VJP == autodiff of the loss reconstructed from the realized
    (selected, n_star) sets at the same rng."""
    emb, labels = make_batch(rng_np, k_classes=4, k_samples=3, dim=8)
    margin = 0.5
    rng = jax.random.PRNGKey(11)
    _, _, _, aux = mining._parity_forward_large(
        jnp.array(emb), jnp.array(labels), margin, mode, rng)
    sel = np.asarray(aux["selected"])
    n_star = np.asarray(aux["n_star"])
    pairs = list(zip(*np.nonzero(sel)))

    def reconstructed(e):
        sq = jnp.sum((e[:, None, :] - e[None, :, :]) ** 2, -1)
        terms = [jnp.maximum(sq[a, p] - sq[a, n_star[a, p]] + margin, 0.0)
                 for (a, p) in pairs]
        return sum(terms) / max(len(pairs), 1)

    g_ref = jax.grad(reconstructed)(jnp.array(emb))
    g_vjp = jax.grad(lambda e: mining.parity_mined_loss_large(
        e, jnp.array(labels), margin=margin, mode=mode,
        rng=rng)[0])(jnp.array(emb))
    np.testing.assert_allclose(np.asarray(g_vjp), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


# -- degenerate batches --------------------------------------------------------

def test_large_semihard_all_collapsed_mines_nothing():
    emb = np.zeros((16, 4), np.float32)
    labels = np.repeat(np.arange(4), 4).astype(np.int32)
    loss, stats = mining.parity_mined_loss_large(
        jnp.array(emb), jnp.array(labels), margin=0.5, mode="semihard",
        rng=jax.random.PRNGKey(0))
    assert float(loss) == 0.0
    assert int(stats.n_triplets) == 0


def test_large_single_class_batch():
    emb = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32)
    labels = np.zeros(8, np.int32)  # no negatives anywhere
    for mode in mining.PARITY_MODES:
        loss, stats = mining.parity_mined_loss_large(
            jnp.array(emb), jnp.array(labels), margin=0.5, mode=mode,
            rng=jax.random.PRNGKey(0))
        assert float(loss) == 0.0
        assert int(stats.n_triplets) == 0


# -- dispatch + scale ----------------------------------------------------------

def test_dispatch_routes_large_batches(rng_np):
    """mined_triplet_loss no longer raises above the cube cap."""
    emb, labels = make_batch(rng_np, k_classes=75, k_samples=4, dim=8)
    assert len(labels) == 300 > mining._PARITY_CUBE_MAX_B
    for mode in mining.PARITY_MODES:
        loss, stats = mining.mined_triplet_loss(
            jnp.array(emb), jnp.array(labels), margin=0.5, mode=mode,
            rng=jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        assert int(stats.n_triplets) > 0


@pytest.mark.slow
def test_large_parity_b1024_jits(rng_np):
    emb, labels = make_batch(rng_np, k_classes=256, k_samples=4, dim=32)
    assert len(labels) == 1024
    for mode in mining.PARITY_MODES:
        g = jax.jit(jax.grad(lambda e: mining.parity_mined_loss_large(
            e, jnp.array(labels), margin=0.5, mode=mode,
            rng=jax.random.PRNGKey(0))[0]))
        out = g(jnp.array(emb))
        assert np.isfinite(np.asarray(out)).all()


# -- P-K compare-reduce fast path (round-2) ----------------------------------

def _pk_outputs(emb, labels, margin, mode, key, k_samples):
    return mining._parity_forward_large(
        jnp.array(emb), jnp.array(labels), margin, mode, key,
        k_samples=k_samples)


@pytest.mark.parametrize("margin", [0.3, 0.5])
def test_parity_pk_hardest_matches_dense_exactly(rng_np, margin):
    """hardest is deterministic: the P-K path must equal the dense
    sorted-window path bit-for-bit (loss, W, selection)."""
    emb, labels = make_batch(rng_np, k_classes=6, k_samples=4)
    key = jax.random.PRNGKey(0)
    l_d, s_d, w_d, aux_d = mining._parity_forward_large(
        jnp.array(emb), jnp.array(labels), margin, "hardest", key)
    l_p, s_p, w_p, aux_p = _pk_outputs(emb, labels, margin, "hardest",
                                       key, k_samples=4)
    np.testing.assert_allclose(float(l_p), float(l_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_d), atol=1e-7)
    np.testing.assert_array_equal(np.asarray(aux_p["selected"]),
                                  np.asarray(aux_d["selected"]))
    sel = np.asarray(aux_d["selected"])
    np.testing.assert_array_equal(np.asarray(aux_p["n_star"])[sel],
                                  np.asarray(aux_d["n_star"])[sel])
    assert int(s_p.n_triplets) == int(s_d.n_triplets)


@pytest.mark.parametrize("mode", ["random_hard", "semihard"])
def test_parity_pk_selection_matches_oracle_support(rng_np, mode):
    """Stochastic modes: the P-K path's selected pairs and windows match
    the numpy oracle's candidate sets (choice randomness differs from the
    dense path by design — only the distribution is specified)."""
    emb, labels = make_batch(rng_np, k_classes=4, k_samples=4)
    margin = 0.5
    oracle = oracle_mine(emb, labels, margin, mode)
    loss, stats, w, aux = _pk_outputs(emb, labels, margin, mode,
                                      jax.random.PRNGKey(3), k_samples=4)
    sel = np.asarray(aux["selected"])
    n_star = np.asarray(aux["n_star"])
    got_pairs = {(a, p) for a, p in zip(*np.nonzero(sel))}
    assert got_pairs == set(oracle.keys())
    for (a, p) in got_pairs:
        assert n_star[a, p] in oracle[(a, p)], (a, p, n_star[a, p])
    if oracle:
        lo = np.mean([min(sq_hinge(emb, a, p, n, margin) for n in ns)
                      for (a, p), ns in oracle.items()])
        hi = np.mean([max(sq_hinge(emb, a, p, n, margin) for n in ns)
                      for (a, p), ns in oracle.items()])
        assert lo - 1e-5 <= float(loss) <= hi + 1e-5


@pytest.mark.parametrize("mode", ["semihard", "hardest", "random_hard"])
def test_parity_pk_guard_poisons_ungrouped_labels(rng_np, mode):
    """Passing k_samples ASSERTS the grouped P-K layout: shuffled labels
    must poison the loss AND the gradient with NaN (loud failure — a
    dense fallback fused under lax.cond was measured to blow TPU compile
    past 45 min; callers without the layout omit max_positives)."""
    emb, labels = make_batch(rng_np, k_classes=5, k_samples=4)
    perm = rng_np.permutation(len(labels))
    emb, labels = emb[perm], labels[perm]
    key = jax.random.PRNGKey(7)
    l_g, s_g, w_g, _ = _pk_outputs(emb, labels, 0.5, mode, key,
                                   k_samples=4)
    assert np.isnan(float(l_g))
    assert np.isnan(np.asarray(w_g)).all()
    g = jax.grad(lambda e: mining.parity_mined_loss_large(
        e, jnp.array(labels), margin=0.5, mode=mode, rng=key,
        max_positives=3)[0])(jnp.array(emb))
    assert np.isnan(np.asarray(g)).any()
    # grouped labels with the same call stay finite
    emb2, labels2 = make_batch(rng_np, k_classes=5, k_samples=4)
    l_ok, _, w_ok, _ = _pk_outputs(emb2, labels2, 0.5, mode, key,
                                   k_samples=4)
    assert np.isfinite(float(l_ok))


@pytest.mark.parametrize("mode", ["semihard", "hardest", "random_hard"])
def test_parity_pk_gradient_matches_realized_selection(rng_np, mode):
    """Analytic W gradient == autodiff through the REALIZED selection
    (recompute the loss from aux's fixed choices, differentiate that)."""
    emb, labels = make_batch(rng_np, k_classes=4, k_samples=3, dim=8)
    margin = 0.5
    key = jax.random.PRNGKey(11)
    _, _, _, aux = _pk_outputs(emb, labels, margin, mode, key, k_samples=3)
    sel = np.asarray(aux["selected"])
    n_star = np.asarray(aux["n_star"])
    pairs = list(zip(*np.nonzero(sel)))

    def realized_loss(e):
        if not pairs:
            return jnp.float32(0.0)
        terms = [jnp.maximum(
            jnp.sum((e[a] - e[p]) ** 2) - jnp.sum((e[a] - e[n_star[a, p]])
                                                  ** 2) + margin, 0.0)
            for a, p in pairs]
        return jnp.sum(jnp.stack(terms)) / len(pairs)

    g_ref = jax.grad(realized_loss)(jnp.array(emb))
    g_pk = jax.grad(lambda e: mining.parity_mined_loss_large(
        e, jnp.array(labels), margin=margin, mode=mode, rng=key,
        max_positives=2)[0])(jnp.array(emb))
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)
