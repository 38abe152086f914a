"""Online triplet mining inside the jitted train step.

The reference mines on host: it calls ``embedding_model.predict`` from the
data generator, computes an sklearn distance matrix, and runs a Python loop
over anchor-positive pairs (``embedding_net/datagenerators.py:201-258``) —
two device round-trips per step. Here the same selection semantics run as
fixed-shape masked tensor ops on the *current* batch's embeddings, fused by
XLA into the train step.

Selection semantics reproduced exactly (``datagenerators.py:188-199``):

* anchor-positive pairs are unordered within-class combinations
  (``combinations(positive_indices, 2)``, ``datagenerators.py:231``) — mask
  ``label_a == label_p  and  a < p``;
* candidate scores ``loss_values = d(a,p) - d(a,n) + margin`` use
  **euclidean** (non-squared) distances (sklearn default, line 219/235);
* ``hardest``  : argmax of loss_values, kept only if > 0 (line 188-190);
* ``random_hard``: uniform choice among loss_values > 0 (line 192-194);
* ``semihard`` : uniform choice among 0 < loss_values < margin (line 196-199);
* the training loss on the selected triplet uses **squared** L2
  (``losses_and_accuracies.py:34-42``) — the reference's euclidean-select /
  squared-loss split is kept deliberately.

Where the reference emits a variable-size batch and falls back to one
arbitrary triplet when nothing is mined (``datagenerators.py:246-250``), the
fixed-shape version masks unmined pairs out and yields loss 0 (zero grads)
for an all-easy batch — the "mined fraction" stat surfaces this.

Beyond parity, two production modes the reference lacks:

* ``batch_hard``: per-anchor hardest positive + hardest negative, O(B^2);
* ``batch_all``: every valid triplet, computed *exactly* in O(B^2 log B)
  via per-anchor sorted negative distances + prefix sums instead of
  materializing the B^3 hinge tensor (`batch_all_loss`; the naive masked
  version is kept as `batch_all_loss_reference` for oracle tests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from embeddingnet_tpu.ops.distances import pairwise_l2, pairwise_sq_l2

PARITY_MODES = ("semihard", "hardest", "random_hard")
FAST_MODES = ("batch_hard", "batch_all")
ALL_MODES = PARITY_MODES + FAST_MODES

# parity-mode batches above this dispatch to the O(B^2 log B) sorted-window
# miner instead of the [B,B,B] enumeration (reference-scale batches ~60
# stay on the enumeration, which is cheaper at tiny B)
_PARITY_CUBE_MAX_B = 256


class MiningStats(NamedTuple):
    """Per-step observability of the miner (host-loggable scalars)."""

    n_triplets: jnp.ndarray      # number of mined / active triplets
    n_candidates: jnp.ndarray    # number of valid anchor-positive pairs
    frac_mined: jnp.ndarray      # n_triplets / n_candidates
    mean_pos_dist: jnp.ndarray   # mean euclidean d(a, p) over valid pairs
    mean_neg_dist: jnp.ndarray   # mean euclidean d(a, n) over valid pairs


def _masks(labels: jnp.ndarray):
    """(positive-pair mask incl. self, negative mask, not-self mask)."""
    same = labels[:, None] == labels[None, :]
    b = labels.shape[0]
    eye = jnp.eye(b, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same
    return pos_mask, neg_mask


def _uniform_choice(rng: jax.Array, mask: jnp.ndarray) -> jnp.ndarray:
    """Uniform index among True entries of the trailing axis, via Gumbel.

    Matches the distribution of the reference's ``np.random.choice`` over the
    candidate set without data-dependent shapes. Rows with an empty mask
    return an arbitrary index (callers mask those out).
    """
    g = jax.random.gumbel(rng, mask.shape, dtype=jnp.float32)
    return jnp.argmax(jnp.where(mask, g, -jnp.inf), axis=-1)


def _stats(dist: jnp.ndarray, pos_mask: jnp.ndarray, neg_mask: jnp.ndarray,
           n_triplets: jnp.ndarray, n_candidates: jnp.ndarray) -> MiningStats:
    pos_cnt = jnp.maximum(jnp.sum(pos_mask), 1)
    neg_cnt = jnp.maximum(jnp.sum(neg_mask), 1)
    return MiningStats(
        n_triplets=n_triplets,
        n_candidates=n_candidates,
        frac_mined=n_triplets.astype(jnp.float32)
        / jnp.maximum(n_candidates.astype(jnp.float32), 1.0),
        mean_pos_dist=jnp.sum(dist * pos_mask) / pos_cnt,
        mean_neg_dist=jnp.sum(dist * neg_mask) / neg_cnt,
    )


def _parity_mined_loss(embeddings: jnp.ndarray, labels: jnp.ndarray, *,
                       margin: float, mode: str, rng: jax.Array):
    """Reference-parity mining (semihard / hardest / random_hard).

    Materializes the [B, B, B] candidate-score tensor; intended for
    reference-scale mining batches (k_classes * k_samples, e.g. 60 at
    ``configs/road_signs_apollo.yml:22-23``). For production batch sizes use
    ``batch_hard`` / ``batch_all``.
    """
    b = labels.shape[0]
    if b > 512:
        raise ValueError(
            f"_parity_mined_loss materializes a [B,B,B] candidate tensor "
            f"(B={b} -> {b ** 3 * 4 / 1e9:.1f} GB); "
            f"mined_triplet_loss dispatches B>{_PARITY_CUBE_MAX_B} to "
            f"parity_mined_loss_large automatically.")
    dist = pairwise_l2(embeddings)            # euclidean — selection metric
    sq = pairwise_sq_l2(embeddings)           # squared  — loss metric
    pos_mask, neg_mask = _masks(labels)
    idx = jnp.arange(b)
    # Unordered combinations: anchor index < positive index (ref line 231).
    pair_mask = pos_mask & (idx[:, None] < idx[None, :])

    # loss_values[a, p, n] = d(a,p) - d(a,n) + margin, only n with other label.
    lv = dist[:, :, None] - dist[:, None, :] + margin    # [B(a), B(p), B(n)]
    neg3 = jnp.broadcast_to(neg_mask[:, None, :], lv.shape)

    if mode == "hardest":
        cand = neg3
        score = jnp.where(cand, lv, -jnp.inf)
        n_star = jnp.argmax(score, axis=-1)               # [B, B]
        best = jnp.max(score, axis=-1)
        selected = pair_mask & (best > 0.0) & jnp.isfinite(best)
    elif mode == "random_hard":
        cand = neg3 & (lv > 0.0)
        n_star = _uniform_choice(rng, cand)
        selected = pair_mask & jnp.any(cand, axis=-1)
    elif mode == "semihard":
        cand = neg3 & (lv > 0.0) & (lv < margin)
        n_star = _uniform_choice(rng, cand)
        selected = pair_mask & jnp.any(cand, axis=-1)
    else:  # pragma: no cover - dispatch guards this
        raise ValueError(f"unknown parity mining mode {mode!r}")

    # Squared-distance hinge on the selected triplets (ref loss semantics).
    sq_an = jnp.take_along_axis(sq, n_star, axis=1)       # sq[a, n_star[a,p]]
    hinge = jnp.maximum(sq - sq_an + margin, 0.0)         # [B(a), B(p)]
    n_sel = jnp.sum(selected)
    loss = jnp.sum(jnp.where(selected, hinge, 0.0)) / jnp.maximum(n_sel, 1)
    stats = _stats(dist, pos_mask, neg_mask, n_sel, jnp.sum(pair_mask))
    return loss, stats


def _count_below(keys: jnp.ndarray, queries: jnp.ndarray,
                 inclusive: bool = True) -> jnp.ndarray:
    """``counts[r, j] = #{i : keys[r, i] <= queries[r, j]}`` per row
    (``< `` when ``inclusive=False``).

    Gather-free: ONE stable merged sort of [R, N+Q] + positional cumsum +
    un-sort (vmapped ``searchsorted`` lowers to a serial gather loop on
    TPU — see :func:`batch_all_rowblock`). Masked keys should be ``+inf``,
    masked queries ``-inf``. Tie handling rides the stable sort's column-id
    tiebreak: keys concatenated before queries count ties in (<=), queries
    concatenated before keys count ties out (<).
    """
    r, n = keys.shape
    q = queries.shape[1]
    if inclusive:
        merged = jnp.concatenate([keys, queries], axis=1)
        query_slice = slice(n, None)
    else:
        merged = jnp.concatenate([queries, keys], axis=1)
        query_slice = slice(0, q)
    col = jnp.broadcast_to(jnp.arange(n + q, dtype=jnp.int32)[None, :],
                           (r, n + q))
    vals_sorted, col_sorted = jax.lax.sort((merged, col), dimension=1,
                                           num_keys=1)
    is_key = ((col_sorted < n) if inclusive else
              (col_sorted >= q)).astype(keys.dtype)
    cum = jnp.cumsum(is_key, axis=1) - is_key
    _, cnt = jax.lax.sort((col_sorted, cum), dimension=1, num_keys=1)
    return cnt[:, query_slice]


def _fetch_at_rank(sorted_vals: jnp.ndarray, sorted_ids: jnp.ndarray,
                   ranks: jnp.ndarray):
    """Per-row fetch ``(sorted_vals[r, ranks[r, j]], sorted_ids[r, ...])``
    without gathers.

    TPU ``take_along_axis`` on [B, B] costs ~5x a sort (see
    docs/MINING.md); instead: merge position entries (key = 0..N-1,
    carrying value+id) with request entries (key = rank + 0.5), stable
    sort, carry the last-seen position value forward with a log-depth
    ``associative_scan``, and un-sort the requests back to column order.

    The request block is zero-padded so the merged width is a multiple
    of 512: TPU sort lowering is pathological at barely-over-a-round-
    number widths (measured: [4096, 4100] sort compiles in 187 s vs
    27 s at [4096, 4608]); the padded requests fetch rank 0 and are
    sliced off.
    """
    r, n = sorted_vals.shape
    q_real = ranks.shape[1]
    pad = -(n + q_real) % 512
    if pad:
        ranks = jnp.concatenate(
            [ranks, jnp.zeros((r, pad), ranks.dtype)], axis=1)
    q = ranks.shape[1]
    f32 = sorted_vals.dtype
    pos_keys = jnp.broadcast_to(jnp.arange(n, dtype=f32)[None, :], (r, n))
    keys = jnp.concatenate([pos_keys, ranks.astype(f32) + 0.5], axis=1)
    vals = jnp.concatenate([sorted_vals, jnp.zeros((r, q), f32)], axis=1)
    ids = jnp.concatenate([sorted_ids.astype(f32), jnp.zeros((r, q), f32)],
                          axis=1)
    flag = jnp.concatenate([jnp.ones((r, n), f32), jnp.zeros((r, q), f32)],
                           axis=1)
    col = jnp.broadcast_to(jnp.arange(n + q, dtype=jnp.int32)[None, :],
                           (r, n + q))
    _, v_s, i_s, f_s, c_s = jax.lax.sort((keys, vals, ids, flag, col),
                                         dimension=1, num_keys=1)

    def carry_last(a, b):
        v1, i1, f1 = a
        v2, i2, f2 = b
        pick = f2 > 0
        return (jnp.where(pick, v2, v1), jnp.where(pick, i2, i1),
                jnp.maximum(f1, f2))

    v_c, i_c, _ = jax.lax.associative_scan(carry_last, (v_s, i_s, f_s),
                                           axis=1)
    _, v_u, i_u = jax.lax.sort((c_s, v_c, i_c), dimension=1, num_keys=1)
    return (v_u[:, n:n + q_real],
            i_u[:, n:n + q_real].astype(jnp.int32))


def _row_histogram(ids: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """``counts[r, b] = #{j : ids[r, j] == b}`` for integer ids in
    ``[0, n_bins]`` (``n_bins`` = ignore sentinel). Scatter-add histograms
    are TPU-slow; two :func:`_count_below` merged sorts instead."""
    r = ids.shape[0]
    queries = jnp.broadcast_to(
        (jnp.arange(n_bins, dtype=jnp.float32) + 0.5)[None, :], (r, n_bins))
    cum = _count_below(ids.astype(jnp.float32), queries)
    return cum - jnp.concatenate(
        [jnp.zeros((r, 1), cum.dtype), cum[:, :-1]], axis=1)


def _parity_forward_large(embeddings: jnp.ndarray, labels: jnp.ndarray,
                          margin: float, mode: str, rng: jax.Array,
                          k_samples=None):
    """Production-scale parity mining forward: loss, stats, and the
    analytic gradient weight matrix W — O(B^2 log B), no [B, B, B].

    Same selection semantics as :func:`_parity_mined_loss` (euclidean
    selection / squared loss, strict inequalities, uniform choice), but the
    per-pair candidate sets are handled through their structure instead of
    enumeration: for anchor ``a`` sort its negatives ascending by euclidean
    distance once; every candidate set is then a contiguous RANK WINDOW —

    * ``hardest``     : window [0, 1) — the closest negative (argmax of
      ``d(a,p) - d(a,n) + margin`` over n is argmin of ``d(a,n)``);
    * ``random_hard`` : window [0, k) with ``k = #{n : d_an < d_ap + m}``;
    * ``semihard``    : window [k_lo, k_hi), ``k_lo = #{n : d_an <= d_ap}``,
      ``k_hi = #{n : d_an < d_ap + m}``;

    so the reference's ``np.random.choice`` becomes a uniform rank in the
    window + one gather-free :func:`_fetch_at_rank`. Returns
    ``(loss, stats, w, aux)`` where ``w`` is the weight matrix with
    ``d loss / d sq[a, b] = w[a, b]`` and aux carries the selected
    negative ids + masks (for oracle tests).

    With ``k_samples`` set and a grouped P-K batch, the window COUNTS
    come from the same [B, B, K] compare-reduce as the P-K batch-all path
    instead of merged sorts; ``hardest`` needs no sort at all and the
    stochastic modes keep only the one negative sort for the rank-window
    fetch (measured vs the dense path at B=4096: docs/MINING.md).

    Guard semantics differ from :func:`_batch_all_forward`: passing
    ``k_samples`` ASSERTS the grouped layout — a violating batch poisons
    the loss/gradient with NaN (caught by ``PERFORMANCE.debug_nans`` or
    plainly visible) instead of falling back to the dense path. Fusing
    both paths under ``lax.cond`` was measured to blow TPU compile time
    past 45 minutes (the dense branch's [B, ~B] sort lowering is
    pathological at several widths — see docs/BENCHMARKS.md "XLA flag"
    note for the relay constraint); callers that cannot guarantee the
    layout simply omit ``k_samples``.
    """
    loss, stats, bwd_res, aux = _parity_forward_parts(
        embeddings, labels, margin, mode, rng, k_samples)
    if len(bwd_res) == 5:
        # assemble the dense W for this test-facing contract; the
        # production custom-VJP path consumes the structured parts
        # directly (`_parity_forward_parts`) and XLA never builds W
        _, active_f, w_neg, denom, poison = bwd_res
        b = labels.shape[0]
        w = ((_pk_place_grouped(active_f, k_samples, b) - w_neg)
             / denom) * poison
    else:
        w = bwd_res[1]
    return loss, stats, w, aux


def _parity_forward_parts(embeddings: jnp.ndarray, labels: jnp.ndarray,
                          margin: float, mode: str, rng: jax.Array,
                          k_samples=None):
    """Like :func:`_parity_forward_large` but returns the analytic
    backward's residuals instead of the materialized W:
    ``(emb, active_f [B,K], w_neg [B,B], denom, poison)`` on the grouped
    P-K fast path (W reconstructed from structure in the VJP — see
    :func:`_structured_w_grad`), ``(emb, w [B,B])`` on the dense path."""
    b = labels.shape[0]
    dist = pairwise_l2(embeddings)
    sq = pairwise_sq_l2(embeddings)
    pos_mask, neg_mask = _masks(labels)
    emb32 = embeddings.astype(jnp.float32)
    if (k_samples and 1 < k_samples < b and b % k_samples == 0):
        fits = _pk_grouped(labels, k_samples)
        d2_blk = _pk_group_sq(emb32, k_samples)
        loss, stats, parts, aux = _parity_pk(dist, sq, pos_mask, neg_mask,
                                             rng, margin, mode, k_samples,
                                             d2_blk)
        poison = jnp.where(fits, 1.0, jnp.nan)
        # Poison the logged stats too: a layout violation must show up in
        # the same step's metrics (NaN frac/dists, n_triplets = -1), not
        # only in params many steps later.
        stats = MiningStats(
            n_triplets=jnp.where(fits, stats.n_triplets, -1),
            n_candidates=jnp.where(fits, stats.n_candidates, -1),
            frac_mined=stats.frac_mined * poison,
            mean_pos_dist=stats.mean_pos_dist * poison,
            mean_neg_dist=stats.mean_neg_dist * poison)
        active_f, w_neg, denom = parts
        return (loss * poison, stats,
                (emb32, active_f, w_neg, denom, poison), aux)
    loss, stats, w, aux = _parity_dense(dist, sq, pos_mask, neg_mask, rng,
                                        margin, mode)
    return loss, stats, (emb32, w), aux


def _parity_pk(dist, sq, pos_mask, neg_mask, rng, margin, mode, kk,
               d2_blk):
    """P-K fast path of :func:`_parity_forward_large`: grouped batches put
    every anchor's positives in a static block-diagonal, so the rank-window
    bounds are [B, K] compare-reduces; one [B, B] negative sort remains for
    the window fetch. ``d2_blk [g, K, K]`` carries the within-group
    squared distances computed block-wise from the embeddings
    (:func:`_pk_group_sq` — the old in-place extraction re-tiled the
    [B, B] matrix, see that docstring). Returns
    ``(loss, stats, (active_f [B,K], w_neg [B,B], denom), aux)``; the
    [B, B]-shaped aux matches :func:`_parity_dense` for the oracle
    tests (dead code under the production custom VJP)."""
    b = dist.shape[0]
    g = b // kk
    f32 = jnp.float32

    # block-diagonal euclidean pair distances; unordered (a < p) pairs =
    # upper-triangular slots within each block (blocks are contiguous)
    slot_valid = (jnp.arange(kk)[:, None] < jnp.arange(kk)[None, :])
    pair_valid = jnp.tile(slot_valid, (g, 1))               # [B, K]
    d_pair = jnp.where(pair_valid, jnp.sqrt(d2_blk).reshape(b, kk),
                       -jnp.inf)

    neg_d = jnp.where(neg_mask, dist, jnp.inf)              # [B, B]
    has_neg = jnp.any(neg_mask, axis=1)

    if mode == "hardest":
        min_neg = jnp.min(neg_d, axis=1)                    # [B]
        k = jnp.where(
            (d_pair > -jnp.inf) & has_neg[:, None]
            & (d_pair - min_neg[:, None] + margin > 0.0), 1.0, 0.0)
        k_lo = jnp.zeros((b, kk), f32)
        ranks = jnp.zeros((b, kk), f32)
    else:
        # strict upper bound, inclusive lower bound — the dense path's
        # _count_below tie conventions (ref datagenerators.py:192-199)
        cmp_up = (neg_d[:, :, None]
                  < (d_pair + margin)[:, None, :]).astype(f32)
        k_hi = jnp.sum(cmp_up, axis=1)                      # [B, K]
        if mode == "semihard":
            cmp_lo = (neg_d[:, :, None] <= d_pair[:, None, :]).astype(f32)
            k_lo = jnp.sum(cmp_lo, axis=1)
        else:
            k_lo = jnp.zeros((b, kk), f32)
        k = jnp.where(pair_valid, jnp.maximum(k_hi - k_lo, 0.0), 0.0)
        u = jax.random.uniform(rng, (b, kk), f32)
        ranks = jnp.clip(k_lo + jnp.floor(u * k), 0.0, b - 1.0)

    selected = (d_pair > -jnp.inf) & (k > 0)

    if mode == "hardest":
        # rank-0 fetch == per-anchor (min, argmin) over negatives: pure
        # reduces, no sort (the [B, B] negative sort alone is ~40 ms at
        # B=4096 — the whole hardest path runs in a few ms without it)
        d_min = jnp.min(neg_d, axis=1)                      # [B]
        n_min = jnp.argmin(neg_d, axis=1).astype(jnp.int32)
        d_star = jnp.broadcast_to(d_min[:, None], (b, kk))
        n_star = jnp.broadcast_to(n_min[:, None], (b, kk))
    else:
        ids0 = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[None, :],
                                (b, b))
        sorted_d, sorted_ids = jax.lax.sort((neg_d, ids0), dimension=1,
                                            num_keys=1)
        d_star, n_star = _fetch_at_rank(sorted_d, sorted_ids,
                                        jnp.where(selected, ranks, 0.0))

    sq_blk = d2_blk.reshape(b, kk)
    sq_an = jnp.where(jnp.isfinite(d_star), d_star * d_star, jnp.inf)
    hinge = jnp.maximum(sq_blk - sq_an + margin, 0.0)
    n_sel = jnp.sum(selected)
    denom = jnp.maximum(n_sel, 1).astype(f32)
    loss = jnp.sum(jnp.where(selected, hinge, 0.0)) / denom

    active = selected & (hinge > 0.0)
    active_f = active.astype(f32)
    w_neg = jnp.sum((n_star[:, :, None]
                     == jnp.arange(b)[None, None, :])
                    & active[:, :, None], axis=1).astype(f32)

    stats = _stats(dist, pos_mask, neg_mask, n_sel,
                   jnp.sum(pair_valid.astype(jnp.int32)) * 1)
    place_i = lambda x: _pk_place_grouped(x.astype(f32), kk, b)
    aux = {"selected": place_i(selected) > 0,
           "active": place_i(active) > 0,
           "n_star": place_i(n_star.astype(f32)).astype(jnp.int32),
           "k": place_i(k),
           "k_lo": place_i(k_lo) if mode == "semihard" else None}
    return loss, stats, (active_f, w_neg, denom), aux


def _parity_dense(dist, sq, pos_mask, neg_mask, rng, margin, mode):
    """The label-agnostic sorted-window path (see
    :func:`_parity_forward_large` for the window semantics)."""
    b = dist.shape[0]
    idx = jnp.arange(b)
    pair_mask = pos_mask & (idx[:, None] < idx[None, :])
    has_neg = jnp.any(neg_mask, axis=1)

    neg_d = jnp.where(neg_mask, dist, jnp.inf)              # [B, B]
    ids0 = jnp.broadcast_to(idx.astype(jnp.int32)[None, :], (b, b))
    sorted_d, sorted_ids = jax.lax.sort((neg_d, ids0), dimension=1,
                                        num_keys=1)

    d_ap = jnp.where(pair_mask, dist, -jnp.inf)
    if mode == "hardest":
        # closest negative per anchor; selected iff its lv > 0
        ranks = jnp.zeros((b, b), jnp.float32)
        k = jnp.where(pair_mask & has_neg[:, None]
                      & (dist - sorted_d[:, :1] + margin > 0.0), 1.0, 0.0)
    elif mode == "random_hard":
        # candidates: lv > 0 <=> d_an < d_ap + margin STRICT (a tie means
        # lv == 0, excluded — reference datagenerators.py:192-194)
        k_hi = _count_below(neg_d, d_ap + margin, inclusive=False)
        k_lo = jnp.zeros((b, b), jnp.float32)
        k = jnp.where(pair_mask, k_hi, 0.0)
    elif mode == "semihard":
        # 0 < lv < margin <=> d_ap < d_an < d_ap + margin, both strict
        # (ties give lv == margin / lv == 0, both excluded — ref :196-199)
        k_hi = _count_below(neg_d, d_ap + margin, inclusive=False)
        k_lo = _count_below(neg_d, d_ap, inclusive=True)
        k = jnp.where(pair_mask, jnp.maximum(k_hi - k_lo, 0.0), 0.0)
    else:  # pragma: no cover - dispatch guards this
        raise ValueError(f"unknown parity mining mode {mode!r}")

    selected = pair_mask & (k > 0)
    if mode != "hardest":
        u = jax.random.uniform(rng, (b, b), jnp.float32)
        ranks = k_lo + jnp.floor(u * k)
        ranks = jnp.clip(ranks, 0.0, b - 1.0)
    d_star, n_star = _fetch_at_rank(sorted_d, sorted_ids,
                                    jnp.where(selected, ranks, 0.0))

    sq_an = jnp.where(jnp.isfinite(d_star), d_star * d_star, jnp.inf)
    hinge = jnp.maximum(sq - sq_an + margin, 0.0)
    n_sel = jnp.sum(selected)
    denom = jnp.maximum(n_sel, 1).astype(jnp.float32)
    loss = jnp.sum(jnp.where(selected, hinge, 0.0)) / denom

    # analytic W: active pairs contribute +1/n at (a, p), -1/n at (a, n*)
    active = selected & (hinge > 0.0)
    w_pos = jnp.where(active, 1.0, 0.0)
    ids_for_hist = jnp.where(active, n_star, b)             # b = ignore
    w_neg = _row_histogram(ids_for_hist, b)
    w = (w_pos - w_neg) / denom

    stats = _stats(dist, pos_mask, neg_mask, n_sel, jnp.sum(pair_mask))
    aux = {"selected": selected, "active": active, "n_star": n_star,
           "k": k, "k_lo": k_lo if mode == "semihard" else None}
    return loss, stats, w, aux


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _parity_large_custom(embeddings, labels, rng, margin, mode, k_samples):
    loss, stats, _, _ = _parity_forward_parts(embeddings, labels, margin,
                                              mode, rng, k_samples)
    return loss, stats


def _parity_large_fwd(embeddings, labels, rng, margin, mode, k_samples):
    loss, stats, bwd_res, _ = _parity_forward_parts(
        embeddings, labels, margin, mode, rng, k_samples)
    return (loss, stats), bwd_res


def _parity_large_bwd(margin, mode, k_samples, residuals, cotangents):
    """Same piecewise-constant-W structure as the batch-all VJP:
    ``loss = sum(W * sq)`` + constants, so with ``S = W + W^T`` the
    embedding gradient is MXU matmuls (see :func:`_batch_all_bwd`). On
    the grouped P-K path W is reconstructed from its block/dense parts
    (:func:`_structured_w_grad`) and never materialized."""
    g_loss, _ = cotangents
    if len(residuals) == 5:
        emb, active_f, w_neg, denom, poison = residuals
        return (_structured_w_grad(emb, active_f, w_neg, denom, poison,
                                   k_samples, g_loss), None, None)
    emb, w = residuals
    s = w + w.T
    row = jnp.sum(s, axis=1, keepdims=True)
    grad_e = 2.0 * (row * emb - jnp.matmul(
        s, emb, preferred_element_type=jnp.float32))
    return (g_loss * grad_e, None, None)


_parity_large_custom.defvjp(_parity_large_fwd, _parity_large_bwd)


def parity_mined_loss_large(embeddings: jnp.ndarray, labels: jnp.ndarray, *,
                            margin: float, mode: str, rng: jax.Array,
                            max_positives=None):
    """Reference-semantics mining at production batch (no [B,B,B]); see
    :func:`_parity_forward_large`. Gradient is the analytic custom VJP.
    ``max_positives`` (= k_samples - 1 of a P-K batch) enables the
    runtime-guarded compare-reduce fast path."""
    k_samples = (max_positives + 1) if max_positives is not None else None
    return _parity_large_custom(embeddings.astype(jnp.float32), labels,
                                rng, margin, mode, k_samples)


def batch_hard_loss(embeddings: jnp.ndarray, labels: jnp.ndarray, *,
                    margin: float = 0.5, soft: bool = False):
    """Batch-hard triplet loss (Hermans et al. 2017), O(B^2).

    Per anchor: hardest (farthest) positive and hardest (closest) negative.
    Selection on euclidean == selection on squared (sqrt is monotone); loss
    uses squared L2 for consistency with the reference loss formula.
    """
    sq = pairwise_sq_l2(embeddings)
    dist = jnp.sqrt(sq)
    pos_mask, neg_mask = _masks(labels)

    hardest_pos = jnp.max(jnp.where(pos_mask, sq, -jnp.inf), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, sq, jnp.inf), axis=1)
    valid = jnp.any(pos_mask, axis=1) & jnp.any(neg_mask, axis=1)

    raw = hardest_pos - hardest_neg
    if soft:
        per_anchor = jnp.logaddexp(0.0, raw)          # softplus variant
    else:
        per_anchor = jnp.maximum(raw + margin, 0.0)
    per_anchor = jnp.where(valid, per_anchor, 0.0)
    n_valid = jnp.sum(valid)
    loss = jnp.sum(per_anchor) / jnp.maximum(n_valid, 1)

    active = jnp.sum((per_anchor > 0.0) & valid)
    stats = _stats(dist, pos_mask, neg_mask, active, n_valid)
    return loss, stats


def batch_all_loss_reference(embeddings: jnp.ndarray, labels: jnp.ndarray, *,
                             margin: float = 0.5):
    """Naive O(B^3) batch-all — oracle for tests; do not use at scale."""
    sq = pairwise_sq_l2(embeddings)
    dist = jnp.sqrt(sq)
    pos_mask, neg_mask = _masks(labels)
    lv = sq[:, :, None] - sq[:, None, :] + margin          # [a, p, n]
    valid = pos_mask[:, :, None] & neg_mask[:, None, :]
    hinge = jnp.where(valid, jnp.maximum(lv, 0.0), 0.0)
    active = jnp.sum((hinge > 0.0) & valid)
    loss = jnp.sum(hinge) / jnp.maximum(active, 1)
    stats = _stats(dist, pos_mask, neg_mask, active, jnp.sum(valid))
    return loss, stats


def batch_all_rowblock(sq: jnp.ndarray, pos_mask: jnp.ndarray,
                       neg_mask: jnp.ndarray, margin: float):
    """Per-anchor-row batch-all counting over a [R, B] distance block.

    The TPU-fast core shared by the single-device and sharded miners.
    All counting runs through ONE merged key-sort per anchor row instead
    of ``searchsorted`` — vmapped searchsorted lowers to a serial gather
    loop on TPU (~140 ms at B=1024); a [R, 2B] bitonic sort + positional
    cumsums is fully vectorized. Per anchor row the merged array holds
    its B negative squared distances (``+inf`` where not a negative) and
    its B pair thresholds ``t = sq_ap + margin`` (``-inf`` where not a
    positive pair); cumsums of indicator/value give, at every t, the
    count ``k`` and value-sum ``P`` of negatives strictly below it, and
    at every negative, the count ``m`` of thresholds strictly above it
    (stable sort puts equal negatives before thresholds; a tie is a
    zero-hinge triplet, so either subgradient convention is valid).
    A second sort keyed on the carried column ids un-sorts the cumulants
    back to element order — TPU gathers are ~5x slower than sorts.

    Returns ``(pair_sum [R, B], k [R, B], m [R, B])``: the un-normalized
    per-pair hinge sums, per-pair active-triplet counts, and per-negative
    dual counts (the +/- entries of the analytic gradient weight matrix).
    """
    r, b = sq.shape
    neg_sq = jnp.where(neg_mask, sq, jnp.inf)              # [R, B]
    t = jnp.where(pos_mask, sq + margin, -jnp.inf)         # [R, B]

    merged = jnp.concatenate([neg_sq, t], axis=1)          # [R, 2B]
    col_ids = jnp.broadcast_to(jnp.arange(2 * b, dtype=jnp.int32)[None, :],
                               (r, 2 * b))
    vals_sorted, sorted_col = jax.lax.sort((merged, col_ids), dimension=1,
                                           num_keys=1)
    is_neg_sorted = (sorted_col < b).astype(sq.dtype)

    # negatives strictly before each rank: count and value prefix sums
    cum_cnt = jnp.cumsum(is_neg_sorted, axis=1) - is_neg_sorted
    neg_vals = jnp.where((sorted_col < b) & jnp.isfinite(vals_sorted),
                         vals_sorted, 0.0)
    cum_val = jnp.cumsum(neg_vals, axis=1) - neg_vals
    # thresholds strictly before each rank (includes -inf invalid t's)
    is_t_sorted = 1.0 - is_neg_sorted
    cum_t = jnp.cumsum(is_t_sorted, axis=1) - is_t_sorted

    _, u_cnt, u_val, u_t = jax.lax.sort(
        (sorted_col, cum_cnt, cum_val, cum_t), dimension=1, num_keys=1)

    k = jnp.where(pos_mask, u_cnt[:, b:], 0.0)             # #neg < t
    p_at_t = u_val[:, b:]
    pair_sum = jnp.where(pos_mask, k * t - p_at_t, 0.0)

    # m[a, n] = #valid thresholds of anchor a strictly above sq_an.
    # cum_t at a negative's rank counts t's below it, including the
    # invalid -inf thresholds that sort first.
    n_pos = jnp.sum(pos_mask, axis=1).astype(sq.dtype)     # [R]
    n_invalid_t = b - n_pos
    t_below = u_t[:, :b]
    m = jnp.maximum(n_pos[:, None] - (t_below - n_invalid_t[:, None]), 0.0)
    m = jnp.where(neg_mask, m, 0.0)
    return pair_sum, k, m


def _pk_counts(sq: jnp.ndarray, neg_mask: jnp.ndarray,
               t_flat: jnp.ndarray):
    """Compare-reduce core of the P-K batch-all path over an anchor-row
    block: ``sq``/``neg_mask`` are [R, B], ``t_flat`` [R, K] per-anchor
    thresholds (``-inf`` = invalid). Returns per-threshold
    ``(pair_sum [R,K], k [R,K])`` and per-negative ``m [R,B]``. One
    [R, B, K] compare serves all three reductions; ``<=`` matches the
    rowblock sorts' stable-tie convention (ties are zero hinges)."""
    neg_sq = jnp.where(neg_mask, sq, jnp.inf)
    cmp = (neg_sq[:, :, None] <= t_flat[:, None, :]).astype(sq.dtype)
    k = jnp.sum(cmp, axis=1)
    p_at_t = jnp.sum(jnp.where(neg_mask, sq, 0.0)[:, :, None] * cmp, axis=1)
    pair_sum = jnp.where(jnp.isfinite(t_flat), k * t_flat - p_at_t, 0.0)
    m = jnp.sum(cmp, axis=2)
    return pair_sum, k, m


def _pk_place_grouped(x: jnp.ndarray, k_samples: int, n_cols: int,
                      col0=0) -> jnp.ndarray:
    """Place per-threshold values [R, K] back to row-block coordinates
    [R, n_cols] (block-diagonal at column offset ``col0``), gather-free."""
    r = x.shape[0]
    kk = k_samples
    g = r // kk
    eye_g = jnp.eye(g, dtype=x.dtype)
    local = jnp.einsum("gij,gh->gihj", x.reshape(g, kk, kk),
                       eye_g).reshape(r, r)
    if isinstance(col0, int) and col0 == 0 and n_cols == r:
        return local
    out = jnp.zeros((r, n_cols), x.dtype)
    return jax.lax.dynamic_update_slice(out, local, (0, col0))


def _pk_grouped(labels: jnp.ndarray, k_samples: int) -> jnp.ndarray:
    """Runtime predicate: batch is grouped P-K with no class split across
    groups (each anchor has exactly k_samples - 1 positives)."""
    b = labels.shape[0]
    blocks = labels.reshape(b // k_samples, k_samples)
    grouped = jnp.all(blocks == blocks[:, :1])
    pos_counts = jnp.sum(labels[:, None] == labels[None, :], axis=1) - 1
    return grouped & jnp.all(pos_counts == k_samples - 1)


def _pk_is_fast_path(b: int, max_positives) -> bool:
    """Static predicate shared by the custom-VJP fwd/bwd: the grouped
    P-K compare-reduce path applies (vs the generic rowblock sort)."""
    k_samples = (max_positives + 1) if max_positives is not None else None
    return bool(k_samples and 1 < k_samples < b and b % k_samples == 0)


def _pk_group_sq(embeddings: jnp.ndarray, k_samples: int) -> jnp.ndarray:
    """[g, K, K] within-group squared L2 for a grouped P-K batch,
    computed block-wise straight from the embeddings.

    Replaces the old ``sq.reshape(g, kk, g, kk)`` + eye-einsum
    extraction: on TPU that reshape physically re-tiles the [B, B]
    distance matrix into 8-wide minor dims (vs the native (8, 128)
    tiles), and the probe-9 trace attributes ~3.2 ms of the 7.4 ms
    B=4096 batch-all kernel to those two ops. A batched [g, K, D] x
    [g, D, K] Gram matmul touches only the 4 MB of embeddings (the
    ``reshape(g, kk, d)`` splits the MAJOR dim — no re-tile) and matches
    :func:`pairwise_sq_l2`'s |a|^2+|b|^2-2ab form, HIGHEST-precision
    matmul and >= 0 clamp. Last-ulp differences vs the big-matrix
    extraction only move exact-tie (zero-hinge) triplets between the
    counted/uncounted sets — either subgradient convention is valid
    (see :func:`batch_all_rowblock`).
    """
    b, d = embeddings.shape
    kk = k_samples
    g = b // kk
    eg = embeddings.reshape(g, kk, d).astype(jnp.float32)
    gram = jnp.einsum("gid,gjd->gij", eg, eg,
                      precision=jax.lax.Precision.HIGHEST)
    n = jnp.sum(jnp.square(eg), axis=-1)
    return jnp.maximum(n[:, :, None] + n[:, None, :] - 2.0 * gram, 0.0)


def _pk_group_thresholds(embeddings: jnp.ndarray, margin: float,
                         k_samples: int) -> jnp.ndarray:
    """[B, K] per-anchor positive thresholds ``sq(a, p) + margin`` for a
    grouped P-K batch (self = -inf); see :func:`_pk_group_sq`."""
    b = embeddings.shape[0]
    kk = k_samples
    d2 = _pk_group_sq(embeddings, kk)
    eye = jnp.eye(kk, dtype=bool)
    t = jnp.where(eye[None], -jnp.inf, d2 + margin)
    return t.reshape(b, kk)


def _structured_w_grad(emb: jnp.ndarray, k_flat: jnp.ndarray,
                       m: jnp.ndarray, denom, poison, k_samples: int,
                       g_loss):
    """Embedding gradient for a block/dense-structured weight matrix
    ``W = (Kbd - M) / denom`` without materializing W (see
    :func:`_batch_all_bwd`): ``Kbd`` is the block-diagonal placement of
    ``k_flat [B, K]`` (per-pair counts at the anchor's group slots), `M`
    the dense [B, B] per-negative counts. With ``S = W + W^T``::

        dL/de = 2 * (rowsum(S) * e - S @ e)

    where ``S @ e`` is two [g, K, K] x [g, K, D] batched matmuls plus
    ``M @ e + M^T @ e`` (the transposed product contracts over the
    first axis via dot_general — no physical transpose, no 67 MB W
    copy at B=4096).
    """
    b = emb.shape[0]
    kk = k_samples
    g = b // kk
    eg = emb.reshape(g, kk, -1)
    k_blk = k_flat.reshape(g, kk, kk)
    pos_mv = (jnp.einsum("gij,gjd->gid", k_blk, eg)
              + jnp.einsum("gji,gjd->gid", k_blk, eg)).reshape(b, -1)
    pos_row = (jnp.sum(k_blk, axis=2) + jnp.sum(k_blk, axis=1)).reshape(b)
    neg_mv = (jnp.matmul(m, emb, preferred_element_type=jnp.float32)
              + jnp.einsum("ab,ad->bd", m, emb,
                           preferred_element_type=jnp.float32))
    neg_row = jnp.sum(m, axis=1) + jnp.sum(m, axis=0)
    s_e = (pos_mv - neg_mv) / denom
    s_row = (pos_row - neg_row) / denom
    return g_loss * 2.0 * (s_row[:, None] * emb - s_e) * poison


def _batch_all_forward(embeddings: jnp.ndarray, labels: jnp.ndarray,
                       margin: float, max_positives=None):
    """Forward + the analytic-backward residuals (see custom VJP below).

    Returns ``(loss, stats, bwd_res)`` where ``bwd_res`` is
    ``(emb, k [B,K], m [B,B], denom, poison)`` on the grouped P-K fast
    path (the gradient is reconstructed from block-diagonal + dense
    matmuls — the [B, B] weight matrix W is never materialized) and
    ``(emb, w [B,B])`` on the generic rowblock-sort path.
    """
    sq = pairwise_sq_l2(embeddings)
    dist = jnp.sqrt(sq)
    pos_mask, neg_mask = _masks(labels)

    b = labels.shape[0]
    k_samples = (max_positives + 1) if max_positives is not None else None
    n_candidates = jnp.sum(
        jnp.sum(pos_mask, axis=1) * jnp.sum(neg_mask, axis=1))

    if _pk_is_fast_path(b, max_positives):
        # Passing max_positives ASSERTS the grouped P-K layout (same
        # convention as the parity modes above): the sort-free compare-
        # reduce path runs unconditionally and a violating batch poisons
        # loss/grad/stats with NaN. The previous lax.cond fallback to the
        # full rowblock cost ~0.8 ms/step at B=1024 on v5e (the cond is
        # an opaque fusion barrier to XLA — per-op trace r4,
        # docs/BENCHMARKS.md) and the Trainer already converts the poison
        # into a named host-side error on the first batch of every epoch
        # (train/loop.py:_check_pk_layout).
        fits = _pk_grouped(labels, k_samples)
        poison = jnp.where(fits, 1.0, jnp.nan)
        t_flat = _pk_group_thresholds(embeddings, margin, k_samples)
        pair_sum, k, m = _pk_counts(sq, neg_mask, t_flat)  # [B,K] x2, [B,B]
        # loss needs only the SUMS — the old block-diagonal placement of
        # pair_sum/k back to [B, B] re-tiled 134 MB per step for nothing
        # (probe-9 trace: the other ~2.9 ms of the kernel)
        active = jnp.sum(k)
        denom = jnp.maximum(active, 1.0)
        loss = (jnp.sum(pair_sum) / denom) * poison
        stats = _stats(dist, pos_mask, neg_mask, active.astype(jnp.int32),
                       n_candidates)
        # poison the logged stats too (parity-mode convention above): a
        # layout violation must show up in the same step's metrics
        stats = MiningStats(
            n_triplets=jnp.where(fits, stats.n_triplets, -1),
            n_candidates=jnp.where(fits, stats.n_candidates, -1),
            frac_mined=stats.frac_mined * poison,
            mean_pos_dist=stats.mean_pos_dist * poison,
            mean_neg_dist=stats.mean_neg_dist * poison)
        emb32 = embeddings.astype(jnp.float32)
        return loss, stats, (emb32, k, m, denom, poison)

    if b >= 2048:
        # Trace-time (fires once per compilation, not per step): the
        # generic-label rowblock-sort path is a measured 26x cliff at
        # scale — 60.5 ms vs 2.3 ms fwd+bwd at B=4096 on v5e
        # (docs/MINING.md "The general-label cliff"). The compare-reduce
        # fast path needs a per-anchor positive bound, which grouped P-K
        # batches provide.
        import warnings
        warnings.warn(
            f"batch_all_loss at B={b} without max_positives takes the "
            "generic rowblock-sort path: ~26x slower than the grouped "
            "P-K compare-reduce (60.5 vs 2.3 ms fwd+bwd at B=4096 on "
            "TPU v5e). Sample P-K batches (GENERATOR.k_samples) and "
            "pass max_positives=k_samples-1 for the fast path.",
            stacklevel=2)
    pair_sum, k, m = batch_all_rowblock(sq, pos_mask, neg_mask, margin)
    active = jnp.sum(k)
    denom = jnp.maximum(active, 1.0)
    loss = jnp.sum(pair_sum) / denom
    w = (k * pos_mask - m * neg_mask) / denom
    stats = _stats(dist, pos_mask, neg_mask, active.astype(jnp.int32),
                   n_candidates)
    return loss, stats, (embeddings.astype(jnp.float32), w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _batch_all_custom(embeddings, labels, margin, max_positives):
    loss, stats, _ = _batch_all_forward(embeddings, labels, margin,
                                        max_positives)
    return loss, stats


def _batch_all_fwd(embeddings, labels, margin, max_positives):
    loss, stats, bwd_res = _batch_all_forward(embeddings, labels, margin,
                                              max_positives)
    return (loss, stats), bwd_res


def _batch_all_bwd(margin, max_positives, residuals, cotangents):
    """Analytic gradient: ``loss_sum = sum_ab W[a,b] * sq[a,b]`` with W
    piecewise-constant in the embeddings, so with ``S = W + W^T``::

        dL/de = 2 * (rowsum(S) * e - S @ e)

    — MXU matmuls instead of autodiff through sort/scatter (which costs
    ~140 ms at B=1024 on TPU; this costs ~1 ms).

    On the grouped P-K path ``W = (Kbd - M) / denom`` splits into a
    block-diagonal positive part (per-pair active counts ``k``) and a
    dense negative part (per-negative dual counts ``m``), so ``S @ e``
    is two tiny [g, K, K] x [g, K, D] batched matmuls plus
    ``M @ e + M^T @ e`` — W (and its 67 MB transpose copy at B=4096) is
    never materialized; the transposed product contracts over the first
    axis via dot_general, no physical transpose.
    """
    g_loss, _g_stats = cotangents
    emb = residuals[0]
    b = emb.shape[0]
    if _pk_is_fast_path(b, max_positives):
        emb, k, m, denom, poison = residuals
        return (_structured_w_grad(emb, k, m, denom, poison,
                                   max_positives + 1, g_loss), None)

    emb, w = residuals
    s = w + w.T
    row = jnp.sum(s, axis=1, keepdims=True)
    grad_e = 2.0 * (row * emb - jnp.matmul(
        s, emb, preferred_element_type=jnp.float32))
    return (g_loss * grad_e, None)


_batch_all_custom.defvjp(_batch_all_fwd, _batch_all_bwd)


def batch_all_loss(embeddings: jnp.ndarray, labels: jnp.ndarray, *,
                   margin: float = 0.5, max_positives=None):
    """Exact batch-all triplet loss in O(B^2 log B) — no B^3 tensor.

    For anchor ``a`` let ``s_a`` be its negative squared distances sorted
    ascending (non-negatives replaced by +inf) with prefix sums ``P_a``.
    For each positive pair ``(a, p)`` with threshold ``t = sq_ap + margin``::

        sum_n max(t - sq_an, 0)  =  t * k - P_a[k],   k = #{n : sq_an < t}

    ``k`` comes from a vectorized ``searchsorted``. The gradient is
    analytic (custom VJP): per-pair triplet counts ``k`` and their dual
    per-negative counts ``m`` form a weight matrix ``W`` with
    ``d loss / d sq[a,b] = W[a,b]``; backpropagation to the embeddings is
    a single MXU matmul. Verified value+gradient against the naive O(B^3)
    oracle in ``tests/test_mining.py``.
    """
    # max_positives (P-K batches: k_samples - 1) enables the sort-free
    # grouped-P-K compare-reduce path (61 ms -> 2.7 ms at B=4096) and
    # ASSERTS the grouped layout — a violating batch NaN-poisons the
    # result (parity-mode convention; the Trainer's host-side
    # _check_pk_layout turns this into a named error).
    return _batch_all_custom(embeddings.astype(jnp.float32), labels,
                             margin, max_positives)


def mined_triplet_loss(embeddings: jnp.ndarray, labels: jnp.ndarray, *,
                       margin: float = 0.5, mode: str = "semihard",
                       rng: Optional[jax.Array] = None,
                       max_positives=None):
    """Dispatch to a mining strategy; returns ``(loss, MiningStats)``.

    ``mode`` accepts the reference's ``negatives_selection_mode`` values
    (``semihard`` / ``hardest`` / ``random_hard``,
    ``datagenerators.py:178-180``) plus ``batch_hard`` / ``batch_all``.
    ``rng`` is required for the stochastic parity modes. Parity modes at
    B > ``_PARITY_CUBE_MAX_B`` route to the O(B^2 log B) sorted-window
    implementation (:func:`parity_mined_loss_large`) — same selection
    semantics, analytic gradient, no [B,B,B] tensor.
    """
    b = labels.shape[0]
    if mode in ("semihard", "random_hard"):
        if rng is None:
            raise ValueError(f"mode={mode!r} requires an rng key")
        if b > _PARITY_CUBE_MAX_B:
            return parity_mined_loss_large(embeddings, labels, margin=margin,
                                           mode=mode, rng=rng,
                                           max_positives=max_positives)
        return _parity_mined_loss(embeddings, labels, margin=margin,
                                  mode=mode, rng=rng)
    if mode == "hardest":
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if b > _PARITY_CUBE_MAX_B:
            return parity_mined_loss_large(embeddings, labels, margin=margin,
                                           mode=mode, rng=rng,
                                           max_positives=max_positives)
        return _parity_mined_loss(embeddings, labels, margin=margin,
                                  mode=mode, rng=rng)
    if mode == "batch_hard":
        return batch_hard_loss(embeddings, labels, margin=margin)
    if mode == "batch_all":
        return batch_all_loss(embeddings, labels, margin=margin,
                              max_positives=max_positives)
    raise ValueError(f"unknown mining mode {mode!r}; valid: {ALL_MODES}")
