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
            f"parity mining mode {mode!r} materializes a [B,B,B] candidate "
            f"tensor (B={b} -> {b ** 3 * 4 / 1e9:.1f} GB); reference-scale "
            f"batches only (k_classes*k_samples ~ 60). Use 'batch_hard' or "
            f"'batch_all' for production batch sizes.")
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


def batch_all_rowblock_compressed(sq: jnp.ndarray, pos_mask: jnp.ndarray,
                                  neg_mask: jnp.ndarray, margin: float,
                                  max_positives: int):
    """P-K-optimized variant of :func:`batch_all_rowblock`.

    P-K batches have at most ``k_samples - 1`` positive pairs per anchor,
    so the threshold side of the merged sort compresses from B columns to
    ``max_positives`` via ``top_k`` — the sort shrinks from [R, 2B] to
    [R, B + max_positives] (~2x less sort volume at large B). The
    per-pair counts are placed back to [R, B] with a cheap
    [R, B, max_positives] compare-reduce (only W needs positions; the
    loss itself needs only sums). REQUIRES every anchor to have at most
    ``max_positives`` positives — callers guard with ``lax.cond``.
    """
    r, b = sq.shape
    kp = max_positives
    neg_sq = jnp.where(neg_mask, sq, jnp.inf)              # [R, B]
    t = jnp.where(pos_mask, sq + margin, -jnp.inf)         # [R, B]
    t_top, t_idx = jax.lax.top_k(t, kp)                    # [R, kp]
    valid_t = t_top > -jnp.inf / 2

    merged = jnp.concatenate([neg_sq, t_top], axis=1)      # [R, B+kp]
    width = b + kp
    col_ids = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.int32)[None, :], (r, width))
    vals_sorted, sorted_col = jax.lax.sort((merged, col_ids), dimension=1,
                                           num_keys=1)
    is_neg_sorted = (sorted_col < b).astype(sq.dtype)
    cum_cnt = jnp.cumsum(is_neg_sorted, axis=1) - is_neg_sorted
    neg_vals = jnp.where((sorted_col < b) & jnp.isfinite(vals_sorted),
                         vals_sorted, 0.0)
    cum_val = jnp.cumsum(neg_vals, axis=1) - neg_vals
    is_t_sorted = 1.0 - is_neg_sorted
    cum_t = jnp.cumsum(is_t_sorted, axis=1) - is_t_sorted
    _, u_cnt, u_val, u_t = jax.lax.sort(
        (sorted_col, cum_cnt, cum_val, cum_t), dimension=1, num_keys=1)

    k_top = jnp.where(valid_t, u_cnt[:, b:], 0.0)          # [R, kp]
    p_top = u_val[:, b:]
    pair_sum_top = jnp.where(valid_t, k_top * t_top - p_top, 0.0)

    # m: thresholds strictly above each negative; invalid (-inf-padded)
    # compressed thresholds sort first, count kp - n_pos of them
    n_pos = jnp.sum(pos_mask, axis=1).astype(sq.dtype)     # [R]
    n_invalid_t = kp - n_pos
    t_below = u_t[:, :b]
    m = jnp.maximum(n_pos[:, None] - (t_below - n_invalid_t[:, None]), 0.0)
    m = jnp.where(neg_mask, m, 0.0)

    # place per-pair values back to original positions (W needs them):
    # k[a, p] = sum_j [t_idx[a, j] == p] * k_top[a, j]
    place = (t_idx[:, None, :] ==
             jnp.arange(b, dtype=jnp.int32)[None, :, None])  # [R, B, kp]
    place = place & valid_t[:, None, :]
    k = jnp.einsum("rbk,rk->rb", place.astype(sq.dtype), k_top)
    pair_sum = jnp.einsum("rbk,rk->rb", place.astype(sq.dtype),
                          pair_sum_top)
    return pair_sum, k, m


def _batch_all_forward(embeddings: jnp.ndarray, labels: jnp.ndarray,
                       margin: float, max_positives=None):
    """Forward + the analytic weight matrix W (see custom VJP below)."""
    sq = pairwise_sq_l2(embeddings)
    dist = jnp.sqrt(sq)
    pos_mask, neg_mask = _masks(labels)

    if max_positives is not None and max_positives < labels.shape[0]:
        # runtime guard: if any anchor has more positives than the P-K
        # bound (non-P-K labels), fall back to the full path
        fits = jnp.max(jnp.sum(pos_mask, axis=1)) <= max_positives
        pair_sum, k, m = jax.lax.cond(
            fits,
            lambda args: batch_all_rowblock_compressed(
                *args, margin, max_positives),
            lambda args: batch_all_rowblock(*args, margin),
            (sq, pos_mask, neg_mask))
    else:
        pair_sum, k, m = batch_all_rowblock(sq, pos_mask, neg_mask, margin)

    active = jnp.sum(k)
    loss = jnp.sum(pair_sum) / jnp.maximum(active, 1.0)

    denom = jnp.maximum(active, 1.0)
    w = (k * pos_mask - m * neg_mask) / denom

    n_candidates = jnp.sum(
        jnp.sum(pos_mask, axis=1) * jnp.sum(neg_mask, axis=1))
    stats = _stats(dist, pos_mask, neg_mask, active.astype(jnp.int32),
                   n_candidates)
    return loss, stats, w


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _batch_all_custom(embeddings, labels, margin, max_positives):
    loss, stats, _ = _batch_all_forward(embeddings, labels, margin,
                                        max_positives)
    return loss, stats


def _batch_all_fwd(embeddings, labels, margin, max_positives):
    loss, stats, w = _batch_all_forward(embeddings, labels, margin,
                                        max_positives)
    return (loss, stats), (embeddings.astype(jnp.float32), w)


def _batch_all_bwd(margin, max_positives, residuals, cotangents):
    """Analytic gradient: ``loss_sum = sum_ab W[a,b] * sq[a,b]`` with W
    piecewise-constant in the embeddings, so with ``S = W + W^T``::

        dL/de = 2 * (rowsum(S) * e - S @ e)

    — one [B,B]x[B,D] matmul on the MXU instead of autodiff through
    sort/scatter (which costs ~140 ms at B=1024 on TPU; this costs ~1 ms).
    """
    g_loss, _g_stats = cotangents
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
    # max_positives (P-K batches: k_samples - 1) enables the compressed
    # threshold-top-k sort (~2x less sort volume at large B) with a
    # runtime fallback to the full path if any anchor exceeds it.
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
    ``rng`` is required for the stochastic parity modes.
    """
    if mode in ("semihard", "random_hard"):
        if rng is None:
            raise ValueError(f"mode={mode!r} requires an rng key")
        return _parity_mined_loss(embeddings, labels, margin=margin,
                                  mode=mode, rng=rng)
    if mode == "hardest":
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return _parity_mined_loss(embeddings, labels, margin=margin,
                                  mode=mode, rng=rng)
    if mode == "batch_hard":
        return batch_hard_loss(embeddings, labels, margin=margin)
    if mode == "batch_all":
        return batch_all_loss(embeddings, labels, margin=margin,
                              max_positives=max_positives)
    raise ValueError(f"unknown mining mode {mode!r}; valid: {ALL_MODES}")
