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
    dist = pairwise_l2(embeddings)            # euclidean — selection metric
    sq = pairwise_sq_l2(embeddings)           # squared  — loss metric
    pos_mask, neg_mask = _masks(labels)

    b = labels.shape[0]
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


def batch_all_loss(embeddings: jnp.ndarray, labels: jnp.ndarray, *,
                   margin: float = 0.5):
    """Exact batch-all triplet loss in O(B^2 log B) — no B^3 tensor.

    For anchor ``a`` let ``s_a`` be its negative squared distances sorted
    ascending (non-negatives replaced by +inf) with prefix sums ``P_a``.
    For each positive pair ``(a, p)`` with threshold ``t = sq_ap + margin``::

        sum_n max(t - sq_an, 0)  =  t * k - P_a[k],   k = #{n : sq_an < t}

    ``k`` comes from a vectorized ``searchsorted``. Autodiff through
    sort/cumsum/gather yields the exact gradient: d/d sq_ap = k (one per
    active triplet) and d/d sq_an = -1 for active negatives, matching the
    naive form (verified in ``tests/test_mining.py``).
    """
    sq = pairwise_sq_l2(embeddings)
    dist = jnp.sqrt(sq)
    pos_mask, neg_mask = _masks(labels)
    b = labels.shape[0]

    neg_sq = jnp.where(neg_mask, sq, jnp.inf)              # [B, B]
    s = jnp.sort(neg_sq, axis=1)                           # ascending
    # Prefix sums with a leading zero; inf tail never enters a gathered sum
    # because k never exceeds the finite count.
    p = jnp.concatenate(
        [jnp.zeros((b, 1), sq.dtype),
         jnp.cumsum(jnp.where(jnp.isfinite(s), s, 0.0), axis=1)], axis=1)

    t = jnp.where(pos_mask, sq + margin, -jnp.inf)         # [B(a), B(p)]
    # k[a, p] = #negatives of a strictly below t  (hinge > 0)
    k = jax.vmap(lambda row_s, row_t: jnp.searchsorted(row_s, row_t,
                                                       side="left"))(s, t)
    k = jnp.where(pos_mask, k, 0)
    gathered = jnp.take_along_axis(p, k, axis=1)           # P_a[k]
    pair_sum = jnp.where(pos_mask,
                         jax.lax.stop_gradient(k.astype(sq.dtype))
                         * jnp.where(pos_mask, sq + margin, 0.0) - gathered,
                         0.0)

    active = jnp.sum(k)
    loss = jnp.sum(pair_sum) / jnp.maximum(active, 1)
    # Exact candidate count: sum over a of n_pos(a) * n_neg(a).
    n_candidates = jnp.sum(
        jnp.sum(pos_mask, axis=1) * jnp.sum(neg_mask, axis=1))
    stats = _stats(dist, pos_mask, neg_mask, active, n_candidates)
    return loss, stats


@functools.partial(jax.jit, static_argnames=("margin", "mode"))
def _jitted_mined(embeddings, labels, rng, margin: float, mode: str):
    return mined_triplet_loss(embeddings, labels, margin=margin, mode=mode,
                              rng=rng)


def mined_triplet_loss(embeddings: jnp.ndarray, labels: jnp.ndarray, *,
                       margin: float = 0.5, mode: str = "semihard",
                       rng: Optional[jax.Array] = None):
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
        return batch_all_loss(embeddings, labels, margin=margin)
    raise ValueError(f"unknown mining mode {mode!r}; valid: {ALL_MODES}")
