"""Sharded train steps and distributed mining.

Two levels:

* :func:`shard_train_step` — GSPMD path: jit any step from
  ``train.steps`` with batch sharded over ``data`` and state replicated;
  XLA partitions the convs over local shards and inserts the all-gather
  the B x B distance matrix needs. Zero custom code, solid perf.
* :func:`sharded_batch_all_loss` — explicit ``shard_map`` mining for the
  large-batch regime (SURVEY.md §2.3): all-gather the (small) embedding
  matrix over ICI, compute only the **local anchor-row block** of the
  distance matrix per device (memory B/d x B instead of B x B), run the
  exact O(B^2 log B) batch-all reduction per row block, psum the scalar
  numerator/denominator. The metric-learning cousin of ring attention:
  blockwise distances, global reduction, nothing B x B ever materialized
  on one chip.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from embeddingnet_tpu.ops.distances import pairwise_sq_l2
from embeddingnet_tpu.ops.mining import MiningStats


def shard_train_step(step_fn: Callable, mesh: Mesh, *, donate: bool = True,
                     n_batch_args: int = 2):
    """Jit ``step_fn(state, *batch) -> (state, metrics)`` over the mesh:
    state replicated, each batch arg sharded on its leading axis."""
    state_sharding = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P("data"))
    in_shardings = (state_sharding,) + (batch_sharding,) * n_batch_args
    return jax.jit(step_fn,
                   in_shardings=in_shardings,
                   out_shardings=(state_sharding, state_sharding),
                   donate_argnums=(0,) if donate else ())


def sharded_batch_all_loss(mesh: Mesh, *, margin: float = 0.5,
                           axis: str = "data", max_positives=None):
    """Build ``fn(embeddings, labels) -> (loss, MiningStats)`` where inputs
    are sharded on the batch axis and each device mines only its anchor
    rows. Exact same value/gradient as ``ops.mining.batch_all_loss``
    (asserted in ``tests/test_sharded.py``).

    The gradient is the analytic weight-matrix form (docs/MINING.md) as a
    custom VJP over shard_map — autodiff through the per-shard sorts
    would emit scatter-heavy backwards. The backward's cross-shard terms
    (column sums of W and ``W^T e``) are psums of local-row partials.

    ``max_positives`` (= k_samples - 1 for P-K batches) enables the
    sort-free compare-reduce counting (the same [bl, B, K] compare as
    ``ops.mining._pk_counts``; 61 -> 9.4 -> 2.7 ms at B=4096
    single-chip across r2/r4) and ASSERTS that every shard's rows are
    whole same-class groups: a psum'd predicate NaN-poisons the result
    on violation (r4 — same convention as the single-device path; the
    former lax.cond fallback was a fusion barrier).

    r4 structure (mirrors the single-device reshape-free rewrite,
    docs/MINING.md): per-pair thresholds come from the local
    embeddings' [gl, K, D] batched Gram matmul — not from re-tiling the
    [bl, B] distance block — the loss consumes the natural [bl, K]
    sums, and the backward reconstructs ``S @ e`` from structure. Since
    every group is whole within its shard, the block-diagonal positive
    part of W touches ONLY the shard's own columns, so its
    colsum / W^T e contributions need no collective at all; only the
    dense negative part (``m``) is psum'd.
    """

    def _local_masks(emb_local, labels_local):
        emb = jax.lax.all_gather(emb_local, axis, tiled=True)      # [B, D]
        labels = jax.lax.all_gather(labels_local, axis, tiled=True)
        b_local = emb_local.shape[0]
        b = emb.shape[0]
        row0 = jax.lax.axis_index(axis) * b_local
        row_ids = row0 + jnp.arange(b_local)
        sq = pairwise_sq_l2(emb_local, emb)                        # [bl, B]
        same = labels_local[:, None] == labels[None, :]
        self_mask = row_ids[:, None] == jnp.arange(b)[None, :]
        pos_mask = same & ~self_mask
        neg_mask = ~same
        return sq, pos_mask, neg_mask

    def _stats_psum(sq, pos_mask, neg_mask, active):
        dist = jnp.sqrt(sq)
        pos_cnt = jax.lax.psum(jnp.sum(pos_mask), axis)
        neg_cnt = jax.lax.psum(jnp.sum(neg_mask), axis)
        n_candidates = jax.lax.psum(
            jnp.sum(jnp.sum(pos_mask, axis=1) * jnp.sum(neg_mask, axis=1)),
            axis)
        return MiningStats(
            n_triplets=active,
            n_candidates=n_candidates,
            frac_mined=active.astype(jnp.float32)
            / jnp.maximum(n_candidates.astype(jnp.float32), 1.0),
            mean_pos_dist=jax.lax.psum(jnp.sum(dist * pos_mask), axis)
            / jnp.maximum(pos_cnt, 1),
            mean_neg_dist=jax.lax.psum(jnp.sum(dist * neg_mask), axis)
            / jnp.maximum(neg_cnt, 1),
        )

    # -- grouped P-K fast path: structured residuals, no W ------------------

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=((P(), P()), (P(axis), P(axis), P())),
        check_vma=False)
    def _fwd_sm_pk(emb_local, labels_local):
        from embeddingnet_tpu.ops.mining import (_pk_counts,
                                                 _pk_group_thresholds)
        kk = max_positives + 1
        sq, pos_mask, neg_mask = _local_masks(emb_local, labels_local)
        b_local = emb_local.shape[0]
        # grouped P-K with groups whole within this shard; AND the
        # predicate across shards so every device agrees. As in the
        # single-device path (ops/mining.py, r4), max_positives ASSERTS
        # the layout: the P-K path runs unconditionally and a violating
        # batch NaN-poisons counts -> loss, stats AND the gradient
        # residuals (the Trainer guards the layout host-side).
        blocks = labels_local.reshape(b_local // kk, kk)
        local_ok = (jnp.all(blocks == blocks[:, :1])
                    & jnp.all(jnp.sum(pos_mask, axis=1) == kk - 1))
        all_ok = jax.lax.psum((~local_ok).astype(jnp.int32), axis) == 0
        poison = jnp.where(all_ok, 1.0, jnp.nan).astype(sq.dtype)

        t_flat = _pk_group_thresholds(emb_local.astype(jnp.float32),
                                      margin, kk)
        pair_sum, k, m = _pk_counts(sq, neg_mask, t_flat)
        active_clean = jax.lax.psum(jnp.sum(k), axis)
        pair_sum = pair_sum * poison                               # [bl, K]
        k = k * poison                                             # [bl, K]
        m = m * poison                                             # [bl, B]

        num = jax.lax.psum(jnp.sum(pair_sum), axis)
        active = active_clean * poison
        loss = num / jnp.maximum(active, 1.0)
        # Stats mirror the single-device sentinel convention (r5, ADVICE
        # r4): integer counts -> -1 on violation, float stats -> NaN, so
        # downstream metric logging sees one type/value per failure mode
        # on both paths (ops/mining.py:329).
        stats = _stats_psum(sq, pos_mask, neg_mask,
                            jnp.where(all_ok, active_clean, -1.0))
        stats = MiningStats(
            n_triplets=stats.n_triplets,
            n_candidates=jnp.where(all_ok, stats.n_candidates, -1),
            frac_mined=stats.frac_mined * poison,
            mean_pos_dist=stats.mean_pos_dist * poison,
            mean_neg_dist=stats.mean_neg_dist * poison)
        return (loss, stats), (k, m, jnp.maximum(active, 1.0))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False)
    def _bwd_sm_pk(k, m, emb_local, active, g_loss):
        # W = (Kbd - M) / active with Kbd block-diagonal inside this
        # shard's own row x column square (groups are whole per shard),
        # M = dense [bl, B] negative counts. dL/de_c =
        # 2[(rowsum_c + colsum_c) e_c - (W e)_c - (W^T e)_c]: every Kbd
        # term is local (its columns ARE this shard's rows); only M's
        # column sums and M^T e cross shards -> two psums.
        emb = jax.lax.all_gather(emb_local, axis, tiled=True)      # [B, D]
        b_local, d = emb_local.shape
        kk = max_positives + 1
        gl = b_local // kk
        row0 = jax.lax.axis_index(axis) * b_local

        eg = emb_local.reshape(gl, kk, d)
        k_blk = k.reshape(gl, kk, kk)
        pos_mv = (jnp.einsum("gij,gjd->gid", k_blk, eg)
                  + jnp.einsum("gji,gjd->gid", k_blk, eg)).reshape(
                      b_local, d)
        pos_row = (jnp.sum(k_blk, axis=2)
                   + jnp.sum(k_blk, axis=1)).reshape(b_local)

        neg_we = jnp.matmul(m, emb, preferred_element_type=jnp.float32)
        neg_col = jax.lax.psum(jnp.sum(m, axis=0), axis)           # [B]
        neg_wte = jax.lax.psum(
            jnp.einsum("ab,ad->bd", m, emb_local,
                       preferred_element_type=jnp.float32), axis)  # [B, D]
        neg_mv = neg_we + jax.lax.dynamic_slice(
            neg_wte, (row0, 0), (b_local, d))
        neg_row = (jnp.sum(m, axis=1)
                   + jax.lax.dynamic_slice_in_dim(neg_col, row0, b_local))

        s_e = (pos_mv - neg_mv) / active
        s_row = (pos_row - neg_row) / active
        return g_loss * 2.0 * (s_row[:, None] * emb_local - s_e)

    # -- generic rowblock-sort path: dense local W rows ----------------------

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=((P(), P()), P(axis)),
        check_vma=False)
    def _fwd_sm_dense(emb_local, labels_local):
        from embeddingnet_tpu.ops.mining import batch_all_rowblock
        sq, pos_mask, neg_mask = _local_masks(emb_local, labels_local)
        pair_sum, k, m = batch_all_rowblock(sq, pos_mask, neg_mask, margin)
        num = jax.lax.psum(jnp.sum(pair_sum), axis)
        active = jax.lax.psum(jnp.sum(k), axis)
        loss = num / jnp.maximum(active, 1.0)
        # local W rows, normalized by the global active count
        w_local = (k * pos_mask - m * neg_mask) / jnp.maximum(active, 1.0)
        stats = _stats_psum(sq, pos_mask, neg_mask, active)
        return (loss, stats), w_local

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False)
    def _bwd_sm_dense(w_local, emb_local, g_loss):
        # dL/de_c = 2[(rowsum_c + colsum_c) e_c - (W e)_c - (W^T e)_c];
        # local rows give rowsum and W@e directly; colsum and W^T e need
        # contributions from every shard's rows -> psum of partials.
        emb = jax.lax.all_gather(emb_local, axis, tiled=True)      # [B, D]
        b_local = emb_local.shape[0]
        row0 = jax.lax.axis_index(axis) * b_local

        rowsum = jnp.sum(w_local, axis=1)                          # [bl]
        we = jnp.matmul(w_local, emb,
                        preferred_element_type=jnp.float32)        # [bl, D]
        colsum = jax.lax.psum(jnp.sum(w_local, axis=0), axis)      # [B]
        wte = jax.lax.psum(
            jnp.matmul(w_local.T, emb_local,
                       preferred_element_type=jnp.float32), axis)  # [B, D]
        colsum_local = jax.lax.dynamic_slice_in_dim(colsum, row0, b_local)
        wte_local = jax.lax.dynamic_slice_in_dim(wte, row0, b_local)
        grad = 2.0 * ((rowsum + colsum_local)[:, None] * emb_local
                      - we - wte_local)
        return g_loss * grad

    n_dev = mesh.shape[axis]

    def _pk_applicable(b: int) -> bool:
        kk = (max_positives + 1) if max_positives is not None else None
        b_local = b // n_dev
        return bool(kk and 1 < kk < b_local and b_local % kk == 0)

    @jax.custom_vjp
    def fn(emb, labels):
        fwd = _fwd_sm_pk if _pk_applicable(emb.shape[0]) else _fwd_sm_dense
        out, _res = fwd(emb.astype(jnp.float32), labels)
        return out

    def fn_fwd(emb, labels):
        emb32 = emb.astype(jnp.float32)
        if _pk_applicable(emb.shape[0]):
            out, (k, m, active) = _fwd_sm_pk(emb32, labels)
            return out, (k, m, active, emb32)
        out, w = _fwd_sm_dense(emb32, labels)
        return out, (w, emb32)

    def fn_bwd(residuals, cotangents):
        (g_loss, _g_stats) = cotangents
        if len(residuals) == 4:
            k, m, active, emb32 = residuals
            return _bwd_sm_pk(k, m, emb32, active, g_loss), None
        w, emb32 = residuals
        return _bwd_sm_dense(w, emb32, g_loss), None

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


def sharded_batch_hard_loss(mesh: Mesh, *, margin: float = 0.5,
                            axis: str = "data"):
    """Row-parallel batch-hard: per-anchor max/min are local after the
    embedding all-gather; only the scalar mean needs a psum."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False)
    def fn(emb_local: jnp.ndarray, labels_local: jnp.ndarray):
        emb = jax.lax.all_gather(emb_local, axis, tiled=True)
        labels = jax.lax.all_gather(labels_local, axis, tiled=True)
        b_local = emb_local.shape[0]
        my = jax.lax.axis_index(axis)
        row_ids = my * b_local + jnp.arange(b_local)

        sq = pairwise_sq_l2(emb_local, emb)
        same = labels_local[:, None] == labels[None, :]
        self_mask = row_ids[:, None] == jnp.arange(emb.shape[0])[None, :]
        pos_mask = same & ~self_mask
        neg_mask = ~same

        hardest_pos = jnp.max(jnp.where(pos_mask, sq, -jnp.inf), axis=1)
        hardest_neg = jnp.min(jnp.where(neg_mask, sq, jnp.inf), axis=1)
        valid = jnp.any(pos_mask, axis=1) & jnp.any(neg_mask, axis=1)
        per_anchor = jnp.where(
            valid, jnp.maximum(hardest_pos - hardest_neg + margin, 0.0), 0.0)
        num = jax.lax.psum(jnp.sum(per_anchor), axis)
        den = jax.lax.psum(jnp.sum(valid), axis)
        return num / jnp.maximum(den, 1)

    return fn
