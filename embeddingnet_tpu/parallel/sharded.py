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
    sort-free compare-reduce counting (``ops.mining.batch_all_rowblock_pk``,
    61 ms -> 9.4 ms at B=4096 single-chip) and ASSERTS that every shard's
    rows are whole same-class groups: a psum'd predicate NaN-poisons the
    result on violation (r4 — same convention as the single-device path;
    the former lax.cond fallback was a fusion barrier).
    """

    def _local_counts(emb_local, labels_local):
        from embeddingnet_tpu.ops.mining import (
            batch_all_rowblock, _pk_block_diag_thresholds, _pk_counts,
            _pk_place_grouped)
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

        kk = (max_positives + 1) if max_positives is not None else None
        if kk and 1 < kk < b_local and b_local % kk == 0:
            # grouped P-K with groups whole within this shard; AND the
            # predicate across shards so every device agrees. As in the
            # single-device path (ops/mining.py, r4), max_positives
            # ASSERTS the layout: the P-K path runs unconditionally and a
            # violating batch NaN-poisons the counts (the former lax.cond
            # fallback was a fusion barrier costing ~0.8 ms/step at
            # B=1024 single-chip; the Trainer guards the layout host-side)
            blocks = labels_local.reshape(b_local // kk, kk)
            local_ok = (jnp.all(blocks == blocks[:, :1])
                        & jnp.all(jnp.sum(pos_mask, axis=1) == kk - 1))
            all_ok = jax.lax.psum((~local_ok).astype(jnp.int32), axis) == 0
            poison = jnp.where(all_ok, 1.0, jnp.nan).astype(sq.dtype)

            sq_local = jax.lax.dynamic_slice(
                sq, (0, row0), (b_local, b_local))
            t_flat = _pk_block_diag_thresholds(sq_local, margin, kk)
            pair_sum, k, m = _pk_counts(sq, neg_mask, t_flat)
            pair_sum = _pk_place_grouped(pair_sum, kk, b, row0) * poison
            k = _pk_place_grouped(k, kk, b, row0) * poison
            m = m * poison
        else:
            pair_sum, k, m = batch_all_rowblock(sq, pos_mask, neg_mask,
                                                margin)
        return sq, pos_mask, neg_mask, pair_sum, k, m, emb, row_ids

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=((P(), P()), P(axis)),
        check_vma=False)
    def _fwd_sm(emb_local, labels_local):
        sq, pos_mask, neg_mask, pair_sum, k, m, _emb, _rows = \
            _local_counts(emb_local, labels_local)
        num = jax.lax.psum(jnp.sum(pair_sum), axis)
        active = jax.lax.psum(jnp.sum(k), axis)
        loss = num / jnp.maximum(active, 1.0)
        # local W rows, normalized by the global active count
        w_local = (k * pos_mask - m * neg_mask) / jnp.maximum(active, 1.0)

        dist = jnp.sqrt(sq)
        pos_cnt = jax.lax.psum(jnp.sum(pos_mask), axis)
        neg_cnt = jax.lax.psum(jnp.sum(neg_mask), axis)
        n_candidates = jax.lax.psum(
            jnp.sum(jnp.sum(pos_mask, axis=1) * jnp.sum(neg_mask, axis=1)),
            axis)
        stats = MiningStats(
            n_triplets=active,
            n_candidates=n_candidates,
            frac_mined=active.astype(jnp.float32)
            / jnp.maximum(n_candidates.astype(jnp.float32), 1.0),
            mean_pos_dist=jax.lax.psum(jnp.sum(dist * pos_mask), axis)
            / jnp.maximum(pos_cnt, 1),
            mean_neg_dist=jax.lax.psum(jnp.sum(dist * neg_mask), axis)
            / jnp.maximum(neg_cnt, 1),
        )
        return (loss, stats), w_local

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False)
    def _bwd_sm(w_local, emb_local, g_loss):
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

    @jax.custom_vjp
    def fn(emb, labels):
        out, _w = _fwd_sm(emb.astype(jnp.float32), labels)
        return out

    def fn_fwd(emb, labels):
        emb32 = emb.astype(jnp.float32)
        out, w = _fwd_sm(emb32, labels)
        return out, (w, emb32)

    def fn_bwd(residuals, cotangents):
        (g_loss, _g_stats) = cotangents
        w, emb32 = residuals
        return _bwd_sm(w, emb32, g_loss), None

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
