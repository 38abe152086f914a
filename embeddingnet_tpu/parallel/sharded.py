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
                           axis: str = "data"):
    """Build ``fn(embeddings, labels) -> (loss, MiningStats)`` where inputs
    are sharded on the batch axis and each device mines only its anchor
    rows. Exact same value/gradient as ``ops.mining.batch_all_loss``
    (asserted in ``tests/test_sharded.py``)."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False)
    def fn(emb_local: jnp.ndarray, labels_local: jnp.ndarray):
        # Embeddings are tiny relative to activations: all-gather rides ICI.
        emb = jax.lax.all_gather(emb_local, axis, tiled=True)      # [B, D]
        labels = jax.lax.all_gather(labels_local, axis, tiled=True)

        b_local = emb_local.shape[0]
        b = emb.shape[0]
        my = jax.lax.axis_index(axis)
        row0 = my * b_local
        row_ids = row0 + jnp.arange(b_local)

        sq = pairwise_sq_l2(emb_local, emb)                        # [bl, B]
        same = labels_local[:, None] == labels[None, :]
        self_mask = row_ids[:, None] == jnp.arange(b)[None, :]
        pos_mask = same & ~self_mask
        neg_mask = ~same

        # exact batch-all on local rows, gather-free (the TPU-fast merged
        # sort/unsort counting formulation of ops.mining._batch_all_forward;
        # vmapped searchsorted would serialize, gathers are ~5x slower than
        # sorts on TPU)
        neg_sq = jnp.where(neg_mask, sq, jnp.inf)
        t = jnp.where(pos_mask, sq + margin, -jnp.inf)
        merged = jnp.concatenate([neg_sq, t], axis=1)              # [bl, 2B]
        col_ids = jnp.broadcast_to(
            jnp.arange(2 * b, dtype=jnp.int32)[None, :], (b_local, 2 * b))
        vals_sorted, sorted_col = jax.lax.sort((merged, col_ids),
                                               dimension=1, num_keys=1)
        is_neg_sorted = (sorted_col < b).astype(sq.dtype)
        cum_cnt = jnp.cumsum(is_neg_sorted, axis=1) - is_neg_sorted
        neg_vals = jnp.where((sorted_col < b) & jnp.isfinite(vals_sorted),
                             vals_sorted, 0.0)
        cum_val = jnp.cumsum(neg_vals, axis=1) - neg_vals
        _, u_cnt, u_val = jax.lax.sort((sorted_col, cum_cnt, cum_val),
                                       dimension=1, num_keys=1)
        k = jnp.where(pos_mask, u_cnt[:, b:], 0.0)
        pair_sum = jnp.where(pos_mask,
                             jax.lax.stop_gradient(k) *
                             jnp.where(pos_mask, sq + margin, 0.0)
                             - u_val[:, b:],
                             0.0)

        num = jax.lax.psum(jnp.sum(pair_sum), axis)
        active = jax.lax.psum(jnp.sum(k), axis)
        loss = num / jnp.maximum(active, 1.0)

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
        return loss, stats

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
