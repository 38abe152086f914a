"""Fused pairwise-distance + batch-hard mining as a Pallas TPU kernel.

The jnp path (``ops.mining.batch_hard_loss``) materializes the B x B
squared-distance matrix in HBM between the Gram matmul and the masked
reductions. This kernel tiles the matrix: for each (anchor-tile,
candidate-tile) grid cell it computes the distance tile on the MXU in
VMEM, updates running hardest-positive / hardest-negative value+index
accumulators, and never writes a distance to HBM — at B=4096 that is
64 MB of HBM traffic per step saved, and the reductions fuse into the
matmul pipeline.

Gradients: the kernel returns *indices* (selection is piecewise-constant);
the differentiable loss recomputes the two selected distances per anchor
from the embeddings by gather — O(B·D) — so autodiff never sees the
kernel. Values returned by the kernel equal the recomputed ones (asserted
in tests).

Grid iteration order on TPU is sequential minor-last, so the candidate
axis (dim 1) can accumulate into VMEM scratch across grid steps; the
output block index map ignores dim 1 (same block revisited), with
``@pl.when(j == 0)`` initialising and ``j == last`` writing out —
the standard Pallas accumulation pattern.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plain Python floats: jnp scalars at module scope would be captured
# consts, which pallas_call rejects
NEG_INF = -3.0e38
POS_INF = 3.0e38


def _mining_kernel(a_ref, b_ref, la_ref, lb_ref,
                   hp_val_ref, hp_idx_ref, hn_val_ref, hn_idx_ref,
                   acc_hp_val, acc_hp_idx, acc_hn_val, acc_hn_idx):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    ta = a_ref.shape[0]
    tn = b_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_hp_val[:] = jnp.full((ta, 1), NEG_INF, jnp.float32)
        acc_hp_idx[:] = jnp.zeros((ta, 1), jnp.int32)
        acc_hn_val[:] = jnp.full((ta, 1), POS_INF, jnp.float32)
        acc_hn_idx[:] = jnp.zeros((ta, 1), jnp.int32)

    a = a_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    gram = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    a_sq = jnp.sum(a * a, axis=1, keepdims=True)            # [TA, 1]
    b_sq = jnp.sum(b * b, axis=1, keepdims=True).T          # [1, TN]
    d2 = jnp.maximum(a_sq + b_sq - 2.0 * gram, 0.0)         # [TA, TN]

    la = la_ref[:]                                          # [TA, 1] int32
    lb = lb_ref[:]                                          # [TN, 1] int32
    same = la == lb.T                                       # [TA, TN]
    row_ids = i * ta + jax.lax.broadcasted_iota(jnp.int32, (ta, tn), 0)
    col_ids = j * tn + jax.lax.broadcasted_iota(jnp.int32, (ta, tn), 1)
    is_self = row_ids == col_ids

    pos_cand = jnp.where(same & ~is_self, d2, NEG_INF)
    neg_cand = jnp.where(~same, d2, POS_INF)

    tile_hp = jnp.max(pos_cand, axis=1, keepdims=True)      # [TA, 1]
    tile_hp_idx = (j * tn
                   + jnp.argmax(pos_cand, axis=1).astype(jnp.int32)
                   )[:, None]
    tile_hn = jnp.min(neg_cand, axis=1, keepdims=True)
    tile_hn_idx = (j * tn
                   + jnp.argmin(neg_cand, axis=1).astype(jnp.int32)
                   )[:, None]

    better_p = tile_hp > acc_hp_val[:]
    acc_hp_idx[:] = jnp.where(better_p, tile_hp_idx, acc_hp_idx[:])
    acc_hp_val[:] = jnp.where(better_p, tile_hp, acc_hp_val[:])
    better_n = tile_hn < acc_hn_val[:]
    acc_hn_idx[:] = jnp.where(better_n, tile_hn_idx, acc_hn_idx[:])
    acc_hn_val[:] = jnp.where(better_n, tile_hn, acc_hn_val[:])

    @pl.when(j == n_j - 1)
    def _():
        hp_val_ref[:] = acc_hp_val[:]
        hp_idx_ref[:] = acc_hp_idx[:]
        hn_val_ref[:] = acc_hn_val[:]
        hn_idx_ref[:] = acc_hn_idx[:]


@functools.partial(jax.jit, static_argnames=("tile_a", "tile_n",
                                             "interpret"))
def fused_hard_indices(embeddings: jnp.ndarray, labels: jnp.ndarray, *,
                       tile_a: int = 512, tile_n: int = 512,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                  jnp.ndarray]:
    """Per-anchor (hardest_pos_d2, hardest_pos_idx, hardest_neg_d2,
    hardest_neg_idx) via the fused kernel. B must divide by the tiles
    (P-K batches are powers of two in practice; callers pad otherwise).
    """
    b, d = embeddings.shape
    tile_a = min(tile_a, b)
    tile_n = min(tile_n, b)
    if b % tile_a or b % tile_n:
        raise ValueError(f"batch {b} not divisible by tiles "
                         f"({tile_a}, {tile_n})")
    labels2 = labels.astype(jnp.int32).reshape(b, 1)
    grid = (b // tile_a, b // tile_n)

    out_shape = [
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
    ]
    out_spec = pl.BlockSpec((tile_a, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    hp_val, hp_idx, hn_val, hn_idx = pl.pallas_call(
        _mining_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_a, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_a, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_a, 1), jnp.float32),
            pltpu.VMEM((tile_a, 1), jnp.int32),
            pltpu.VMEM((tile_a, 1), jnp.float32),
            pltpu.VMEM((tile_a, 1), jnp.int32),
        ],
        interpret=interpret,
    )(embeddings, embeddings, labels2, labels2)
    return (hp_val[:, 0], hp_idx[:, 0], hn_val[:, 0], hn_idx[:, 0])


def pallas_batch_hard_loss(embeddings: jnp.ndarray, labels: jnp.ndarray, *,
                           margin: float = 0.5, tile_a: int = 512,
                           tile_n: int = 512, interpret: bool = False):
    """Batch-hard loss on the fused kernel — same semantics as
    ``ops.mining.batch_hard_loss`` (loss only; use that for full stats).

    Differentiable: selection indices come from the kernel under
    stop-gradient; the two chosen distances are recomputed from
    ``embeddings`` by gather, so grads flow exactly like the jnp version's
    (max/min subgradient picks the same winner).
    """
    emb32 = embeddings.astype(jnp.float32)
    hp_val, hp_idx, hn_val, hn_idx = fused_hard_indices(
        jax.lax.stop_gradient(emb32), labels, tile_a=tile_a, tile_n=tile_n,
        interpret=interpret)
    valid = (hp_val > NEG_INF / 2) & (hn_val < POS_INF / 2)

    pos = jnp.sum(jnp.square(emb32 - emb32[hp_idx]), axis=1)
    neg = jnp.sum(jnp.square(emb32 - emb32[hn_idx]), axis=1)
    per_anchor = jnp.where(valid, jnp.maximum(pos - neg + margin, 0.0), 0.0)
    n_valid = jnp.sum(valid)
    return jnp.sum(per_anchor) / jnp.maximum(n_valid, 1)
