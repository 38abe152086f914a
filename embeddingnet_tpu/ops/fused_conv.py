"""Pallas small-spatial 3x3 conv for the ResNet stage bottlenecks.

STATUS (r4): **experiment, CUT from production** — the kernels win
standalone (1.28x fwd on the stage-4 conv) but the full train step
measured 0.796x plain / 0.809x augmented vs XLA convs on the real chip
(`tools/pallas_conv_ab.py`; trace decomposition in docs/BENCHMARKS.md
"End-to-end verdict (r4)": +30.8 ms of pallas_call time and +17.4 ms of
lost XLA fusion against −13.3 ms of absorbed BN traffic, plus pad/copy
boundary costs). `PERFORMANCE.pallas_conv` defaults off and no shipped
config arms it; the stack stays tested for future toolchain revisions.

Production follow-up to the r3 go/no-go experiment
(``tools/pallas_fused_conv.py``, docs/BENCHMARKS.md "the stage-4
experiment"): XLA's ``lax.conv_general_dilated`` runs the late-stage
3x3 convs of the headline ResNet-50 @64px at ~8 TFLOP/s (2x2 and 4x4
spatial), while the same contraction expressed as 9 shifted-tap
[B*S*S, Cin] @ [Cin, Cout] MXU matmuls reaches ~10+ TFLOP/s — the win
is a better conv *algorithm* for tiny spatial sizes, not memory fusion.

This module generalizes the prototype into a differentiable drop-in:

* :func:`conv3x3_small` — custom-VJP conv, stride 1, SAME (pad 1).
  Forward and input-gradient share one Pallas kernel (dgrad of a
  stride-1 SAME 3x3 conv *is* a stride-1 SAME 3x3 conv with spatially
  flipped, in/out-transposed weights); the weight gradient is a second
  kernel accumulating 9 ``[Cin, B*S*S] @ [B*S*S, Cout]`` matmuls across
  sequential grid steps (TPU grids are sequential, so revisiting the
  output block accumulates correctly).
* :func:`conv3x3_small_mixed` — XLA forward + Pallas backward, for the
  8x8 maps where the per-direction winners split.
* :func:`conv3x3_small_spmd` / :func:`conv3x3_small_mixed_spmd` — the
  same ops wrapped in ``jax.experimental.custom_partitioning`` so they
  compose with a GSPMD-sharded train step: the conv and its dgrad are
  batch-parallel (the batch sharding passes straight through, no
  gathers), and the weight gradient runs per-shard with one ``psum``
  over the batch mesh axes. Used by the Trainer when a >1-device mesh
  is active; per-shard shapes that fall outside the Pallas gate fall
  back to the XLA conv inside the partitioned lowering.
* :func:`conv3x3_small_bn_relu` (+ ``_spmd``) — the r3 fusion
  experiment productionized (docs/BENCHMARKS.md "the stage-4
  experiment" measured 1.28x for fusing the BN epilogue): the
  *previous* BatchNorm's affine apply + ReLU folded into the conv's
  prologue, so the normalized activation ``z = relu(y*scale + bias)``
  is computed in VMEM and never round-trips HBM. Training-correct: the
  batch statistics (and their gradient) stay outside in XLA — the op
  takes the raw pre-BN activation ``y`` plus the per-channel effective
  ``scale``/``bias`` and differentiates through all four inputs.
* :class:`FastConv3x3` — ``nn.Conv``-compatible Flax module (same
  ``kernel`` param name/shape/init, no bias) that dispatches to the
  Pallas path when the static shape is eligible and falls back to
  ``lax.conv_general_dilated`` otherwise, so checkpoints and weight
  ports are interchangeable with ``nn.Conv``.
* :class:`BNScaleBias` / :class:`FusedBNReluConv3x3` — the Flax pair
  the ResNet blocks use: a ``nn.BatchNorm`` subclass with an identical
  parameter/variable tree that returns the effective (scale, bias)
  instead of applying them, and the conv module consuming the pair.

Reference parity note: the reference has no counterpart (its convs are
cuDNN via Keras); this is a TPU-only performance path gated by
``PERFORMANCE.pallas_conv`` and off by default. Numerics match the XLA
conv to bf16 rounding (both accumulate in f32 on the MXU) — oracle
tests in ``tests/test_fused_conv.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dtype = Any

# Batch-tile cap per spatial size: keeps the [S*S*BT, C] accumulator,
# the per-tap concat operands, and Mosaic's double-buffering within the
# 16 MB/core scoped-VMEM limit. 2048 rows at C=256 measured 20.9 MB of
# stack (> the 16 MB limit) on v5e; 1024 rows fits.
_MAX_ROWS = 1024

# The BN-fused FORWARD adds the affine+relu'd copy of the input block
# (no f32 weight accumulator), so it gets a slightly tighter budget
# than the plain forward; 512 rows (bt=128 at 2x2) compiles and runs
# inside the full ResNet-50 train step.
_MAX_ROWS_BN_FWD = 512


def _wgrad_rows(cin: int, cout: int, bn: bool) -> int:
    """Row budget for the wgrad kernels, by channel width.

    The wgrads carry a [3, 3, Cin, Cout] f32 output block (9.4 MB at
    C=512) revisited by every grid step, so wide-channel shapes leave
    little stack for the row-stacked operands. Mosaic's scoped-VMEM
    usage is NOT predictable from operand arithmetic (measured in-step
    at s=2/C=512/bt=128: plain 21.58 MB, BN-prologue 18.18 MB — the
    plain kernel allocates MORE despite fewer operands), and the same
    kernel that compiles standalone can OOM inside the full train step
    (the program context costs real headroom). So the budgets are
    empirical, verified by compiling + running the full ResNet-50
    @64px/B=1024 train step on v5e: at the C=512 class, 256 rows for
    the BN wgrad (bt=64 at 2x2) and 128 for the plain one (bt=32)
    fit; narrower channels keep the forward budget."""
    if cin * cout >= 512 * 512:
        return 256 if bn else 128
    return _MAX_ROWS


def _batch_tile(batch: int, s: int,
                rows: int = _MAX_ROWS) -> Optional[int]:
    """Largest power-of-two batch tile <= 128 dividing ``batch`` whose
    [S*S*BT, C] operand stays inside the VMEM row budget. The
    eligibility gate checks the TIGHTEST per-kernel budget (the plain
    wgrad's), and any batch with a tile under that budget also has one
    under every looser budget (the search walks powers of two), so
    eligible shapes always tile for every kernel in the program."""
    bt = min(128, rows // (s * s))
    while bt >= 8:
        if batch % bt == 0:
            return bt
        bt //= 2
    return None


# Weight block [3, 3, Cin, Cout] lives whole in VMEM (constant
# index_map). Cap it so the kernel stays inside the 16 MB/core scoped
# limit next to the row-stacked operands: C=512 bf16 (4.7 MB) is the
# largest measured-working configuration; C>=768 would not fit.
_MAX_WEIGHT_BYTES = 6 * 1024 * 1024


def _gate(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...],
          strides: Tuple[int, int], groups: int,
          spatial: Tuple[int, ...], itemsize: int) -> bool:
    if tuple(strides) != (1, 1) or groups != 1:
        return False
    if len(x_shape) != 4 or w_shape[:2] != (3, 3):
        return False
    b, h, w, cin = x_shape
    if h != w or h not in spatial:
        return False
    if cin != w_shape[2]:
        return False
    cout = w_shape[3]
    if cin % 128 != 0 or cout % 128 != 0:
        return False
    if not _interpret():
        # Hardware-only safety gates (interpret mode has no VMEM limit
        # and the CPU test suite exercises f32 through it): the VMEM
        # budget was calibrated on 2-byte dtypes (bf16) — wider compute
        # dtypes double every operand and are unvalidated on-chip, so
        # they fall back to the XLA conv instead of risking a Mosaic
        # scoped-vmem compile failure.
        if itemsize > 2:
            return False
        if 9 * cin * cout * itemsize > _MAX_WEIGHT_BYTES:
            return False
    # every kernel in the program must have a tile — the plain wgrad's
    # budget is the tightest (so e.g. 8x8 @ C=512, whose minimal 512-row
    # tile busts the wide-channel wgrad budget, falls back to XLA)
    return _batch_tile(b, h, _wgrad_rows(cin, cout, bn=False)) is not None


def eligible(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...],
             strides: Tuple[int, int] = (1, 1), groups: int = 1,
             itemsize: int = 2) -> bool:
    """Static-shape gate for the full (fwd + bwd) Pallas path.

    Eligible = stride-1 SAME 3x3, ungrouped, square spatial S in {2, 4}
    (measured on v5e, tools/pallas_conv_bench.py: 1.3-1.5x there; at
    8x8 the Pallas forward loses to XLA — see :func:`eligible_mixed` —
    and larger maps keep enough rows per position for XLA's implicit
    GEMM), lane-aligned channels, a batch divisible by a power-of-two
    tile, and (on real TPU only) a 2-byte compute dtype with the weight
    block under :data:`_MAX_WEIGHT_BYTES`. Everything else falls back
    to ``lax.conv_general_dilated``. ``itemsize`` is the compute
    dtype's byte width (callers with an array should pass
    ``x.dtype.itemsize``).
    """
    return _gate(x_shape, w_shape, strides, groups, (2, 4), itemsize)


def eligible_mixed(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...],
                   strides: Tuple[int, int] = (1, 1),
                   groups: int = 1, itemsize: int = 2) -> bool:
    """Gate for the mixed path: XLA forward + Pallas backward.

    At 8x8 the per-op measurements split: XLA wins the forward (more
    rows per position feed its implicit GEMM) while the Pallas
    dgrad+wgrad pair won ~1.5x in isolation (the bwd program has twice
    the contraction work and XLA schedules it poorly at this size). The
    mixed path keeps XLA's forward and swaps in the Pallas gradients —
    same constraints as :func:`eligible` otherwise."""
    return _gate(x_shape, w_shape, strides, groups, (8,), itemsize)


def _fwd_kernel(s: int, bt: int, x_ref, w_ref, o_ref):
    """relu-free conv body: o = sum_taps shift(x) @ w[tap].

    ``x_ref``: [BT, S+2, S+2, Cin] zero-padded; ``w_ref``: [3, 3, Cin,
    Cout]; ``o_ref``: [BT, S, S, Cout]. Each tap's operand stacks the
    S*S output positions position-major into [S*S*BT, Cin] so every
    matmul feeds the MXU S*S*BT rows (the position-at-a-time variant
    measured 15% slower in the prototype).
    """
    cin = x_ref.shape[-1]
    cout = o_ref.shape[-1]
    acc = jnp.zeros((s * s * bt, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            a = jnp.concatenate(
                [x_ref[:, oy + dy, ox + dx, :]
                 for oy in range(s) for ox in range(s)], axis=0)
            acc = acc + jnp.dot(a, w_ref[dy, dx, :, :],
                                preferred_element_type=jnp.float32)
    out = acc.astype(o_ref.dtype)
    for i, (oy, ox) in enumerate([(y, x) for y in range(s)
                                  for x in range(s)]):
        o_ref[:, oy, ox, :] = out[i * bt:(i + 1) * bt, :]


def _wgrad_kernel(s: int, bt: int, x_ref, g_ref, o_ref):
    """dW[t] += x_pad[shift t]^T @ g, accumulated across grid steps.

    ``x_ref``: [BT, S+2, S+2, Cin] zero-padded; ``g_ref``: [BT, S, S,
    Cout]; ``o_ref``: [3, 3, Cin, Cout] f32, revisited by every grid
    step (constant index_map) — TPU grids run sequentially, so the
    read-modify-write accumulation is race-free.
    """
    i = pl.program_id(0)
    g = jnp.concatenate(
        [g_ref[:, oy, ox, :] for oy in range(s) for ox in range(s)],
        axis=0)                                        # [S*S*BT, Cout]
    for dy in range(3):
        for dx in range(3):
            a = jnp.concatenate(
                [x_ref[:, oy + dy, ox + dx, :]
                 for oy in range(s) for ox in range(s)], axis=0)
            # [Cin, S*S*BT] @ [S*S*BT, Cout] with the contraction over
            # the stacked rows
            dw = lax.dot_general(
                a, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [Cin, Cout]
            @pl.when(i == 0)
            def _init():
                o_ref[dy, dx, :, :] = dw

            @pl.when(i > 0)
            def _acc():
                o_ref[dy, dx, :, :] = o_ref[dy, dx, :, :] + dw


def _interpret() -> bool:
    # Pallas TPU kernels run in interpret mode off-TPU (CPU tests and
    # the forced-CPU virtual meshes); the dispatcher is static per
    # trace, which is keyed on the backend.
    return jax.default_backend() != "tpu"


def _conv_fwd_impl(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    b, s = x.shape[0], x.shape[1]
    cin, cout = w.shape[2], w.shape[3]
    bt = _batch_tile(b, s)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, s, bt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s + 2, s + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, s, s, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, s, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * s * 9 * cin * cout,
            bytes_accessed=(x.size + w.size) * x.dtype.itemsize
            + b * s * s * cout * x.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, w)


def _wgrad_impl(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    b, s, cin, cout = x.shape[0], x.shape[1], x.shape[3], g.shape[3]
    bt = _batch_tile(b, s, _wgrad_rows(cin, cout, bn=False))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        functools.partial(_wgrad_kernel, s, bt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s + 2, s + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, s, s, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * s * 9 * cin * cout,
            bytes_accessed=(x.size + g.size) * x.dtype.itemsize
            + 9 * cin * cout * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, g)


@jax.custom_vjp
def conv3x3_small(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv on a small square feature map (Pallas).

    ``x``: [B, S, S, Cin]; ``w``: [3, 3, Cin, Cout] — the gate
    :func:`eligible` must hold. Output [B, S, S, Cout] in ``x.dtype``,
    f32-accumulated like XLA's conv on the MXU.
    """
    return _conv_fwd_impl(x, w)


def _conv_vjp_fwd(x, w):
    return _conv_fwd_impl(x, w), (x, w)


def _conv_vjp_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    # dgrad: stride-1 SAME 3x3 conv of g with spatially flipped,
    # in/out-swapped weights — the same Pallas kernel.
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = _conv_fwd_impl(g, w_flip.astype(w.dtype))
    dw = _wgrad_impl(x, g).astype(w.dtype)
    return dx, dw


conv3x3_small.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)


def _lax_conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv3x3_small_mixed(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv: XLA forward, Pallas backward.

    For the shapes where :func:`eligible_mixed` holds (8x8 spatial) —
    the forward runs XLA's conv (faster there), the backward runs the
    Pallas dgrad/wgrad kernels (faster there). Same value and gradient
    semantics as either pure path."""
    return _lax_conv3x3(x, w)


def _mixed_vjp_fwd(x, w):
    return _lax_conv3x3(x, w), (x, w)


conv3x3_small_mixed.defvjp(_mixed_vjp_fwd, _conv_vjp_bwd)


# ---------------------------------------------------------------------
# SPMD (mesh-partitioned) variants.
#
# GSPMD cannot see inside a pallas_call, so under a sharded train step
# the plain ops above would force a full-batch gather onto every
# device. custom_partitioning teaches the partitioner the two facts it
# needs: the conv (and its dgrad, which is the same kernel) is
# embarrassingly batch-parallel, and the weight gradient is a batch
# reduction (per-shard partial + one all-reduce over the batch axes).
# The shardy sharding rules below mark every non-batch factor
# need-replication, so a TP-sharded channel dim is all-gathered at the
# op boundary rather than miscomputed.
# ---------------------------------------------------------------------

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


def _batch_axes(sharding) -> Optional[Any]:
    """Mesh axis name(s) the leading (batch) dim is sharded over, or
    None if unsharded / not a NamedSharding."""
    spec = getattr(sharding, "spec", None)
    if not spec or len(spec) == 0:
        return None
    return spec[0]


def _lax_wgrad(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """XLA weight gradient of the stride-1 SAME 3x3 conv (per-shard
    fallback when the local batch misses the Pallas gate): dW[dy, dx] =
    sum_{b,y,x} x_pad[b, y+dy, x+dx] * g[b, y, x], f32-accumulated to
    match :func:`_wgrad_impl`."""
    s = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.stack([
        jnp.stack([
            jnp.einsum("bhwc,bhwo->co", xp[:, dy:dy + s, dx:dx + s, :],
                       g, preferred_element_type=jnp.float32)
            for dx in range(3)])
        for dy in range(3)])


@custom_partitioning
def _conv_fwd_spmd(x, w):
    return _conv_fwd_impl(x, w)


def _fwd_partition(mesh, arg_shapes, result_shape):
    b_axis = _batch_axes(arg_shapes[0].sharding)

    def lower_fn(x, w):
        # per-shard shapes: re-check the gate on the local batch and
        # fall back to the XLA conv if the shard misses it
        if _gate(x.shape, w.shape, (1, 1), 1, (2, 4, 8),
                 x.dtype.itemsize):
            return _conv_fwd_impl(x, w)
        return _lax_conv3x3(x, w)

    arg_shardings = (
        NamedSharding(mesh, PartitionSpec(b_axis, None, None, None)),
        NamedSharding(mesh, PartitionSpec(None, None, None, None)),
    )
    out_sharding = NamedSharding(
        mesh, PartitionSpec(b_axis, None, None, None))
    return mesh, lower_fn, out_sharding, arg_shardings


def _fwd_infer(mesh, arg_shapes, result_shape):
    b_axis = _batch_axes(arg_shapes[0].sharding)
    return NamedSharding(mesh, PartitionSpec(b_axis, None, None, None))


_conv_fwd_spmd.def_partition(
    partition=_fwd_partition,
    infer_sharding_from_operands=_fwd_infer,
    sharding_rule="b s1 s2 ci, k1 k2 ci2 co -> b s1 s2 co",
    need_replication_factors=("s1", "s2", "ci", "k1", "k2", "ci2", "co"),
)


@custom_partitioning
def _wgrad_spmd(x, g):
    return _wgrad_impl(x, g)


def _wgrad_partition(mesh, arg_shapes, result_shape):
    b_axis = _batch_axes(arg_shapes[0].sharding)

    def lower_fn(x, g):
        if _gate(x.shape, (3, 3, x.shape[-1], g.shape[-1]), (1, 1), 1,
                 (2, 4, 8), x.dtype.itemsize):
            dw = _wgrad_impl(x, g)
        else:
            dw = _lax_wgrad(x, g)
        if b_axis is not None:
            # the partitioner does not insert reduction collectives for
            # custom ops — the per-shard lowering owns the psum
            dw = lax.psum(dw, b_axis)
        return dw

    arg_shardings = (
        NamedSharding(mesh, PartitionSpec(b_axis, None, None, None)),
        NamedSharding(mesh, PartitionSpec(b_axis, None, None, None)),
    )
    out_sharding = NamedSharding(mesh, PartitionSpec(None, None, None, None))
    return mesh, lower_fn, out_sharding, arg_shardings


def _wgrad_infer(mesh, arg_shapes, result_shape):
    return NamedSharding(mesh, PartitionSpec(None, None, None, None))


_wgrad_spmd.def_partition(
    partition=_wgrad_partition,
    infer_sharding_from_operands=_wgrad_infer,
    sharding_rule="b s1 s2 ci, b s1 s2 co -> k1 k2 ci co",
    reduction_factors=("b",),
    need_replication_factors=("s1", "s2", "ci", "co", "k1", "k2"),
)


@jax.custom_vjp
def conv3x3_small_spmd(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """:func:`conv3x3_small` for GSPMD-sharded train steps: same value
    and gradient, but the conv/dgrad keep the batch sharding and the
    wgrad psums per-shard partials over the batch mesh axes."""
    return _conv_fwd_spmd(x, w)


def _spmd_vjp_fwd(x, w):
    return _conv_fwd_spmd(x, w), (x, w)


def _spmd_vjp_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = _conv_fwd_spmd(g, w_flip.astype(w.dtype))
    dw = _wgrad_spmd(x, g).astype(w.dtype)
    return dx, dw


conv3x3_small_spmd.defvjp(_spmd_vjp_fwd, _spmd_vjp_bwd)


@jax.custom_vjp
def conv3x3_small_mixed_spmd(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """:func:`conv3x3_small_mixed` under GSPMD: XLA forward (natively
    batch-partitionable), Pallas backward via the partitioned ops."""
    return _lax_conv3x3(x, w)


conv3x3_small_mixed_spmd.defvjp(_mixed_vjp_fwd, _spmd_vjp_bwd)


# ---------------------------------------------------------------------
# BN-apply + ReLU fused into the conv prologue.
#
# Layout in a ResNet block: conv1 -> bn1 -> relu -> conv2(3x3). XLA
# materializes bn1's normalized output z in HBM (one write + one read
# of [B, S, S, C]) because it cannot fuse elementwise producers into a
# convolution. Here conv2 takes the RAW conv1 output y plus bn1's
# effective per-channel affine (scale = gamma*rsqrt(var+eps), bias =
# beta - mean*scale) and computes z = relu(y*scale + bias) in VMEM.
# The batch statistics themselves (and the gradient flowing into them)
# are plain XLA reductions outside the kernel, so training semantics
# are exact. The SAME-padding ring must stay zero AFTER the affine
# (relu(bias) != 0), hence the iota mask in the kernels.
# ---------------------------------------------------------------------


def _affine_relu_block(s, x_ref, s_ref, b_ref, dtype):
    """relu(x*scale + bias) over the [BT, S+2, S+2, C] padded block,
    with the padding ring re-zeroed (f32 math, cast to ``dtype``).

    The ring mask is a [S+2, S+2] f32 built from 2-D iotas and reshaped
    to [1, S+2, S+2, 1]: a 2-D i1 mask cannot be reshaped to 4-D
    (Mosaic: "insertion of minor dim ... only supported for 32-bit
    types"), and full-block 4-D int32 iotas cost ~2x the block in
    scoped VMEM — the f32 broadcast-multiply is both legal and free."""
    z = jnp.maximum(
        x_ref[...].astype(jnp.float32) * s_ref[0, :] + b_ref[0, :], 0.0)
    row = lax.broadcasted_iota(jnp.int32, (s + 2, s + 2), 0)
    col = lax.broadcasted_iota(jnp.int32, (s + 2, s + 2), 1)
    inner = (row >= 1) & (row <= s) & (col >= 1) & (col <= s)
    mask = inner.astype(jnp.float32).reshape(1, s + 2, s + 2, 1)
    return (z * mask).astype(dtype)


def _fwd_bn_kernel(s: int, bt: int, x_ref, w_ref, s_ref, b_ref, o_ref):
    """o = conv3x3(relu(x*scale + bias), w) — :func:`_fwd_kernel` with
    the affine+relu prologue applied to the padded input block."""
    cout = o_ref.shape[-1]
    z = _affine_relu_block(s, x_ref, s_ref, b_ref, x_ref.dtype)
    acc = jnp.zeros((s * s * bt, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            a = jnp.concatenate(
                [z[:, oy + dy, ox + dx, :]
                 for oy in range(s) for ox in range(s)], axis=0)
            acc = acc + jnp.dot(a, w_ref[dy, dx, :, :],
                                preferred_element_type=jnp.float32)
    out = acc.astype(o_ref.dtype)
    for i, (oy, ox) in enumerate([(y, x) for y in range(s)
                                  for x in range(s)]):
        o_ref[:, oy, ox, :] = out[i * bt:(i + 1) * bt, :]


def _wgrad_bn_kernel(s: int, bt: int, x_ref, g_ref, s_ref, b_ref, o_ref):
    """dW += relu(x*scale+bias)[shift t]^T @ g — :func:`_wgrad_kernel`
    with the prologue recomputing z from the raw input (z is never a
    residual in HBM)."""
    i = pl.program_id(0)
    z = _affine_relu_block(s, x_ref, s_ref, b_ref, x_ref.dtype)
    g = jnp.concatenate(
        [g_ref[:, oy, ox, :] for oy in range(s) for ox in range(s)],
        axis=0)
    for dy in range(3):
        for dx in range(3):
            a = jnp.concatenate(
                [z[:, oy + dy, ox + dx, :]
                 for oy in range(s) for ox in range(s)], axis=0)
            dw = lax.dot_general(
                a, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            @pl.when(i == 0)
            def _init():
                o_ref[dy, dx, :, :] = dw

            @pl.when(i > 0)
            def _acc():
                o_ref[dy, dx, :, :] = o_ref[dy, dx, :, :] + dw


def _conv_bn_fwd_impl(x, w, scale, bias):
    b, s = x.shape[0], x.shape[1]
    cin, cout = w.shape[2], w.shape[3]
    bt = _batch_tile(b, s, _MAX_ROWS_BN_FWD)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    sb = jnp.reshape(scale.astype(jnp.float32), (1, cin))
    bb = jnp.reshape(bias.astype(jnp.float32), (1, cin))
    return pl.pallas_call(
        functools.partial(_fwd_bn_kernel, s, bt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s + 2, s + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, s, s, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, s, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * s * 9 * cin * cout,
            bytes_accessed=(x.size + w.size) * x.dtype.itemsize
            + b * s * s * cout * x.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, w, sb, bb)


def _wgrad_bn_impl(x, g, scale, bias):
    b, s, cin, cout = x.shape[0], x.shape[1], x.shape[3], g.shape[3]
    bt = _batch_tile(b, s, _wgrad_rows(cin, cout, bn=True))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    sb = jnp.reshape(scale.astype(jnp.float32), (1, cin))
    bb = jnp.reshape(bias.astype(jnp.float32), (1, cin))
    return pl.pallas_call(
        functools.partial(_wgrad_bn_kernel, s, bt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, s + 2, s + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, s, s, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * s * 9 * cin * cout,
            bytes_accessed=(x.size + g.size) * x.dtype.itemsize
            + 9 * cin * cout * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, g, sb, bb)


def _affine_relu(x, scale, bias):
    """XLA reference of the prologue: relu(x*scale + bias), f32 math,
    cast back to ``x.dtype``."""
    z = jnp.maximum(x.astype(jnp.float32) * scale + bias, 0.0)
    return z.astype(x.dtype)


def _bn_vjp_bwd_common(dgrad_fn, wgrad_fn, res, g):
    """Shared backward for the fused op (plain and SPMD variants).

    dz comes from the conv dgrad (same kernel as the forward conv, on
    flipped weights); the relu/affine chain rule and the per-channel
    scale/bias reductions are elementwise XLA (one fused pass over a
    small-spatial array); dW recomputes z inside the wgrad kernel.
    """
    x, w, scale, bias = res
    g = g.astype(x.dtype)
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dz = dgrad_fn(g, w_flip.astype(w.dtype)).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    dpre = dz * (xf * scale + bias > 0)
    dx = (dpre * scale).astype(x.dtype)
    ds = jnp.sum(dpre * xf, axis=(0, 1, 2)).astype(scale.dtype)
    db = jnp.sum(dpre, axis=(0, 1, 2)).astype(bias.dtype)
    dw = wgrad_fn(x, g, scale, bias).astype(w.dtype)
    return dx, dw, ds, db


@jax.custom_vjp
def conv3x3_small_bn_relu(x, w, scale, bias):
    """``conv3x3(relu(x*scale + bias), w)`` in one Pallas program.

    ``x``: [B, S, S, Cin] RAW (pre-BN) activation; ``scale``/``bias``:
    per-channel f32 effective affine of the preceding BatchNorm (batch
    or running statistics — computed OUTSIDE, so both train and eval
    semantics are exact); ``w``: [3, 3, Cin, Cout]. :func:`eligible`
    must hold on (x, w). Differentiable in all four arguments.
    """
    return _conv_bn_fwd_impl(x, w, scale, bias)


def _bn_vjp_fwd(x, w, scale, bias):
    return _conv_bn_fwd_impl(x, w, scale, bias), (x, w, scale, bias)


def _bn_vjp_bwd(res, g):
    return _bn_vjp_bwd_common(_conv_fwd_impl, _wgrad_bn_impl, res, g)


conv3x3_small_bn_relu.defvjp(_bn_vjp_fwd, _bn_vjp_bwd)


# SPMD wrappers: batch-parallel like the plain conv (scale/bias ride
# along replicated), wgrad psums over the batch axes.

def _lax_conv_bn(x, w, scale, bias):
    return _lax_conv3x3(_affine_relu(x, scale, bias), w)


@custom_partitioning
def _conv_bn_fwd_spmd(x, w, scale, bias):
    return _conv_bn_fwd_impl(x, w, scale, bias)


def _bn_fwd_partition(mesh, arg_shapes, result_shape):
    b_axis = _batch_axes(arg_shapes[0].sharding)

    def lower_fn(x, w, scale, bias):
        if _gate(x.shape, w.shape, (1, 1), 1, (2, 4, 8),
                 x.dtype.itemsize):
            return _conv_bn_fwd_impl(x, w, scale, bias)
        return _lax_conv_bn(x, w, scale, bias)

    rep = NamedSharding(mesh, PartitionSpec())
    arg_shardings = (
        NamedSharding(mesh, PartitionSpec(b_axis, None, None, None)),
        NamedSharding(mesh, PartitionSpec(None, None, None, None)),
        rep, rep,
    )
    out_sharding = NamedSharding(
        mesh, PartitionSpec(b_axis, None, None, None))
    return mesh, lower_fn, out_sharding, arg_shardings


def _bn_fwd_infer(mesh, arg_shapes, result_shape):
    b_axis = _batch_axes(arg_shapes[0].sharding)
    return NamedSharding(mesh, PartitionSpec(b_axis, None, None, None))


_conv_bn_fwd_spmd.def_partition(
    partition=_bn_fwd_partition,
    infer_sharding_from_operands=_bn_fwd_infer,
    sharding_rule="b s1 s2 ci, k1 k2 ci2 co, ci3, ci4 -> b s1 s2 co",
    need_replication_factors=("s1", "s2", "ci", "k1", "k2", "ci2", "co",
                              "ci3", "ci4"),
)


@custom_partitioning
def _wgrad_bn_spmd(x, g, scale, bias):
    return _wgrad_bn_impl(x, g, scale, bias)


def _wgrad_bn_partition(mesh, arg_shapes, result_shape):
    b_axis = _batch_axes(arg_shapes[0].sharding)

    def lower_fn(x, g, scale, bias):
        if _gate(x.shape, (3, 3, x.shape[-1], g.shape[-1]), (1, 1), 1,
                 (2, 4, 8), x.dtype.itemsize):
            dw = _wgrad_bn_impl(x, g, scale, bias)
        else:
            dw = _lax_wgrad(_affine_relu(x, scale, bias), g)
        if b_axis is not None:
            dw = lax.psum(dw, b_axis)
        return dw

    rep = NamedSharding(mesh, PartitionSpec())
    arg_shardings = (
        NamedSharding(mesh, PartitionSpec(b_axis, None, None, None)),
        NamedSharding(mesh, PartitionSpec(b_axis, None, None, None)),
        rep, rep,
    )
    out_sharding = NamedSharding(mesh, PartitionSpec(None, None, None, None))
    return mesh, lower_fn, out_sharding, arg_shardings


def _wgrad_bn_infer(mesh, arg_shapes, result_shape):
    return NamedSharding(mesh, PartitionSpec(None, None, None, None))


_wgrad_bn_spmd.def_partition(
    partition=_wgrad_bn_partition,
    infer_sharding_from_operands=_wgrad_bn_infer,
    sharding_rule="b s1 s2 ci, b s1 s2 co, ci3, ci4 -> k1 k2 ci co",
    reduction_factors=("b",),
    # shardy requires special factors ordered by first appearance in
    # the rule string (ci3/ci4 appear before k1/k2)
    need_replication_factors=("s1", "s2", "ci", "co", "ci3", "ci4",
                              "k1", "k2"),
)


@jax.custom_vjp
def conv3x3_small_bn_relu_spmd(x, w, scale, bias):
    """:func:`conv3x3_small_bn_relu` under GSPMD — batch stays sharded
    through the fused kernels, the weight grad psums over the batch
    mesh axes."""
    return _conv_bn_fwd_spmd(x, w, scale, bias)


def _bn_spmd_vjp_fwd(x, w, scale, bias):
    return _conv_bn_fwd_spmd(x, w, scale, bias), (x, w, scale, bias)


def _bn_spmd_vjp_bwd(res, g):
    return _bn_vjp_bwd_common(_conv_fwd_spmd, _wgrad_bn_spmd, res, g)


conv3x3_small_bn_relu_spmd.defvjp(_bn_spmd_vjp_fwd, _bn_spmd_vjp_bwd)


class FastConv3x3(nn.Module):
    """``nn.Conv``-compatible 3x3 conv that uses the Pallas path when
    the static shape is :func:`eligible`, else ``lax`` — same ``kernel``
    param name, shape, and init as ``nn.Conv(features, (3, 3),
    padding=((1, 1), (1, 1)), use_bias=False)``, so parameter trees are
    interchangeable (checkpoints, weight ports, freeze masks).

    ``spmd=True`` selects the ``custom_partitioning``-wrapped ops so the
    module composes with a GSPMD-sharded train step (the Trainer sets
    this when a >1-device mesh is active); the eligibility gate then
    applies to the global shape, with a per-shard re-check inside the
    partitioned lowering."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    kernel_init: Any = nn.initializers.he_normal()
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    spmd: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, cin // self.feature_group_count, self.features),
            self.param_dtype)
        # nn.Conv semantics: dtype=None promotes to the common type of
        # input and (f32) params, an explicit dtype casts both to it.
        dtype = self.dtype or jnp.result_type(x, kernel)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        if eligible(x.shape, kernel.shape, self.strides,
                    self.feature_group_count, x.dtype.itemsize):
            return (conv3x3_small_spmd if self.spmd
                    else conv3x3_small)(x, kernel)
        if eligible_mixed(x.shape, kernel.shape, self.strides,
                          self.feature_group_count, x.dtype.itemsize):
            return (conv3x3_small_mixed_spmd if self.spmd
                    else conv3x3_small_mixed)(x, kernel)
        return lax.conv_general_dilated(
            x, kernel, window_strides=tuple(self.strides),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count)


class BNScaleBias(nn.BatchNorm):
    """``nn.BatchNorm`` with an identical parameter/variable tree that
    returns the effective per-channel affine instead of applying it.

    ``__call__(x)`` computes the statistics exactly like
    ``nn.BatchNorm`` (flax 0.12 ``_compute_stats``: f32 reductions,
    fast-variance, running-average update outside initialization) but
    returns the f32 pair ``(scale, bias)`` with
    ``scale = gamma * rsqrt(var + eps)`` and
    ``bias = beta - mean * scale``, so a downstream fused kernel can
    apply ``relu(x * scale + bias)`` in VMEM
    (:func:`conv3x3_small_bn_relu`). Because the parameter/variable
    names, shapes, and init values match ``nn.BatchNorm`` exactly,
    swapping a block between the fused and unfused form never changes
    checkpoints or weight ports.
    """

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        from flax.linen.normalization import (_canonicalize_axes,
                                              _compute_stats)
        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim)
                               if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), feature_shape)
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), feature_shape)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = _compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=(self.axis_name
                           if not self.is_initializing() else None),
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)

        scale = lax.rsqrt(var.astype(jnp.float32) + self.epsilon)
        if self.use_scale:
            gamma = self.param("scale", self.scale_init, feature_shape,
                               self.param_dtype)
            scale = scale * gamma.astype(jnp.float32)
        bias = -mean.astype(jnp.float32) * scale
        if self.use_bias:
            beta = self.param("bias", self.bias_init, feature_shape,
                              self.param_dtype)
            bias = bias + beta.astype(jnp.float32)
        return scale, bias


class FusedBNReluConv3x3(nn.Module):
    """The conv half of the fused ``bn -> relu -> 3x3 conv`` pair.

    Takes the RAW pre-BN activation plus the effective ``(scale,
    bias)`` from :class:`BNScaleBias` and computes
    ``conv3x3(relu(x * scale + bias), kernel)`` — through the one-pass
    Pallas program (:func:`conv3x3_small_bn_relu`) when the static
    shape is :func:`eligible`, else through an XLA affine+relu followed
    by the best available conv for the shape (mixed Pallas-backward at
    8x8, plain ``lax`` conv otherwise) — so the module is safe to use
    unconditionally wherever the chain matches. Stride 1, ungrouped,
    no bias; the ``kernel`` param matches ``nn.Conv``/:class:`FastConv3x3`.
    """

    features: int
    kernel_init: Any = nn.initializers.he_normal()
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    spmd: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: jnp.ndarray,
                 bias: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.features), self.param_dtype)
        dtype = self.dtype or jnp.result_type(x, kernel)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        scale = scale.astype(jnp.float32)
        bias = bias.astype(jnp.float32)
        if eligible(x.shape, kernel.shape, (1, 1), 1, x.dtype.itemsize):
            return (conv3x3_small_bn_relu_spmd if self.spmd
                    else conv3x3_small_bn_relu)(x, kernel, scale, bias)
        z = _affine_relu(x, scale, bias)
        if eligible_mixed(x.shape, kernel.shape, (1, 1), 1,
                          x.dtype.itemsize):
            return (conv3x3_small_mixed_spmd if self.spmd
                    else conv3x3_small_mixed)(z, kernel)
        return _lax_conv3x3(z, kernel)
