"""Pipeline parallelism (GPipe-style) over a mesh axis.

The JAX/TPU-native pipeline pattern: each device on the ``model`` axis
holds one *stage* (a contiguous chunk of transformer blocks, params
sharded on a stacked leading axis), the batch is split into microbatches,
and a ``lax.scan`` of ``n_micro + n_stages - 1`` ticks advances
activations stage-to-stage with ``ppermute`` over ICI. Composes with the
``data`` axis (each data-parallel row runs its own pipeline).

Scope note (SURVEY §2.3): the reference has no model parallelism of any
kind, and metric-learning backbones at 48–128 px don't *need* PP — this
is the building block for the giant-backbone stretch regime (ViT-L+ at
high resolution), kept correctness-first: the GPipe bubble
(S-1 of n_micro+S-1 ticks idle per stage) is accepted, no 1F1B schedule.
Verified bit-equal (fwd and grad) to sequential block application on the
virtual mesh in ``tests/test_pp.py``; ``jax.grad`` differentiates
straight through the scan + ppermute.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def stack_stage_params(block_params_list, n_stages: int):
    """[params(block_1) .. params(block_L)] -> one tree with leaves
    [S, L/S, ...] — stage-major stacked block parameters (the layout
    :func:`pipeline_blocks_forward` shards over the pipe axis)."""
    n = len(block_params_list)
    if n % n_stages:
        raise ValueError(f"{n} blocks not divisible into {n_stages} stages")
    per = n // n_stages

    def stack(*leaves):
        arr = jnp.stack([jnp.asarray(l) for l in leaves])   # [L, ...]
        return arr.reshape((n_stages, per) + arr.shape[1:])

    return jax.tree_util.tree_map(stack, *block_params_list)


def pipeline_blocks_forward(block_apply: Callable, stacked_params: Any,
                            x: jnp.ndarray, mesh: Mesh, *,
                            n_micro: int, axis: str = "model",
                            data_axis: str = "data"):
    """Run ``x`` through ``S * (L/S)`` blocks pipelined over ``axis``.

    ``block_apply(params, x) -> x`` applies ONE block; ``stacked_params``
    leaves are [S, L/S, ...] (:func:`stack_stage_params`); ``x`` is
    [B, ...] with B divisible by ``n_micro`` (and by the data axis when
    the mesh has one). Returns [B, ...] replicated over ``axis``.
    """
    S = mesh.shape[axis]

    def stage_fn(params_chunk, h):
        # params_chunk leaves: [L/S, ...] — scan the stage's blocks
        def body(h, p):
            return block_apply(p, h), None
        h, _ = jax.lax.scan(body, h, params_chunk)
        return h

    def local_fn(params_local, x_local):
        # params_local leaves arrive as [1, L/S, ...] (this stage's slice)
        params_chunk = jax.tree_util.tree_map(lambda a: a[0], params_local)
        stage = jax.lax.axis_index(axis)
        b_local = x_local.shape[0]
        if b_local % n_micro:
            raise ValueError(
                f"local batch {b_local} not divisible by "
                f"n_micro={n_micro}")
        mb = b_local // n_micro
        micro = x_local.reshape((n_micro, mb) + x_local.shape[1:])

        perm = [(i, i + 1) for i in range(S - 1)]
        zeros = jnp.zeros_like(micro[0])

        def tick(carry, t):
            buf, out = carry
            # stage 0 injects microbatch t (clamped; ticks past n_micro-1
            # compute garbage that never reaches the output window)
            inject = micro[jnp.clip(t, 0, n_micro - 1)]
            cur = jnp.where(stage == 0, inject, buf)
            y = stage_fn(params_chunk, cur)
            # last stage collects its finished microbatch t-(S-1)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where((stage == S - 1) & (t >= S - 1), y,
                               jax.lax.dynamic_index_in_dim(
                                   out, jnp.clip(t - (S - 1), 0,
                                                 n_micro - 1),
                                   keepdims=False)),
                jnp.clip(t - (S - 1), 0, n_micro - 1), axis=0)
            buf = jax.lax.ppermute(y, axis, perm) if S > 1 else y
            return (buf, out), None

        out0 = jnp.zeros_like(micro)
        (_, out), _ = jax.lax.scan(tick, (zeros, out0),
                                   jnp.arange(n_micro + S - 1))
        # output lives on the last stage; replicate over the pipe axis
        out = jax.lax.psum(
            jnp.where(stage == S - 1, out, jnp.zeros_like(out)), axis)
        return out.reshape((b_local,) + x_local.shape[1:])

    def full_spec(tree, leading):
        return jax.tree_util.tree_map(
            lambda a: P(*((leading,) + (None,) * (a.ndim - 1))), tree)

    has_data = data_axis in mesh.shape
    x_spec = P(*((data_axis,) + (None,) * (x.ndim - 1))) if has_data \
        else P(*((None,) * x.ndim))
    out_spec = x_spec
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(full_spec(stacked_params, axis), x_spec),
        out_specs=out_spec, check_vma=False)
    return fn(stacked_params, x)


def place_stage_params(stacked_params, mesh: Mesh, axis: str = "model"):
    """Commit stacked stage params to the mesh (stage-sharded leading dim)."""
    def shard(a):
        return jax.device_put(
            a, NamedSharding(mesh, P(*((axis,) + (None,) * (a.ndim - 1)))))
    return jax.tree_util.tree_map(shard, stacked_params)
