"""Pipeline-parallel building block tests — parallel/pp.py.

A 4-stage pipeline over the virtual mesh must be numerically identical
(forward AND gradient) to applying the transformer blocks sequentially.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embeddingnet_tpu.models.vit import EncoderBlock
from embeddingnet_tpu.parallel import build_mesh
from embeddingnet_tpu.parallel.pp import (stack_stage_params,
                                          pipeline_blocks_forward)

DIM, HEADS, DEPTH = 16, 2, 4


def _blocks_and_input(seed=0):
    block = EncoderBlock(DIM, HEADS)
    rng = jax.random.PRNGKey(seed)
    keys = jax.random.split(rng, DEPTH)
    x0 = jnp.zeros((2, 5, DIM))
    params = [block.init(k, x0)["params"] for k in keys]
    rs = np.random.default_rng(seed)
    x = jnp.asarray(rs.normal(size=(8, 5, DIM)), jnp.float32)
    return block, params, x


def _sequential(block, params_list, x):
    for p in params_list:
        x = block.apply({"params": p}, x)
    return x


@pytest.mark.slow  # 40-140s compile on the quick-loop box; full suite only
def test_pipeline_matches_sequential_fwd_and_grad():
    mesh = build_mesh(data=2, model=4)
    block, params_list, x = _blocks_and_input()
    stacked = stack_stage_params(params_list, n_stages=4)

    def block_apply(p, h):
        return block.apply({"params": p}, h)

    ref = _sequential(block, params_list, x)
    out = pipeline_blocks_forward(block_apply, stacked, x, mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    # gradient w.r.t. the stacked stage params flows through scan+ppermute
    def loss_pipe(sp):
        y = pipeline_blocks_forward(block_apply, sp, x, mesh, n_micro=2)
        return jnp.sum(y ** 2)

    def loss_seq(plist):
        return jnp.sum(_sequential(block, plist, x) ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(params_list)
    g_seq_stacked = stack_stage_params(g_seq, n_stages=4)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_seq_stacked)):
        # measured: max|diff| ~1e-4 on grad magnitudes ~1e2 (pure f32
        # accumulation-order noise through scan + ppermute)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def test_pipeline_single_stage_degenerates():
    """S=1 (model axis of 1): the pipeline is plain scanned blocks."""
    mesh = build_mesh(data=2, model=1)
    block, params_list, x = _blocks_and_input(seed=1)
    stacked = stack_stage_params(params_list, n_stages=1)

    out = pipeline_blocks_forward(
        lambda p, h: block.apply({"params": p}, h), stacked, x, mesh,
        n_micro=4)
    ref = _sequential(block, params_list, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_stack_stage_params_shape():
    block, params_list, _ = _blocks_and_input()
    stacked = stack_stage_params(params_list, n_stages=2)
    leaf = stacked["mlp"]["fc1"]["kernel"]
    assert leaf.shape[:2] == (2, 2)  # [S, L/S]
