"""Small-param packing (train/packing.py): exactness and containment.

The packed layout must be a pure re-arrangement: N wrapped steps produce
bit-identical params/opt_state/batch_stats/metrics to N plain steps, for
the production optimizer chain (plateau-scaled adam + EMA) and for the
masked (freeze_backbone) wrapper whose inner state deliberately does NOT
match the params treedef (passthrough case).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from embeddingnet_tpu.models import EmbeddingModule
from embeddingnet_tpu.train import TrainState, optim
from embeddingnet_tpu.train.packing import StatePacker, TreePacker
from embeddingnet_tpu.train.steps import make_triplet_train_step

B, IMG, KS = 12, 32, 3


def _assert_trees_equal(a, b, what):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"{what}: tree structure diverged"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=what)


def _setup(optimizer):
    module = EmbeddingModule(backbone_name="simple2", encodings_len=16,
                             embeddings_normalization=True,
                             dtype=jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                            train=False)
    state = TrainState.create(variables, optimizer,
                              rng=jax.random.PRNGKey(7))
    step = make_triplet_train_step(module, optimizer, margin=0.5,
                                   mode="batch_all",
                                   compute_dtype=jnp.float32,
                                   max_positives=KS - 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (B, IMG, IMG, 3), np.uint8))
    labels = jnp.asarray(np.repeat(np.arange(B // KS), KS).astype(np.int32))
    return state, step, x, labels


def test_tree_packer_roundtrip_exact():
    optimizer = optax.adam(1e-3)
    state, _, _, _ = _setup(optimizer)
    tp = TreePacker(state.params)
    assert tp.n_packed > 0  # BN scale/bias exist in simple2
    _assert_trees_equal(tp.unpack(tp.pack(state.params)), state.params,
                        "params roundtrip")


def test_state_roundtrip_covers_opt_state_and_stats():
    optimizer = optim.scaled_by_plateau(
        optax.chain(optax.adam(1e-3), optim.track_param_ema(0.99)))
    state, _, _, _ = _setup(optimizer)
    packer = StatePacker(state)
    pstate = packer.pack_state(state)
    # moments must actually be packed, not passed through: the packed
    # opt_state must contain no small f32 leaves outside flat vectors
    flat_sizes = [l.size for l in jax.tree_util.tree_leaves(pstate.opt_state)
                  if l.dtype == jnp.float32 and l.ndim > 1]
    back = packer.unpack_state(pstate)
    _assert_trees_equal(back.params, state.params, "params")
    _assert_trees_equal(back.opt_state, state.opt_state, "opt_state")
    _assert_trees_equal(back.batch_stats, state.batch_stats, "batch_stats")


@pytest.mark.parametrize("masked", [False, True])
def test_wrapped_steps_bit_identical(masked):
    base = optim.scaled_by_plateau(
        optax.chain(optax.adam(1e-3), optim.track_param_ema(0.99)))
    if masked:
        # freeze-backbone-style mask: inner state no longer mirrors the
        # params treedef -> packing must pass it through untouched and
        # stay exact
        optimizer = optim.masked(
            base, lambda params: jax.tree_util.tree_map(lambda _: True,
                                                        params))
    else:
        optimizer = base
    state, step, x, labels = _setup(optimizer)
    packer = StatePacker(state)

    jstep = jax.jit(step)
    pstep = jax.jit(packer.wrap_step(step))

    s_plain = state
    s_packed = packer.pack_state(state)
    for i in range(3):
        s_plain, m_plain = jstep(s_plain, x, labels)
        s_packed, m_packed = pstep(s_packed, x, labels)
        _assert_trees_equal(m_plain, m_packed, f"metrics step {i}")
    s_back = packer.unpack_state(s_packed)
    _assert_trees_equal(s_back.params, s_plain.params, "params after 3")
    _assert_trees_equal(s_back.opt_state, s_plain.opt_state,
                        "opt_state after 3")
    _assert_trees_equal(s_back.batch_stats, s_plain.batch_stats,
                        "batch_stats after 3")
    assert int(s_back.step) == int(s_plain.step) == 3


def _assert_trees_close(a, b, what, rtol=2e-6, atol=1e-8):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"{what}: tree structure diverged"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol, err_msg=what)


def test_flat_hooks_numerically_identical():
    """The packed-THROUGH-the-optimizer path (flat_step_hooks): N hook
    steps == N plain steps, production optimizer chain. Unlike
    wrap_step, adam/EMA here run directly on the fused flat buffers.

    Tolerance is ulp-level, not bitwise: the flat epilogue (grad concat
    + flat adam) changes XLA's backward fusion shapes, which reorders
    the batch reductions feeding small-leaf grads by 1-2 ulps. The
    optimizer MATH is exactly the same elementwise program."""
    optimizer = optim.scaled_by_plateau(
        optax.chain(optax.adam(1e-3), optim.track_param_ema(0.99)))
    state, step, x, labels = _setup(optimizer)
    packer = StatePacker(state)
    assert packer.flat_optimizer_ok(state, optimizer)

    module_kwargs = dict(margin=0.5, mode="batch_all",
                         compute_dtype=jnp.float32, max_positives=KS - 1)
    module = EmbeddingModule(backbone_name="simple2", encodings_len=16,
                             embeddings_normalization=True,
                             dtype=jnp.float32)
    hstep = jax.jit(make_triplet_train_step(
        module, optimizer, **module_kwargs,
        **packer.flat_step_hooks(optimizer)))
    jstep = jax.jit(step)

    s_plain = state
    s_flat = packer.pack_state(state)
    for i in range(3):
        s_plain, m_plain = jstep(s_plain, x, labels)
        s_flat, m_flat = hstep(s_flat, x, labels)
        _assert_trees_close(m_plain, m_flat, f"metrics step {i}")
    s_back = packer.unpack_state(s_flat)
    _assert_trees_close(s_back.params, s_plain.params, "params after 3")
    _assert_trees_close(s_back.opt_state, s_plain.opt_state,
                        "opt_state after 3")
    _assert_trees_close(s_back.batch_stats, s_plain.batch_stats,
                        "batch_stats after 3")
    assert int(s_back.step) == int(s_plain.step) == 3


def test_flat_probe_rejects_structure_keyed_optimizer():
    """optim.masked labels mirror the params STRUCTURE — running it on
    packed grads would be wrong, so the eval_shape probe must reject it
    (the Trainer then falls back to wrap_step)."""
    base = optax.adam(1e-3)
    state, _, _, _ = _setup(base)
    masked_opt = optim.masked(base, jax.tree_util.tree_map(
        lambda _: True, state.params))
    state2 = TrainState.create(
        {"params": state.params, "batch_stats": state.batch_stats},
        masked_opt, rng=jax.random.PRNGKey(7))
    packer = StatePacker(state2)
    assert not packer.flat_optimizer_ok(state2, masked_opt)


def test_plateau_scale_survives_packing():
    optimizer = optim.scaled_by_plateau(optax.adam(1e-3))
    state, step, x, labels = _setup(optimizer)
    packer = StatePacker(state)
    state = state.replace(
        opt_state=optim.set_plateau_scale(state.opt_state, 0.25))
    pstate = packer.pack_state(state)
    back = packer.unpack_state(pstate)
    _assert_trees_equal(back.opt_state, state.opt_state, "plateau scale")
