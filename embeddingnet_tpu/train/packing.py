"""Small-parameter packing: fuse the train state's tiny f32 leaves.

TPU problem this solves (no reference analog — Keras/cuDNN state layout
is opaque, ``/root/reference/embedding_net/backbones.py:19-104``): the
headline train-step trace shows ~2 ms/step of `copy-start`/`copy-done`
prefetch waits while XLA memory-space-assignment stages ~40 small f32
vectors (BN scale/bias/stats and their adam moments, f32[64..2048]).
TPU-backend scheduling flags are rejected by the axon relay, so the fix
is programmatic: store every small f32 leaf of params / batch_stats /
optimizer moments contiguously in one flat vector each, so MSA stages a
handful of large buffers instead of hundreds of tiny ones. For resnet50
that fuses 433 vectors (109 BN params + 106 batch_stats + 218 adam
moments, 432 KiB total).

Measured on the real chip (``tools/perf_probe8.py``, interleaved
best-of-2): 31.87 -> 31.54 ms/step (+0.33 ms, 0.990x) with bit-identical
numerics — unpack is static slices + reshapes, repack one concatenate,
and the optimizer math itself is untouched (the step unpacks, runs the
production step, repacks; only the buffers crossing the step boundary
change layout). Armed by ``PERFORMANCE.param_packing`` on single-device
Trainer paths; mesh paths keep the plain pytree layout (param shardings
attach to individual leaves).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import tree_util as jtu

# BN vectors top out at 2048 for the zoo's widest backbones; anything
# at or below this is scheduling overhead, not bandwidth.
SMALL_LEAF_ELEMS = 8192


class TreePacker:
    """Flatten a pytree's small f32 leaves into one contiguous vector.

    Leaves above the threshold (conv kernels, dense matrices) pass
    through untouched; small f32 leaves are concatenated and recovered
    with static slices + reshapes (free under XLA fusion at these
    sizes). The packed form is ``{"large": tuple, "flat": f32[N]}``.
    """

    def __init__(self, tree, thresh: int = SMALL_LEAF_ELEMS):
        leaves, self.treedef = jtu.tree_flatten(tree)
        self.n = len(leaves)
        self.small = [i for i, l in enumerate(leaves)
                      if l.size <= thresh and l.dtype == jnp.float32]
        small_set = set(self.small)
        self.large = [i for i in range(self.n) if i not in small_set]
        self.shapes = [tuple(leaves[i].shape) for i in self.small]
        sizes = [int(np.prod(s)) for s in self.shapes]
        self.offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(int)

    @property
    def n_packed(self) -> int:
        return len(self.small)

    def compatible(self, tree) -> bool:
        """True iff every leaf selected for packing matches the
        dtype/shape metadata captured at init. Static (shape/dtype only)
        — safe to call on tracers inside jit. Guards against a
        params-shaped subtree with different leaf dtypes (e.g. a future
        bf16 optimizer moment) being silently upcast to f32 through the
        flat buffer (r5, ADVICE r4)."""
        leaves = jtu.tree_flatten(tree)[0]
        if len(leaves) != self.n:
            return False
        return all(leaves[i].dtype == jnp.float32
                   and tuple(leaves[i].shape) == self.shapes[j]
                   for j, i in enumerate(self.small))

    def pack(self, tree):
        leaves = jtu.tree_flatten(tree)[0]
        flat = (jnp.concatenate([leaves[i].reshape(-1) for i in self.small])
                if self.small else jnp.zeros((0,), jnp.float32))
        return {"large": tuple(leaves[i] for i in self.large), "flat": flat}

    def unpack(self, packed):
        leaves: list = [None] * self.n
        for j, i in enumerate(self.large):
            leaves[i] = packed["large"][j]
        flat = packed["flat"]
        for j, i in enumerate(self.small):
            o0, o1 = int(self.offsets[j]), int(self.offsets[j + 1])
            leaves[i] = flat[o0:o1].reshape(self.shapes[j])
        return jtu.tree_unflatten(self.treedef, leaves)


class StatePacker:
    """Pack/unpack a :class:`TrainState` and wrap its train step.

    Optimizer state is handled structurally: every opt_state subtree
    whose tree structure equals the params treedef (adam/rmsprop/radam
    moments, momentum traces, the EMA shadow) is packed with the params
    packer; anything else (plateau scales, step counts, masked-optimizer
    wrappers) passes through untouched — the optimizer itself always
    runs on the ordinary pytrees inside the step, so unrecognized state
    is never wrong, merely unfused.
    """

    def __init__(self, state):
        self.pp = TreePacker(state.params)
        # batch_stats are all small vectors — pack everything
        self.bp = TreePacker(state.batch_stats, thresh=1 << 30)
        self._params_treedef = jtu.tree_structure(state.params)
        # the packed structure is what unpacking must recognize inside
        # the opt_state (mu/nu/EMA arrive there already packed)
        self._packed_treedef = jtu.tree_structure(
            self.pp.pack(state.params))

    @staticmethod
    def _map_subtrees(tree, match_treedef, fn: Callable[[Any], Any]):
        """Replace every subtree whose structure equals ``match_treedef``
        with ``fn(subtree)``; anything unrecognized passes through (the
        optimizer always runs on ordinary pytrees inside the step, so
        unmatched state is never wrong, merely unfused)."""

        def rec(node):
            try:
                if jtu.tree_structure(node) == match_treedef:
                    return fn(node)
            except Exception:
                pass
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                return type(node)(*[rec(getattr(node, f))
                                    for f in node._fields])
            if isinstance(node, tuple):
                return tuple(rec(c) for c in node)
            if isinstance(node, list):
                return [rec(c) for c in node]
            if isinstance(node, dict):
                return {k: rec(v) for k, v in node.items()}
            return node

        return rec(tree)

    def pack_state(self, state):
        # A params-shaped opt subtree whose leaf dtypes/shapes diverge
        # from params (e.g. a bf16 moment) passes through unpacked — the
        # unpack side only transforms subtrees matching the PACKED
        # treedef, so an unfused subtree round-trips untouched.
        def pack_if_compatible(sub):
            return self.pp.pack(sub) if self.pp.compatible(sub) else sub

        return state.replace(
            params=self.pp.pack(state.params),
            opt_state=self._map_subtrees(state.opt_state,
                                         self._params_treedef,
                                         pack_if_compatible),
            batch_stats=self.bp.pack(state.batch_stats))

    def unpack_state(self, pstate):
        return pstate.replace(
            params=self.pp.unpack(pstate.params),
            opt_state=self._map_subtrees(pstate.opt_state,
                                         self._packed_treedef,
                                         self.pp.unpack),
            batch_stats=self.bp.unpack(pstate.batch_stats))

    def wrap_step(self, step_fn):
        """``step(state, *batch) -> (state, metrics)``, packed layout.

        Unpack and repack live INSIDE the jitted program: between steps
        only the fused buffers exist; within a step XLA sees the
        ordinary pytree program and fuses the slices/concats away.
        """

        def packed_step(pstate, *batch):
            state = self.unpack_state(pstate)
            new_state, metrics = step_fn(state, *batch)
            return self.pack_state(new_state), metrics

        return packed_step

    # -- packed-through-the-optimizer path (r5) ---------------------------

    def flat_optimizer_ok(self, state, optimizer) -> bool:
        """True iff ``optimizer.update`` accepts the PACKED layout.

        Probed abstractly (``jax.eval_shape`` — no FLOPs): pack the
        state, feed packed-shaped grads through update + apply_updates.
        Elementwise transforms (adam/rmsprop/radam/sgd/adamw, the
        plateau scale, the param EMA) run identically on the fused
        buffers; anything keyed on the params *structure* (e.g.
        ``optim.masked``'s multi_transform label tree) raises here and
        the Trainer falls back to :meth:`wrap_step`.

        Numerics note: packing only regroups leaves — any transform
        that is elementwise or whose reductions span ALL leaves (e.g. a
        global-norm clip) is bit-identical on the packed layout; only a
        hypothetical PER-LEAF-normalizing transform (LARS-style) would
        silently change semantics, and none exists in train/optim.py.
        """
        try:
            def probe(state):
                p = self.pack_state(state)
                grads = jtu.tree_map(jnp.zeros_like, p.params)
                updates, _ = optimizer.update(grads, p.opt_state, p.params)
                return optax.apply_updates(p.params, updates)

            jax.eval_shape(probe, state)
            return True
        except Exception:
            return False

    def flat_step_hooks(self, optimizer) -> dict:
        """Layout hooks for the step factories (train/steps.py): keep the
        train state packed THROUGH the optimizer.

        ``wrap_step`` unpacks/repacks everything around the ordinary
        step, so adam still runs as ~400 per-leaf small-vector ops that
        XLA's memory-space assignment then shuttles between HBM levels
        (the r4 trace's residual ~1.7 ms/step ``copy-start/done``
        bucket, docs/BENCHMARKS.md "Round-4 step decomposition"). With
        these hooks the step unpacks params/stats ONLY for the forward,
        packs the grads once (one concatenate), and the optimizer math
        itself runs on the fused f32 buffers — mu/nu/params updates are
        a handful of large elementwise ops. Gate with
        :meth:`flat_optimizer_ok` first.
        """

        def update_fn(state, grads, **repl):
            pgrads = self.pp.pack(grads)
            updates, opt_state = optimizer.update(pgrads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            if repl.get("batch_stats") is not None:
                repl["batch_stats"] = self.bp.pack(repl["batch_stats"])
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1, **repl)

        return {"param_view": self.pp.unpack,
                "stats_view": self.bp.unpack,
                "update_fn": update_fn}
