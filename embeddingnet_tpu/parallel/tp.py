"""Tensor-parallel (model-axis) parameter sharding.

Megatron-style TP expressed the GSPMD way (the scaling-book recipe):
annotate parameter shardings over the mesh's ``model`` axis and let XLA
propagate activation shardings and insert the collectives. Column-
parallel fc1 / row-parallel fc2 in transformer MLPs (one all-reduce per
MLP), head-sharded attention projections (heads are embarrassingly
parallel; one all-reduce after the output projection), and class-sharded
classifier / ArcFace weight matrices (logits sharded over classes; the
softmax's global max/sum become small collectives).

The reference has no model parallelism at all (SURVEY §2.3 — its only
strategy is single-host MirroredStrategy DP, ``tools/train.py:121-140``);
this extends the config's ``MESH.model`` axis beyond DP for the stretch
ViT / large-head configs. Conv backbones are left replicated: at 48-128px
no conv weight is worth sharding.

Rules match on *path suffixes*, so the same table covers ``params``,
adam's ``mu``/``nu``, and the EMA shadow (their trees mirror the param
tree under different prefixes). Anything unmatched — or matched with an
unexpected rank — stays replicated, so TP is always a safe no-op for
models with no shardable weights.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path suffix, spec). Longest matching suffix wins; specs shorter than
# the leaf rank are left-padded with None (leading batch/extra dims
# replicated). Layer names: models/vit.py (attn q/k/v/out, mlp fc1/fc2),
# models/registry.py (ArcFaceModule.class_weights), models/heads.py
# (SoftmaxHead logits dense).
_RULES: Tuple[Tuple[Tuple[str, ...], P], ...] = (
    # transformer MLP: column-parallel fc1, row-parallel fc2
    (("mlp", "fc1", "kernel"), P(None, "model")),
    (("mlp", "fc1", "bias"), P("model")),
    (("mlp", "fc2", "kernel"), P("model", None)),
    # attention: shard the head axis of q/k/v/out projections
    (("query", "kernel"), P(None, "model", None)),
    (("key", "kernel"), P(None, "model", None)),
    (("value", "kernel"), P(None, "model", None)),
    (("query", "bias"), P("model", None)),
    (("key", "bias"), P("model", None)),
    (("value", "bias"), P("model", None)),
    (("out", "kernel"), P("model", None, None)),
    # class-sharded classifier matrices (ArcFace / softmax pretraining)
    (("class_weights",), P("model", None)),
    (("softmax_head", "logits", "kernel"), P(None, "model")),
    (("softmax_head", "logits", "bias"), P("model")),
)


def _path_keys(path) -> Tuple[str, ...]:
    out = []
    for k in path:
        key = getattr(k, "key", None)
        if key is None:
            key = getattr(k, "idx", None)
        if key is None:
            key = getattr(k, "name", k)
        out.append(str(key))
    return tuple(out)


def spec_for_path(keys: Tuple[str, ...], ndim: int) -> P:
    """PartitionSpec for a leaf at ``keys`` with rank ``ndim`` — P() when
    no rule matches or the matched spec cannot fit the rank."""
    best = None
    for suffix, spec in _RULES:
        if len(suffix) <= len(keys) and tuple(keys[-len(suffix):]) == suffix:
            if best is None or len(suffix) > len(best[0]):
                best = (suffix, spec)
    if best is None:
        return P()
    spec = best[1]
    if len(spec) > ndim:
        return P()
    # left-pad: rules describe the trailing dims of the canonical shape
    return P(*([None] * (ndim - len(spec)) + list(spec)))


def tp_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for any state/param tree: model-axis specs
    from the suffix rules, everything else replicated."""

    def leaf_sharding(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec_for_path(_path_keys(path), ndim))

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def shard_train_step_tp(step_fn: Callable, mesh: Mesh, state: Any, *,
                        donate: bool = True, n_batch_args: int = 2):
    """Jit ``step_fn(state, *batch)`` with batch sharded over ``data`` AND
    parameters sharded over ``model`` per the TP rules. Drop-in superset
    of :func:`sharded.shard_train_step` (identical when no rule matches —
    every spec degenerates to replicated)."""
    state_shardings = tp_shardings(state, mesh)
    batch_sharding = NamedSharding(mesh, P("data"))
    in_shardings = (state_shardings,) + (batch_sharding,) * n_batch_args
    out_metrics = NamedSharding(mesh, P())
    return jax.jit(step_fn,
                   in_shardings=in_shardings,
                   out_shardings=(state_shardings, out_metrics),
                   donate_argnums=(0,) if donate else ())


def device_put_state(state, mesh: Mesh):
    """Place a (host / single-device) state onto the mesh with TP specs —
    the initial distribution step before the first sharded call."""
    return jax.device_put(state, tp_shardings(state, mesh))
