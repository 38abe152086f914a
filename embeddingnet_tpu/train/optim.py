"""Optimizer factory, LR schedules, and L2-regularization penalties.

Mirrors the reference factory names (``embedding_net/utils.py:143-153``):
``adam`` / ``rms_prop`` / ``radam`` / anything-else->``sgd`` — as optax
transforms. The Keras per-epoch step-decay ``lr * decay^floor(epoch/step)``
(``tools/train.py:80-81``) becomes an optax schedule over *steps* with the
epoch length folded in; ReduceLROnPlateau stacks multiplicatively via a
mutable scale (see callbacks).
"""

from __future__ import annotations

import re
from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def step_decay_schedule(initial_lr: float, decay_factor: float,
                        step_size_epochs: int, steps_per_epoch: int,
                        warmup_epochs: float = 0.0):
    """``lr * decay^floor(epoch / step_size)`` (``tools/train.py:80-81``),
    optionally preceded by a linear warmup over ``warmup_epochs``."""

    warmup_steps = warmup_epochs * max(steps_per_epoch, 1)

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        lr = initial_lr * decay_factor ** jnp.floor(
            epoch / step_size_epochs)
        if warmup_steps > 0:
            lr = lr * jnp.minimum(1.0, (count + 1) / warmup_steps)
        return lr

    return schedule


def get_optimizer(name: str, learning_rate, **kwargs) -> optax.GradientTransformation:
    """Name -> optax optimizer (``utils.py:143-153`` dispatch table).

    ``learning_rate`` may be a float or an optax schedule. ``radam`` maps
    to ``optax.radam`` with ``threshold=4.0`` — keras-radam
    (``utils.py:148-150``) implements Liu et al. 2019 Algorithm 2, whose
    variance-tractability gate is ``rho_t > 4``; optax's default
    threshold is 5.0, which diverges from keras-radam on the first few
    steps (rho_t crosses 4 -> 5 around steps 5-7 at b2=0.999). Verified
    step-by-step against a paper-formula oracle in
    ``tests/test_optim_callbacks.py``.
    """
    name = (name or "sgd").lower()
    if name == "adam":
        return optax.adam(learning_rate, **kwargs)
    if name == "adamw":
        # beyond the reference dispatch: decoupled weight decay
        # (TRAIN.weight_decay) for ViT-from-scratch recipes
        return optax.adamw(learning_rate, **kwargs)
    if name == "rms_prop":
        return optax.rmsprop(learning_rate, **kwargs)
    if name == "radam":
        kwargs.setdefault("threshold", 4.0)
        return optax.radam(learning_rate, **kwargs)
    return optax.sgd(learning_rate, **kwargs)


def scaled_by_plateau(opt: optax.GradientTransformation
                      ) -> optax.GradientTransformation:
    """Wrap an optimizer with a host-controllable LR multiplier, the
    functional stand-in for Keras ReduceLROnPlateau's mutable ``lr``
    (``tools/train.py:82-83``). The scale rides in the opt state and is
    updated from the host loop via :func:`set_plateau_scale`."""
    return optax.chain(opt, optax.inject_hyperparams(
        lambda plateau_scale: optax.scale(plateau_scale))(plateau_scale=1.0))


def _walk_chain(opt_state, pred):
    """Path (index tuple) to the first element matching ``pred``, searching
    nested chain tuples — composition-robust lookup."""
    if pred(opt_state):
        return ()
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        for i, element in enumerate(opt_state):
            try:
                return (i,) + _walk_chain(element, pred)
            except ValueError:
                continue
    raise ValueError("no matching element in optimizer chain state")


def _get_at(opt_state, path):
    for i in path:
        opt_state = opt_state[i]
    return opt_state


def _set_at(opt_state, path, value):
    if not path:
        return value
    i = path[0]
    return opt_state[:i] + (_set_at(opt_state[i], path[1:], value),) \
        + opt_state[i + 1:]


def set_plateau_scale(opt_state, scale: float):
    """Return opt_state with the plateau LR multiplier replaced.

    Multi-process: the outgoing leaf is a cross-process global array
    (the jitted step's replicated out-sharding); splicing a host-local
    scalar in its place would break the collective Orbax save and the
    next global step. Re-place the new value with the old leaf's
    sharding — every process passes the identical ``scale`` (lockstep
    plateau state), which is exactly ``device_put``'s contract for
    non-addressable shardings. Single-process: plain ``jnp.asarray``.
    """
    path = _walk_chain(opt_state, lambda s: hasattr(s, "hyperparams")
                       and "plateau_scale" in s.hyperparams)
    inner = _get_at(opt_state, path)
    new_hyper = dict(inner.hyperparams)
    old = inner.hyperparams["plateau_scale"]
    new = jnp.asarray(scale, jnp.float32)
    if isinstance(old, jax.Array) and not old.is_fully_addressable:
        new = jax.device_put(new, old.sharding)
    new_hyper["plateau_scale"] = new
    return _set_at(opt_state, path, inner._replace(hyperparams=new_hyper))


def get_plateau_scale(opt_state) -> float:
    path = _walk_chain(opt_state, lambda s: hasattr(s, "hyperparams")
                       and "plateau_scale" in s.hyperparams)
    return float(_get_at(opt_state, path).hyperparams["plateau_scale"])


class ParamEmaState(NamedTuple):
    """Exponential moving average of the *parameters* (not updates)."""

    ema: Any


def track_param_ema(decay: float) -> optax.GradientTransformation:
    """Chainable transform keeping an EMA of the post-update parameters in
    the optimizer state (so it checkpoints/restores with TrainState for
    free). Evaluation/export with EMA weights smooths the train/eval gap
    of from-scratch BN nets (see PERFORMANCE.bn_momentum)."""

    def init(params):
        # materialize a copy: aliasing the live param buffers would make
        # donated train states contain the same buffer twice
        return ParamEmaState(ema=jax.tree_util.tree_map(
            jnp.array, params))

    def update(updates, state, params=None):
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema, new_params)
        return updates, ParamEmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state):
    """Extract the EMA parameter tree from a chained optimizer state."""
    path = _walk_chain(opt_state, lambda s: isinstance(s, ParamEmaState))
    return _get_at(opt_state, path).ema


def masked(opt: optax.GradientTransformation,
           mask) -> optax.GradientTransformation:
    """Freeze params where mask is False (freeze_backbone support,
    ``backbones.py:106-108``)."""
    return optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask))


def l2_penalty(params, rules: Sequence[Tuple[str, float]]) -> jnp.ndarray:
    """Keras-style kernel regularization: ``sum(coeff * sum(w^2))`` over
    params whose path matches a rule regex (Keras ``l2(c)`` adds
    ``c * sum(w^2)`` — no factor 1/2). Rules come from the backbone specs
    (e.g. ``models/simple.py:SIMPLE_REG_RULES`` mirroring
    ``backbones.py:21-36``)."""
    if not rules:
        return jnp.zeros((), jnp.float32)
    compiled = [(re.compile(pat), coeff) for pat, coeff in rules]
    total = jnp.zeros((), jnp.float32)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        for pat, coeff in compiled:
            if pat.match(path_str):
                total = total + coeff * jnp.sum(
                    jnp.square(leaf.astype(jnp.float32)))
                break
    return total


def reg_rules_for(backbone_name: str) -> Sequence[Tuple[str, float]]:
    """Kernel-regularizer coefficients per backbone, from the reference
    layer specs (zoo backbones have none — ``backbones.py:110-121``)."""
    if backbone_name == "simple":
        from embeddingnet_tpu.models.simple import SIMPLE_REG_RULES
        return SIMPLE_REG_RULES
    if backbone_name == "simple2":
        from embeddingnet_tpu.models.simple import SIMPLE2_REG_RULES
        return SIMPLE2_REG_RULES
    return ()
