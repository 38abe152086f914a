"""Jitted train/eval steps — one device program per batch.

The reference crosses the host<->device boundary twice per training step
(mining predict inside the generator + ``train_on_batch``,
``embedding_net/datagenerators.py:214`` / ``tools/train.py:172``); each
factory here fuses normalize -> augment -> encode -> mine -> loss -> grad
-> update into a single XLA program. Factories return pure functions
``step(state, batch...) -> (state, metrics)`` ready for ``jax.jit`` or
``shard_map`` over a mesh (see :mod:`embeddingnet_tpu.parallel`).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from embeddingnet_tpu.ops import losses as loss_ops
from embeddingnet_tpu.ops import mining
from embeddingnet_tpu.train.optim import l2_penalty
from embeddingnet_tpu.train.state import TrainState

AugmentFn = Callable[[jnp.ndarray, jax.Array], jnp.ndarray]


def _optax_tail(optimizer):
    """Standard update tail shared by the train-step factories:
    ``optimizer.update`` + ``apply_updates`` over whatever layout
    ``state.params`` / ``state.opt_state`` carry."""

    def update_fn(state, grads, **repl):
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1, **repl)

    return update_fn


# Layout hooks (r5): the train-step factories accept
#   param_view(state.params) -> params for the forward/grad,
#   stats_view(state.batch_stats) -> batch_stats for the forward,
#   update_fn(state, grads, *, batch_stats, rng) -> new state,
# so a packed train state (train/packing.py) can stay packed THROUGH
# the optimizer: grads are packed once and adam/rmsprop/... run as a
# handful of fused ops on the flat buffers instead of ~400 per-leaf
# small-vector updates the TPU scheduler then shuffles between memory
# spaces (the r4 trace's 1.75 ms/step copy-start/done bucket). Defaults
# are identity / the standard optax tail.


def _preprocess(images: jnp.ndarray, dtype, augment_fn: Optional[AugmentFn],
                rng: jax.Array) -> jnp.ndarray:
    """uint8 BGR batch -> augmented, /255-normalized compute-dtype batch.

    Augmentation operates in 0..255 float space (albumentations semantics,
    ``datagenerators.py:145-156``), normalization after — same order as the
    reference.

    uint8 loads convert through float16 — XLA's direct u8->f32 path does an
    expensive (32,128)->(8,128) retiling (measured 2.6 ms vs 1.8 ms at
    [1024,64,64,3], tools/perf_probe2.py); u8 values are exact in f16, so
    the bridge is lossless. The f16 *multiply* shortcut is only taken when
    the compute dtype is bf16 (f16 mantissa covers bf16's — no precision
    loss vs the f32 divide); f32 compute keeps the exact f32 divide for
    <1e-5 reference parity.
    """
    if images.dtype == jnp.uint8:
        x = images.astype(jnp.float16)
        if augment_fn is None and dtype == jnp.bfloat16:
            return (x * jnp.float16(1.0 / 255.0)).astype(dtype)
        x = x.astype(jnp.float32)
    else:
        x = images.astype(jnp.float32)
    if augment_fn is not None:
        x = augment_fn(x, rng)
    return (x / 255.0).astype(dtype)


def _apply_model(module, params, batch_stats, x, train: bool,
                 dropout_rng: jax.Array, method=None, remat: bool = False):
    def apply_fn(params, x):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mutated = module.apply(
            variables, x, train=train, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
            **({"method": method} if method else {}))
        return out, mutated.get("batch_stats", batch_stats)

    if remat:
        # rematerialize activations in the backward pass: trade FLOPs for
        # HBM (PERFORMANCE.remat — big-batch / big-backbone configs)
        apply_fn = jax.checkpoint(apply_fn)
    return apply_fn(params, x)


def make_triplet_train_step(module, optimizer: optax.GradientTransformation,
                            *, margin: float = 0.5, mode: str = "semihard",
                            augment_fn: Optional[AugmentFn] = None,
                            reg_rules: Sequence = (),
                            compute_dtype=jnp.float32,
                            remat: bool = False,
                            max_positives=None,
                            param_view=None, stats_view=None,
                            update_fn=None):
    """Online-mining triplet step over P-K batches ``(images, labels)``.

    Replaces the reference's generator->predict->sklearn->select pipeline
    (``datagenerators.py:201-258``) with in-step mining on the *current*
    embeddings (the reference mined on pre-step embeddings — strictly
    staler; documented improvement).
    """

    def _mine(emb, labels, mine_rng):
        return mining.mined_triplet_loss(emb, labels, margin=margin,
                                         mode=mode, rng=mine_rng,
                                         max_positives=max_positives)

    update = update_fn or _optax_tail(optimizer)

    def step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray
             ) -> Tuple[TrainState, dict]:
        rng, aug_rng, drop_rng, mine_rng = jax.random.split(state.rng, 4)
        params0 = param_view(state.params) if param_view else state.params
        stats0 = (stats_view(state.batch_stats) if stats_view
                  else state.batch_stats)

        def loss_fn(params):
            x = _preprocess(images, compute_dtype, augment_fn, aug_rng)
            emb, new_stats = _apply_model(module, params, stats0,
                                          x, True, drop_rng, remat=remat)
            emb = emb.astype(jnp.float32)
            loss, stats = _mine(emb, labels, mine_rng)
            total = loss + l2_penalty(params, reg_rules)
            return total, (loss, stats, new_stats)

        grads, (raw_loss, stats, new_stats) = jax.grad(
            loss_fn, has_aux=True)(params0)
        new_state = update(state, grads, batch_stats=new_stats, rng=rng)
        metrics = {
            "loss": raw_loss,
            "n_triplets": stats.n_triplets,
            "frac_mined": stats.frac_mined,
            "mean_pos_dist": stats.mean_pos_dist,
            "mean_neg_dist": stats.mean_neg_dist,
        }
        return new_state, metrics

    return step


def make_triplet_eval_step(module, *, margin: float = 0.5,
                           compute_dtype=jnp.float32):
    """Val loss on offline (a, p, n) batches — mirrors the reference using
    ``SimpleTripletsDataGenerator`` for validation (``tools/train.py:148-150``)
    with the per-sample squared-L2 hinge (``losses_and_accuracies.py:26-42``)."""

    def step(state: TrainState, anchors, positives, negatives) -> dict:
        def encode(imgs):
            x = _preprocess(imgs, compute_dtype, None, None)
            emb, _ = _apply_model(module, state.params, state.batch_stats,
                                  x, False, state.rng)
            return emb.astype(jnp.float32)

        stacked = jnp.concatenate([anchors, positives, negatives], axis=0)
        emb = encode(stacked)
        e_a, e_p, e_n = jnp.split(emb, 3, axis=0)
        per_sample = loss_ops.triplet_hinge(e_a, e_p, e_n, margin)
        return {"loss": jnp.mean(per_sample)}

    return step


def make_siamese_train_step(module, optimizer: optax.GradientTransformation,
                            *, distance_type: str = "l1",
                            contrastive_margin: float = 1.0,
                            augment_fn: Optional[AugmentFn] = None,
                            reg_rules: Sequence = (),
                            compute_dtype=jnp.float32,
                            param_view=None, stats_view=None,
                            update_fn=None):
    """Siamese pair step: contrastive loss on the pair-distance output
    (``tools/train.py:108-119``) + the 0.5-threshold pair accuracy metric
    (``losses_and_accuracies.py:47-50``).

    ``module`` must be a :class:`registry.SiameseModule` (encoder + L1
    head) so the Dense(1,sigmoid) distance head trains jointly
    (``models.py:217-221``).
    """

    update = update_fn or _optax_tail(optimizer)

    def step(state: TrainState, images_1, images_2, targets
             ) -> Tuple[TrainState, dict]:
        rng, aug1, aug2, drop_rng = jax.random.split(state.rng, 4)
        params0 = param_view(state.params) if param_view else state.params
        stats0 = (stats_view(state.batch_stats) if stats_view
                  else state.batch_stats)

        def loss_fn(params):
            x1 = _preprocess(images_1, compute_dtype, augment_fn, aug1)
            x2 = _preprocess(images_2, compute_dtype, augment_fn, aug2)
            (d, _e1, _e2), new_stats = _apply_model(
                module, params, stats0,
                (x1, x2), True, drop_rng)
            d = d.astype(jnp.float32)
            loss = loss_ops.contrastive_loss(targets, d, contrastive_margin)
            total = loss + l2_penalty(params, reg_rules)
            return total, (loss, d, new_stats)

        grads, (raw_loss, d, new_stats) = jax.grad(
            loss_fn, has_aux=True)(params0)
        new_state = update(state, grads, batch_stats=new_stats, rng=rng)
        metrics = {"loss": raw_loss,
                   "accuracy": loss_ops.accuracy(targets, d)}
        return new_state, metrics

    return step


def make_siamese_eval_step(module, *, contrastive_margin: float = 1.0,
                           compute_dtype=jnp.float32):
    def step(state: TrainState, images_1, images_2, targets) -> dict:
        x1 = _preprocess(images_1, compute_dtype, None, None)
        x2 = _preprocess(images_2, compute_dtype, None, None)
        (d, _e1, _e2), _ = _apply_model(module, state.params,
                                        state.batch_stats, (x1, x2), False,
                                        state.rng)
        d = d.astype(jnp.float32)
        return {"loss": loss_ops.contrastive_loss(targets, d,
                                                  contrastive_margin),
                "accuracy": loss_ops.accuracy(targets, d)}

    return step


def make_softmax_train_step(module, optimizer: optax.GradientTransformation,
                            *, n_classes: int,
                            augment_fn: Optional[AugmentFn] = None,
                            compute_dtype=jnp.float32):
    """Softmax-pretraining step (``embedding_net/backbones.py:128-204``):
    categorical cross-entropy on GAP+Dense(n_classes) logits. ``module``
    is a :class:`registry.SoftmaxModule` sharing the backbone params."""

    def step(state: TrainState, images, labels) -> Tuple[TrainState, dict]:
        rng, aug_rng, drop_rng = jax.random.split(state.rng, 3)
        onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)

        def loss_fn(params):
            x = _preprocess(images, compute_dtype, augment_fn, aug_rng)
            logits, new_stats = _apply_model(module, params,
                                             state.batch_stats, x, True,
                                             drop_rng)
            logits = logits.astype(jnp.float32)
            loss = loss_ops.softmax_cross_entropy(logits, onehot)
            return loss, (logits, new_stats)

        grads, (logits, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  batch_stats=new_stats, rng=rng,
                                  step=state.step + 1)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return new_state, {"loss": loss_ops.softmax_cross_entropy(
            logits, onehot), "accuracy": acc}

    return step


def make_softmax_eval_step(module, *, n_classes: int,
                           compute_dtype=jnp.float32):
    """Val-mode CE loss + accuracy for the pretraining phase — the
    reference validates pretraining with a val ``SimpleDataGenerator``
    (``embedding_net/backbones.py:161-167``)."""

    def step(state: TrainState, images, labels) -> dict:
        x = _preprocess(images, compute_dtype, None, None)
        logits, _ = _apply_model(module, state.params, state.batch_stats,
                                 x, False, state.rng)
        logits = logits.astype(jnp.float32)
        onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return {"loss": loss_ops.softmax_cross_entropy(logits, onehot),
                "accuracy": acc}

    return step


def make_arcface_train_step(module, optimizer: optax.GradientTransformation,
                            *, n_classes: int, margin: float = 0.5,
                            scale: float = 64.0,
                            augment_fn: Optional[AugmentFn] = None,
                            compute_dtype=jnp.float32,
                            param_view=None, stats_view=None,
                            update_fn=None):
    """ArcFace margin-loss step (stretch mode beyond the reference —
    BASELINE.json configs[4]). ``module`` is a
    :class:`registry.ArcFaceModule` (encoder + class-weight matrix)."""

    update = update_fn or _optax_tail(optimizer)

    def step(state: TrainState, images, labels) -> Tuple[TrainState, dict]:
        rng, aug_rng, drop_rng = jax.random.split(state.rng, 3)
        params0 = param_view(state.params) if param_view else state.params
        stats0 = (stats_view(state.batch_stats) if stats_view
                  else state.batch_stats)

        def loss_fn(params):
            x = _preprocess(images, compute_dtype, augment_fn, aug_rng)
            (emb, weights), new_stats = _apply_model(
                module, params, stats0, x, True, drop_rng)
            loss = loss_ops.arcface_loss(
                emb.astype(jnp.float32), labels,
                weights.astype(jnp.float32), margin=margin, scale=scale)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params0)
        new_state = update(state, grads, batch_stats=new_stats, rng=rng)
        return new_state, {"loss": loss}

    return step


def make_eval_step(module, *, compute_dtype=jnp.float32):
    """Plain encode step for encodings export / parity checks."""

    def step(state: TrainState, images) -> jnp.ndarray:
        x = _preprocess(images, compute_dtype, None, None)
        emb, _ = _apply_model(module, state.params, state.batch_stats, x,
                              False, state.rng)
        return emb.astype(jnp.float32)

    return step
