#!/usr/bin/env python
"""Probe 8 (r4): do packed small-param buffers recover the copy-start waits?

The r3 train-step trace attributes 2.01 ms/step to `copy-start`/`copy-done`
pairs — XLA memory-space-assignment prefetches of ~40 small f32 vectors
(BN scale/bias/stats + their adam moments, f32[64..2048]). TPU-backend
scheduling flags are rejected by the axon relay, but the *program* can be
restructured: store every small f32 leaf (params, adam mu/nu, batch_stats)
as one contiguous flat buffer each, so MSA prefetches a handful of large
buffers instead of ~40 tiny ones.

Arm (a): the production headline step (probe7's r4 arm — unconditional
P-K batch-all, resnet50 bf16, B=1024@64px, adam).
Arm (b): identical math, but params' small f32 leaves live in one flat
vector (adam state follows via optax's pytree-genericity: mu/nu become
single flat vectors too) and batch_stats live in another. Unpack = static
slices + reshapes inside the step; repack of mutated BN stats = one
concatenate. First-step mining stats must match arm (a) exactly.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe8.py
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax import tree_util as jtu

from embeddingnet_tpu.models import EmbeddingModule
from embeddingnet_tpu.ops import mining
from embeddingnet_tpu.train import TrainState

B, IMG, KS = 1024, 64, 4
STEPS = 20
SMALL = 8192  # elements; resnet50 BN vectors are <= 2048


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class Packer:
    """Flatten a pytree's small f32 leaves into one contiguous vector.

    Leaves above the threshold (conv kernels, dense matrices) pass through
    untouched; small f32 leaves are stored concatenated and recovered with
    static slices + reshapes (free under XLA fusion at these sizes).
    """

    def __init__(self, tree, thresh=SMALL):
        leaves, self.treedef = jtu.tree_flatten(tree)
        self.n = len(leaves)
        self.small = [i for i, l in enumerate(leaves)
                      if l.size <= thresh and l.dtype == jnp.float32]
        small_set = set(self.small)
        self.large = [i for i in range(self.n) if i not in small_set]
        self.shapes = [tuple(leaves[i].shape) for i in self.small]
        sizes = [int(np.prod(s)) for s in self.shapes]
        self.offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(int)

    def pack(self, tree):
        leaves = jtu.tree_flatten(tree)[0]
        flat = (jnp.concatenate([leaves[i].reshape(-1) for i in self.small])
                if self.small else jnp.zeros((0,), jnp.float32))
        return {"large": tuple(leaves[i] for i in self.large), "flat": flat}

    def unpack(self, packed):
        leaves = [None] * self.n
        for j, i in enumerate(self.large):
            leaves[i] = packed["large"][j]
        flat = packed["flat"]
        for j, i in enumerate(self.small):
            o0, o1 = int(self.offsets[j]), int(self.offsets[j + 1])
            leaves[i] = flat[o0:o1].reshape(self.shapes[j])
        return jtu.tree_unflatten(self.treedef, leaves)


def make_baseline_step(module, optimizer):
    def step(state, images, labels):
        def loss_fn(params):
            x = (images.astype(jnp.float16)
                 * jnp.float16(1.0 / 255.0)).astype(jnp.bfloat16)
            emb, mut = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": state.rng})
            loss, stats = mining.batch_all_loss(
                emb.astype(jnp.float32), labels, margin=0.5,
                max_positives=KS - 1)
            return loss, (stats, mut["batch_stats"])

        grads, (stats, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  batch_stats=new_stats,
                                  step=state.step + 1)
        metrics = {"n_triplets": stats.n_triplets,
                   "mean_pos_dist": stats.mean_pos_dist}
        return new_state, metrics

    return step


def make_packed_step(module, optimizer, pp, bp, rng):
    def step(carry, images, labels):
        params_packed, opt_state, bs_flat = carry

        def loss_fn(pk):
            params = pp.unpack(pk)
            bs = bp.unpack({"large": (), "flat": bs_flat})
            x = (images.astype(jnp.float16)
                 * jnp.float16(1.0 / 255.0)).astype(jnp.bfloat16)
            emb, mut = module.apply(
                {"params": params, "batch_stats": bs},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            loss, stats = mining.batch_all_loss(
                emb.astype(jnp.float32), labels, margin=0.5,
                max_positives=KS - 1)
            return loss, (stats, bp.pack(mut["batch_stats"])["flat"])

        grads, (stats, new_bs) = jax.grad(
            loss_fn, has_aux=True)(params_packed)
        updates, opt_state = optimizer.update(grads, opt_state,
                                              params_packed)
        params_packed = optax.apply_updates(params_packed, updates)
        metrics = {"n_triplets": stats.n_triplets,
                   "mean_pos_dist": stats.mean_pos_dist}
        return (params_packed, opt_state, new_bs), metrics

    return step


def make_wrapped_step(base_step, template_state):
    """Arm (c): the shipped containment — the production
    :class:`train.packing.StatePacker` wraps the untouched baseline step
    (pack/unpack INSIDE the jitted program). Per-leaf adam ops remain,
    but every state buffer crossing the step boundary is one of a
    handful of flat vectors. If this matches arm (b), the production
    integration needs zero changes to steps.py/optimizers."""
    from embeddingnet_tpu.train.packing import StatePacker
    packer = StatePacker(template_state)
    return packer.wrap_step(base_step), packer.pack_state


def timed(name, run_once):
    # run_once() advances the arm's own carried state and returns a metric
    d = None
    run_once()
    for _ in range(3):
        m = run_once()
    float(m)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        m = run_once()
    float(m)
    d = (time.perf_counter() - t0) / STEPS
    log(f"[{name:30s}] {d * 1e3:7.2f} ms/step  {B / d:8.0f} img/s")
    return d


def main():
    rng_np = np.random.default_rng(0)
    x = jnp.asarray(rng_np.integers(0, 255, (B, IMG, IMG, 3), np.uint8))
    labels = jnp.asarray(np.repeat(np.arange(B // KS), KS).astype(np.int32))

    module = EmbeddingModule(backbone_name="resnet50", encodings_len=256,
                             embeddings_normalization=True,
                             dtype=jnp.bfloat16)
    variables = module.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, IMG, IMG, 3), jnp.float32), train=False)
    optimizer = optax.adam(1e-3)
    state = TrainState.create(variables, optimizer)

    pp = Packer(variables["params"])
    bp = Packer(variables["batch_stats"], thresh=1 << 30)  # pack everything
    n_small = len(pp.small) + len(bp.small)
    small_bytes = (int(pp.offsets[-1]) + int(bp.offsets[-1])) * 4
    log(f"packed leaves: {len(pp.small)} params + {len(bp.small)} "
        f"batch_stats = {n_small} vectors, {small_bytes / 1024:.0f} KiB "
        f"(adam mu/nu follow the param packing -> "
        f"{len(pp.small) * 2} more vectors fused)")

    base_step = make_baseline_step(module, optimizer)
    step_a = jax.jit(base_step)
    step_b = jax.jit(make_packed_step(module, optimizer, pp, bp, state.rng))
    wrapped, pack_state = make_wrapped_step(base_step, state)
    step_c = jax.jit(wrapped)

    params_packed = pp.pack(variables["params"])
    bs_flat = bp.pack(variables["batch_stats"])["flat"]
    opt_state_b = optimizer.init(params_packed)
    carry_b = (params_packed, opt_state_b, bs_flat)
    pstate_c = jax.jit(pack_state)(state)

    _, ma = step_a(state, x, labels)
    _, mb = step_b(carry_b, x, labels)
    _, mc = step_c(pstate_c, x, labels)
    log(f"first-step mean_pos_dist: baseline="
        f"{float(ma['mean_pos_dist']):.6f} packed="
        f"{float(mb['mean_pos_dist']):.6f} wrapped="
        f"{float(mc['mean_pos_dist']):.6f} | n_triplets "
        f"{int(ma['n_triplets'])} vs {int(mb['n_triplets'])} vs "
        f"{int(mc['n_triplets'])}")

    # each arm carries its own state across the timing chain
    sa = {"s": state}
    sb = {"c": carry_b}
    sc = {"s": pstate_c}

    def run_a():
        sa["s"], m = step_a(sa["s"], x, labels)
        return m["mean_pos_dist"]

    def run_b():
        sb["c"], m = step_b(sb["c"], x, labels)
        return m["mean_pos_dist"]

    def run_c():
        sc["s"], m = step_c(sc["s"], x, labels)
        return m["mean_pos_dist"]

    res = {"base": [], "packed": [], "wrapped": []}
    for rep in range(2):
        res["base"].append(timed(f"a baseline rep{rep}", run_a))
        res["packed"].append(timed(f"b packed-small rep{rep}", run_b))
        res["wrapped"].append(timed(f"c generic-wrapper rep{rep}", run_c))
    da, db = min(res["base"]), min(res["packed"])
    dc = min(res["wrapped"])
    log(f"best-of-2: baseline {da * 1e3:.2f} ms ({B / da:.0f} img/s) | "
        f"packed {db * 1e3:.2f} ms ({B / db:.0f} img/s) | "
        f"wrapped {dc * 1e3:.2f} ms ({B / dc:.0f} img/s) | "
        f"b delta {(da - db) * 1e3:+.2f} ms ({db / da:.3f}x) | "
        f"c delta {(da - dc) * 1e3:+.2f} ms ({dc / da:.3f}x)")


if __name__ == "__main__":
    main()
