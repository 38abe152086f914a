#!/usr/bin/env python
"""Probe 7 (r4): cost of the batch-all P-K lax.cond fusion barrier.

The r3 train-step trace shows a 0.83 ms/step `conditional` — the
runtime grouped-P-K guard in ops/mining.py's batch-all forward
(`lax.cond(fits, pk_path, rowblock_fallback)`). r4 replaced it with an
unconditional P-K path + NaN-poison on violation (the parity-mode
convention). This probe A/Bs the two variants inside the otherwise
identical headline train step, same process, interleaved.

Arm (a) runs the GENUINE r3 code: `git show <r3>:ops/mining.py` is
materialized to a temp module and imported, so the comparison is
production-r3 vs production-r4, not a hand replica. Both arms return
the mining stats as step outputs (exactly like
train/steps.make_triplet_train_step) so neither arm can DCE them.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe7.py
"""

import importlib.util
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

import jax
import jax.numpy as jnp
import optax

from embeddingnet_tpu.models import EmbeddingModule
from embeddingnet_tpu.ops import mining as mining_r4
from embeddingnet_tpu.train import TrainState

R3_REV = "36ac6aa"  # last commit with the lax.cond guard in batch-all
B, IMG, KS = 1024, 64, 4
STEPS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_r3_mining():
    src = subprocess.run(
        ["git", "-C", ROOT, "show",
         f"{R3_REV}:embeddingnet_tpu/ops/mining.py"],
        capture_output=True, text=True, check=True).stdout
    path = "/tmp/_mining_r3_probe7.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("mining_r3", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_step(module, optimizer, mining_mod):
    def step(state, images, labels):
        def loss_fn(params):
            x = (images.astype(jnp.float16)
                 * jnp.float16(1.0 / 255.0)).astype(jnp.bfloat16)
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            emb, mut = module.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": state.rng})
            loss, stats = mining_mod.batch_all_loss(
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
                   "frac_mined": stats.frac_mined,
                   "mean_pos_dist": stats.mean_pos_dist,
                   "mean_neg_dist": stats.mean_neg_dist}
        return new_state, metrics

    return step


def timed(name, step, state, x, labels):
    s = state
    s, m = step(s, x, labels)
    float(m["mean_pos_dist"])
    for _ in range(3):
        s, m = step(s, x, labels)
    float(m["mean_pos_dist"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        s, m = step(s, x, labels)
    float(m["mean_pos_dist"])
    dt = (time.perf_counter() - t0) / STEPS
    log(f"[{name:34s}] {dt * 1e3:7.2f} ms/step  {B / dt:8.0f} img/s")
    return dt


def main():
    mining_r3 = load_r3_mining()
    rng_np = np.random.default_rng(0)
    x = jnp.asarray(rng_np.integers(0, 255, (B, IMG, IMG, 3), np.uint8))
    labels = jnp.asarray(
        np.repeat(np.arange(B // KS), KS).astype(np.int32))

    module = EmbeddingModule(backbone_name="resnet50", encodings_len=256,
                             embeddings_normalization=True,
                             dtype=jnp.bfloat16)
    variables = module.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, IMG, IMG, 3), jnp.float32), train=False)
    optimizer = optax.adam(1e-3)
    state = TrainState.create(variables, optimizer)

    step_a = jax.jit(make_step(module, optimizer, mining_r3))
    step_b = jax.jit(make_step(module, optimizer, mining_r4))

    _, ma = step_a(state, x, labels)
    _, mb = step_b(state, x, labels)
    log(f"first-step mean_pos_dist: r3-cond={float(ma['mean_pos_dist']):.6f}"
        f" r4-poison={float(mb['mean_pos_dist']):.6f} | n_triplets "
        f"{int(ma['n_triplets'])} vs {int(mb['n_triplets'])}")

    res = {"cond": [], "poison": []}
    for rep in range(2):
        res["cond"].append(timed(f"a r3 lax.cond guard rep{rep}",
                                 step_a, state, x, labels))
        res["poison"].append(timed(f"b r4 unconditional+poison rep{rep}",
                                   step_b, state, x, labels))
    da, db = min(res["cond"]), min(res["poison"])
    log(f"best-of-2: cond {da * 1e3:.2f} ms ({B / da:.0f} img/s) | "
        f"poison {db * 1e3:.2f} ms ({B / db:.0f} img/s) | "
        f"delta {(da - db) * 1e3:+.2f} ms ({db / da:.3f}x step time)")


if __name__ == "__main__":
    main()
