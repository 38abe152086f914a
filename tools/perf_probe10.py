#!/usr/bin/env python
"""Probe 10 (r5): does running the optimizer ON the packed buffers
recover the residual copy-start waits?

Probe 8 (r4) packed the state BETWEEN steps (wrap_step: unpack ->
ordinary step -> repack) and recovered only 0.33 of the ~2 ms
copy-start/done bucket; a donation-on recount still showed ~750 small
copies — XLA keeps staging the per-leaf adam intermediates. This probe
compares, interleaved on the same process:

  arm (a): wrap_step (the r4 production layout), and
  arm (b): flat_step_hooks — grads packed once, adam/apply_updates run
           directly on the fused flat buffers (train/packing.py r5).

Both arms donate the input state (matching bench.py). Also captures a
jax.profiler trace of each arm (TRACE_DIR env, default off) for
tools/trace_diff.py against docs/traces/r4_train_step.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe10.py
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

from embeddingnet_tpu.models import EmbeddingModule
from embeddingnet_tpu.train import TrainState
from embeddingnet_tpu.train.packing import StatePacker
from embeddingnet_tpu.train.steps import make_triplet_train_step

B, IMG, KS = 1024, 64, 4
STEPS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    module = EmbeddingModule(backbone_name="resnet50", encodings_len=256,
                             embeddings_normalization=True,
                             dtype=jnp.bfloat16)
    variables = module.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                            train=False)
    optimizer = optax.adam(1e-3)
    state0 = TrainState.create(variables, optimizer)
    packer = StatePacker(state0)
    assert packer.flat_optimizer_ok(state0, optimizer)

    kwargs = dict(margin=0.5, mode="batch_all", compute_dtype=jnp.bfloat16,
                  max_positives=KS - 1)
    step_a = jax.jit(packer.wrap_step(
        make_triplet_train_step(module, optimizer, **kwargs)),
        donate_argnums=(0,))
    step_b = jax.jit(
        make_triplet_train_step(module, optimizer, **kwargs,
                                **packer.flat_step_hooks(optimizer)),
        donate_argnums=(0,))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, IMG, IMG, 3), np.uint8))
    labels = jnp.asarray(np.repeat(np.arange(B // KS), KS).astype(np.int32))

    def run(step, tag, trace_to=None):
        state = jax.jit(packer.pack_state)(state0)
        state, m = step(state, images, labels)  # compile + step 1
        float(m["loss"])
        for _ in range(3):
            state, m = step(state, images, labels)
        float(m["loss"])
        if trace_to:
            jax.profiler.start_trace(trace_to)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = step(state, images, labels)
        loss = float(m["loss"])  # true sync: host fetch
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        if trace_to:
            jax.profiler.stop_trace()
        log(f"[{tag}] {dt:.2f} ms/step (loss={loss:.4f})")
        return dt

    trace_dir = os.environ.get("TRACE_DIR")
    # interleaved best-of-2 to cancel slow drift on the shared chip
    res = {"wrap": [], "flat": []}
    for i in range(2):
        res["wrap"].append(run(step_a, f"wrap_step pass {i}"))
        res["flat"].append(run(step_b, f"flat_hooks pass {i}"))
    if trace_dir:
        run(step_b, "flat_hooks traced", trace_to=trace_dir)
    a, b = min(res["wrap"]), min(res["flat"])
    log(f"best wrap_step {a:.2f} ms, flat_hooks {b:.2f} ms "
        f"({a - b:+.2f} ms, {a / b:.3f}x)")


if __name__ == "__main__":
    main()
