#!/usr/bin/env python
"""Probe 11: per-compile XLA compiler options through the PJRT tunnel.

Round-2 closed off XLA *flag* tuning because the axon relay's CLIENT
process rejects TPU-backend ``XLA_FLAGS`` env vars (the TPU compiler
runs on the far side — docs/BENCHMARKS.md "the wall"). This probe tries
the OTHER channel that was never exercised: per-compile
``compiler_options`` (PJRT ``env_option_overrides``), which are
serialized into the CompileOptions proto and applied wherever the
compile actually happens — i.e. they may reach the server-side TPU
compiler that env-var flags cannot.

Arms: the exact headline train step (bench.bench_ours construction,
ResNet-50 B=1024 @64px batch-all bf16, packed flat-optimizer state),
AOT-compiled once per option set, timed as a 20-step dependent chain
with one final host fetch (relay-safe sync).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
tools/perf_probe11_compiler_options.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # the headline construction, reused verbatim

STEPS = int(os.environ.get("PROBE_STEPS", 20))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_step_and_args():
    import jax
    import jax.numpy as jnp
    import optax
    from embeddingnet_tpu.train import TrainState
    from embeddingnet_tpu.train.steps import make_triplet_train_step
    from embeddingnet_tpu.train.packing import StatePacker

    module, variables = bench.build_model(jnp, jnp.bfloat16)
    optimizer = optax.adam(1e-3)
    state = TrainState.create(variables, optimizer)
    step_kwargs = dict(margin=0.5, mode="batch_all",
                       compute_dtype=jnp.bfloat16, augment_fn=None,
                       max_positives=bench.K_SAMPLES - 1)
    packer = StatePacker(state)
    assert packer.flat_optimizer_ok(state, optimizer)
    base_step = make_triplet_train_step(
        module, optimizer, **step_kwargs, **packer.flat_step_hooks(optimizer))
    state = jax.jit(packer.pack_state)(state)
    step = jax.jit(base_step, donate_argnums=(0,))

    images_np, labels_np = bench.make_batch(bench.BATCH, bench.IMG)
    images = jnp.asarray(images_np)
    labels = jnp.asarray(labels_np)
    return step, state, images, labels


def time_arm(name, step, state, images, labels, options):
    # the step donates its state arg, so each arm consumes the previous
    # arm's returned state (same shapes/layout; re-putting ~300 MB of
    # state through the relay per arm stalls for minutes)
    t0 = time.perf_counter()
    try:
        lowered = step.lower(state, images, labels)
        compiled = (lowered.compile(compiler_options=options)
                    if options else lowered.compile())
    except Exception as e:
        log(f"[{name}] COMPILE REJECTED: {type(e).__name__}: "
            f"{str(e)[:300]}")
        return None, state
    log(f"[{name}] compiled in {time.perf_counter() - t0:.1f}s")
    try:
        s, metrics = compiled(state, images, labels)
        for _ in range(3):
            s, metrics = compiled(s, images, labels)
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            s, metrics = compiled(s, images, labels)
        loss = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / STEPS
    except Exception as e:
        log(f"[{name}] EXEC FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None, state
    log(f"[{name}] {dt * 1e3:.2f} ms/step -> {bench.BATCH / dt:.0f} img/s "
        f"(loss={loss:.4f})")
    return dt, s


ARMS = [
    ("baseline", None),
    # VMEM budget for fusion scoping — larger budget can admit bigger
    # conv/elementwise fusions (v5e has 128 MiB VMEM; default ~16 MiB)
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # Memory-space-assignment prefetch knobs — the 1.7 ms copy-start
    # bucket is MSA-scheduled small-param prefetch
    ("msa_bw_2x", {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    # Latency-hiding scheduler (usually default-on on TPU; confirm)
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # bf16 conv precision already lowest; try full-precision OFF knobs as
    # a sanity check that options take effect at all (should be a no-op
    # or slower if it flips anything)
    ("conv_fullprec", {"xla_jf_conv_full_precision": "true"}),
    # repeat baseline at the end to gauge relay/session drift
    ("baseline2", None),
]


def main():
    step, state, images, labels = build_step_and_args()
    results = {}
    for name, options in ARMS:
        dt, state = time_arm(name, step, state, images, labels, options)
        results[name] = dt
    log("=== summary ===")
    base = results.get("baseline")
    for name, dt in results.items():
        if dt is None:
            log(f"{name:>14}: rejected/failed")
        else:
            rel = (base / dt) if base else float("nan")
            log(f"{name:>14}: {dt * 1e3:7.2f} ms/step  ({rel:.3f}x vs base)")


if __name__ == "__main__":
    main()
