#!/usr/bin/env python
"""Probe 5: achieved TFLOP/s + MFU per model family (round-2 follow-up).

VERDICT r1 weak #2 asked where the ResNet-50 step time goes; probes 1-4
attributed it (docs/BENCHMARKS.md). This probe closes the loop by
measuring *achieved FLOP/s* for the full train step across model shapes,
using XLA's own cost model (``compiled.cost_analysis()['flops']``) for
the FLOP count — no hand math — against the measured 146.6 TFLOP/s
matmul ceiling of this chip (perf_probe.py).

Expected shape: ResNet-50 at small images is HBM-bound (~33 TFLOP/s
regardless of 64/128 px); ViT is matmul-dominated and should sit much
closer to the ceiling — evidence the framework's ceiling is the workload
arithmetic intensity, not the step machinery.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CEILING_TFLOPS = 146.6  # measured 8192^3 bf16 matmul, tools/perf_probe.py


def probe(backbone, batch, img, steps=20):
    import jax
    import jax.numpy as jnp
    import optax
    from embeddingnet_tpu.models import EmbeddingModule
    from embeddingnet_tpu.train import TrainState
    from embeddingnet_tpu.train.steps import make_triplet_train_step

    module = EmbeddingModule(backbone_name=backbone, encodings_len=256,
                             embeddings_normalization=True,
                             dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = module.init({"params": rng},
                            jnp.zeros((2, img, img, 3), jnp.float32),
                            train=False)
    optimizer = optax.adam(1e-3)
    state = TrainState.create(variables, optimizer)
    step = jax.jit(
        make_triplet_train_step(module, optimizer, margin=0.5,
                                mode="batch_all",
                                compute_dtype=jnp.bfloat16,
                                max_positives=3),
        donate_argnums=(0,))

    rs = np.random.default_rng(0)
    images = jnp.asarray(rs.integers(0, 255, (batch, img, img, 3)),
                         jnp.uint8)
    labels = jnp.asarray(np.repeat(np.arange(batch // 4), 4), jnp.int32)

    flops = None
    try:
        # keep + execute the AOT executable: AOT compiles don't populate
        # the jit dispatch cache, so step(...) would recompile otherwise
        compiled = step.lower(state, images, labels).compile()
        step = compiled
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:
        print(f"  [cost_analysis unavailable: {e!r}]", file=sys.stderr)

    state, metrics = step(state, images, labels)
    float(metrics["loss"])
    for _ in range(3):
        state, metrics = step(state, images, labels)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, images, labels)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps

    ips = batch / dt
    tflops = flops / dt / 1e12 if flops else float("nan")
    mfu = tflops / CEILING_TFLOPS * 100 if flops else float("nan")
    print(f"{backbone:>10} B={batch:<5} {img}px: {dt * 1e3:7.1f} ms/step "
          f"{ips:8.0f} img/s  {tflops:6.1f} TFLOP/s  "
          f"MFU {mfu:4.1f}% (of measured ceiling)", flush=True)


if __name__ == "__main__":
    for backbone, batch, img in (
        ("resnet50", 1024, 64),
        ("resnet50", 256, 128),
        ("vit-b16", 512, 96),
    ):
        probe(backbone, batch, img)
