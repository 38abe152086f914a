#!/usr/bin/env python
"""Benchmark: triplet-train images/sec/chip, ResNet-50, batch 1024,
batch-all mining, bf16 — the north-star metric (BASELINE.md).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}``

``vs_baseline`` compares against a locally measured emulation of the
*reference architecture* on the same chip (the reference publishes no
numbers — BASELINE.md says measure locally). The emulation reproduces the
reference's per-step structure with generous substitutions (its TF-CPU
compute is replaced by our XLA-compiled encoder, so the gap measured is
purely architectural):

* per-class ``predict`` round-trips from the data layer
  (``embedding_net/datagenerators.py:211-215``: one host->device->host
  call per class chunk);
* host sklearn ``pairwise_distances`` + Python anchor-positive mining loop
  (``datagenerators.py:219-244``);
* a second device pass training on the mined triplets via the 3-stream
  concatenated model (``models.py:176-189``, ``tools/train.py:172``).

The baseline number is cached in ``BASELINE_LOCAL.json`` (delete to
re-measure). All timing loops block every iteration (axon relay queue —
see .claude/skills/verify/SKILL.md).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 1024))
IMG = int(os.environ.get("BENCH_IMG", 64))
K_SAMPLES = 4
STEPS = int(os.environ.get("BENCH_STEPS", 20))
BASELINE_STEPS = int(os.environ.get("BENCH_BASELINE_STEPS", 3))
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_LOCAL.json")

# Measured once, carried as constants (provenance in docs/BENCHMARKS.md):
# the genuine reference repo's images/sec on this host's CPU (r2,
# tools/measure_reference.py) and the chip's measured bf16 matmul
# ceiling (tools/perf_probe4.py sweep).
GENUINE_REF_IPS = 13.3
MEASURED_PEAK_FLOPS = 146.6e12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(batch, img):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (batch, img, img, 3), dtype=np.uint8)
    labels = np.repeat(np.arange(batch // K_SAMPLES), K_SAMPLES).astype(
        np.int32)
    return images, labels


def build_model(jnp, dtype):
    import jax
    from embeddingnet_tpu.models import EmbeddingModule
    # BENCH_PALLAS_CONV=1 -> PERFORMANCE.pallas_conv (the Pallas
    # small-spatial 3x3 conv path, ops/fused_conv.py) for A/B runs
    fast_conv = os.environ.get("BENCH_PALLAS_CONV") == "1"
    module = EmbeddingModule(backbone_name="resnet50", encodings_len=256,
                             embeddings_normalization=True, dtype=dtype,
                             fast_conv=fast_conv)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    variables = module.init({"params": rng}, dummy, train=False)
    return module, variables


def bench_ours(batch, augment: bool = False):
    import jax
    import jax.numpy as jnp
    import optax
    from embeddingnet_tpu.train import TrainState
    from embeddingnet_tpu.train.steps import make_triplet_train_step

    tag = "ours+aug" if augment else "ours"
    augment_fn = None
    if augment:
        # the flagship config's actual setting
        # (configs/resnet50_batchall_1024.yml: augmentations 'default')
        from embeddingnet_tpu.ops.augment import get_aug
        augment_fn = get_aug("default", (IMG, IMG, 3))

    module, variables = build_model(jnp, jnp.bfloat16)
    optimizer = optax.adam(1e-3)
    state = TrainState.create(variables, optimizer)
    step_kwargs = dict(margin=0.5, mode="batch_all",
                       compute_dtype=jnp.bfloat16, augment_fn=augment_fn,
                       max_positives=K_SAMPLES - 1)
    # PERFORMANCE.param_packing default: small f32 leaves live in flat
    # buffers between steps (train/packing.py). r5: the state stays
    # packed THROUGH the optimizer (flat_step_hooks — adam runs on the
    # fused buffers); wrap_step is the structure-keyed-optimizer
    # fallback, same as the Trainer.
    from embeddingnet_tpu.train.packing import StatePacker
    packer = StatePacker(state)
    if packer.flat_optimizer_ok(state, optimizer):
        base_step = make_triplet_train_step(
            module, optimizer, **step_kwargs,
            **packer.flat_step_hooks(optimizer))
    else:
        base_step = packer.wrap_step(
            make_triplet_train_step(module, optimizer, **step_kwargs))
    state = jax.jit(packer.pack_state)(state)
    step = jax.jit(base_step, donate_argnums=(0,))

    images_np, labels_np = make_batch(batch, IMG)
    images = jnp.asarray(images_np)
    labels = jnp.asarray(labels_np)

    log(f"[{tag}] compiling train step (batch={batch}, img={IMG}) ...")
    t0 = time.perf_counter()
    # XLA cost-model FLOPs of the whole compiled step (for the MFU% field).
    # Keep and EXECUTE the AOT-compiled object: AOT compilation does not
    # populate the jit dispatch cache, so calling `step(...)` after it
    # would compile the identical program a second time over the relay.
    flops = None
    try:
        compiled = step.lower(state, images, labels).compile()
        step = compiled
        cost = compiled.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(c.get("flops", 0.0)) or None
    except Exception as e:
        log(f"[{tag}] cost analysis unavailable: {e!r}")
    state, metrics = step(state, images, labels)
    jax.block_until_ready(metrics)
    log(f"[{tag}] compile+first step: {time.perf_counter() - t0:.1f}s")

    # warmup — fetch a scalar to host: on relayed platforms
    # block_until_ready can return before remote execution completes, but
    # a device->host value transfer cannot.
    for _ in range(3):
        state, metrics = step(state, images, labels)
    float(metrics["loss"])

    # Steps form a dependency chain through `state`, so enqueueing STEPS
    # iterations and fetching once times all of them; the single RTT of
    # the final fetch amortizes over the chain. (Per-step fetch would add
    # a ~30 ms relay round-trip to every step.)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, images, labels)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    ips = batch / dt
    log(f"[{tag}] {dt * 1e3:.1f} ms/step -> {ips:.0f} images/sec/chip "
        f"(loss={loss:.4f})")
    return ips, (flops / dt if flops else None)


def bench_reference_emulation(batch):
    """Reference-architecture step on the same chip (see module docstring)."""
    import jax
    import jax.numpy as jnp
    import optax
    from itertools import combinations
    from sklearn.metrics import pairwise_distances
    from embeddingnet_tpu.ops import losses as loss_ops

    module, variables = build_model(jnp, jnp.bfloat16)

    @jax.jit
    def predict(variables, imgs):
        x = imgs.astype(jnp.float32) / 255.0
        return module.apply(variables, x, train=False)

    optimizer = optax.adam(1e-3)
    params = variables["params"]
    opt_state = optimizer.init(params)
    k_classes = batch // K_SAMPLES
    max_triplets = k_classes * (K_SAMPLES * (K_SAMPLES - 1) // 2)

    batch_stats = variables.get("batch_stats", {})

    @jax.jit
    def train_on_triplets(params, opt_state, anchors, positives, negatives,
                          mask):
        def loss_fn(p):
            imgs = jnp.concatenate([anchors, positives, negatives], axis=0)
            v = {"params": p}
            if batch_stats:
                v["batch_stats"] = batch_stats
            emb = module.apply(v,
                               imgs.astype(jnp.float32) / 255.0,
                               train=False).astype(jnp.float32)
            e_a, e_p, e_n = jnp.split(emb, 3, axis=0)
            per = loss_ops.triplet_hinge(e_a, e_p, e_n, 0.5)
            return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    images_np, labels_np = make_batch(batch, IMG)

    def one_step(params, opt_state):
        # (a) data layer calls predict per class chunk (ref :211-215)
        embs = []
        for c in range(k_classes):
            chunk = jnp.asarray(images_np[c * K_SAMPLES:(c + 1) * K_SAMPLES])
            embs.append(np.asarray(predict(variables, chunk)))
        all_emb = np.vstack(embs)
        # (b) host mining (ref :219-244), hardest-negative variant
        dist = pairwise_distances(all_emb)
        tri_a, tri_p, tri_n = [], [], []
        for c in range(k_classes):
            pos_idx = np.arange(c * K_SAMPLES, (c + 1) * K_SAMPLES)
            neg_idx = np.concatenate(
                [np.arange(0, c * K_SAMPLES),
                 np.arange((c + 1) * K_SAMPLES, batch)])
            for a, p in combinations(pos_idx, 2):
                lv = dist[a, p] - dist[a, neg_idx] + 0.5
                j = int(np.argmax(lv))
                if lv[j] > 0:
                    tri_a.append(a)
                    tri_p.append(p)
                    tri_n.append(int(neg_idx[j]))
        n = len(tri_a)
        pad = max_triplets - n
        sel = lambda idxs: np.concatenate(  # noqa: E731
            [images_np[idxs], np.zeros((pad, IMG, IMG, 3), np.uint8)])
        mask = jnp.asarray(
            np.concatenate([np.ones(n, np.float32),
                            np.zeros(pad, np.float32)]))
        # (c) second device pass: train on mined triplets (ref train.py:172)
        params, opt_state, loss = train_on_triplets(
            params, opt_state, jnp.asarray(sel(np.array(tri_a, int))),
            jnp.asarray(sel(np.array(tri_p, int))),
            jnp.asarray(sel(np.array(tri_n, int))), mask)
        jax.block_until_ready(loss)
        return params, opt_state, float(loss), n

    log("[ref-emu] compiling + first step ...")
    t0 = time.perf_counter()
    params, opt_state, loss, n = one_step(params, opt_state)
    log(f"[ref-emu] first step {time.perf_counter() - t0:.1f}s "
        f"(mined {n} triplets)")
    t0 = time.perf_counter()
    for _ in range(BASELINE_STEPS):
        params, opt_state, loss, n = one_step(params, opt_state)
    dt = (time.perf_counter() - t0) / BASELINE_STEPS
    ips = batch / dt
    log(f"[ref-emu] {dt * 1e3:.1f} ms/step -> {ips:.0f} images/sec/chip")
    return ips


def get_baseline(batch):
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            data = json.load(f)
        if data.get("batch") == batch and data.get("img") == IMG:
            log(f"[ref-emu] cached baseline: "
                f"{data['images_per_sec']:.0f} images/sec/chip")
            return data["images_per_sec"]
    ips = bench_reference_emulation(batch)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"batch": batch, "img": IMG, "images_per_sec": ips,
                   "note": "reference-architecture emulation measured "
                           "locally on the same chip (see bench.py)"}, f)
    return ips


def bench_mining_gbs():
    """Supplementary metric (BASELINE.md): mining-kernel throughput at
    B=4096 — batch-all fwd+bwd (loss + exact gradient) on a grouped P-K
    batch, the production configuration. Reports the sort-free
    compare-reduce path (ops.mining.batch_all_loss with max_positives,
    reshape-free since r4 — docs/MINING.md) and the
    generic rowblock-sort fallback."""
    import jax
    import jax.numpy as jnp
    from embeddingnet_tpu.ops import mining

    b, d, ks = int(os.environ.get("BENCH_MINING_B", 4096)), 256, 8
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    labels = jnp.asarray(np.repeat(np.arange(b // ks), ks), jnp.int32)

    def measure(max_positives):
        g = jax.jit(lambda e: jax.grad(
            lambda x: mining.batch_all_loss(
                x, labels, margin=0.5, max_positives=max_positives)[0])(e))
        y = g(emb)
        float(y[0, 0])
        t0 = time.perf_counter()
        n = 20
        y = emb
        for _ in range(n):
            y = g(y)
        float(y[0, 0])
        return (time.perf_counter() - t0) / n

    dt_full = measure(None)
    dt_pk = measure(ks - 1)
    # traffic model for the PK path: two passes over the [B, B, K]
    # compare (reading sq both times) + m/W writes ~ 6 * B^2 * 4 bytes
    gbs = 6 * b * b * 4 / dt_pk / 1e9
    log(f"[mining] batch_all fwd+bwd B={b}: rowblock-sort "
        f"{dt_full * 1e3:.2f} ms, P-K compare-reduce {dt_pk * 1e3:.2f} ms "
        f"(~{gbs:.0f} GB/s effective)")
    return gbs


def main():
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the ambient sitecustomize re-registers the axon TPU backend;
        # forcing CPU (smoke drives of this script) needs the config
        # update too, or jax dials the relay anyway
        import jax
        jax.config.update("jax_platforms", "cpu")
    batch = BATCH
    try:
        bench_mining_gbs()
    except Exception as e:
        log(f"[mining] supplementary metric failed: {e!r}")
    try:
        ours, flops_rate = bench_ours(batch)
    except Exception as e:  # OOM fallback
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        log(f"[ours] batch {batch} OOM; retrying at {batch // 2}")
        batch = batch // 2
        ours, flops_rate = bench_ours(batch)

    try:
        ours_aug, _ = bench_ours(batch, augment=True)
    except Exception as e:
        log(f"[ours+aug] augmented headline failed: {e!r}")
        ours_aug = None

    try:
        baseline = get_baseline(batch)
        vs = ours / baseline if baseline > 0 else None
    except Exception as e:
        log(f"[ref-emu] baseline measurement failed: {e!r}")
        vs = None

    print(json.dumps({
        "metric": f"triplet_train_images_per_sec_per_chip_resnet50_b{batch}"
                  f"_img{IMG}_batch_all_bf16",
        "value": round(ours, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        # honest companion number: the flagship config trains WITH the
        # 'default' augmentation preset enabled (VERDICT r1 weak #3)
        "augmented_value": round(ours_aug, 1) if ours_aug else None,
        # genuine reference measurement: the actual Keras repo's train
        # step on this machine's CPU (tools/measure_reference.py, r2:
        # 13.3 img/s; TF has no TPU access here — measured once, carried
        # as a constant; provenance docs/BENCHMARKS.md "North-star")
        "vs_reference_genuine": round(ours / GENUINE_REF_IPS, 1),
        # XLA cost-model FLOPs / step-time, as % of the chip's measured
        # bf16 matmul ceiling (tools/perf_probe4.py: 146.6 TFLOP/s)
        "mfu_pct_of_measured_ceiling": (
            round(100.0 * flops_rate / MEASURED_PEAK_FLOPS, 1)
            if flops_rate else None),
    }))


def _arm_watchdog():
    """The axon TPU relay can be down for hours (jax init then retries
    forever instead of erroring). So the driver always gets an artifact,
    emit an honest null-value JSON line and exit if the bench hasn't
    finished within BENCH_WATCHDOG_S (0 disables)."""
    budget = int(os.environ.get("BENCH_WATCHDOG_S", 2700))
    if budget <= 0:
        return
    import threading

    def fire():
        print(json.dumps({
            "metric": f"triplet_train_images_per_sec_per_chip_resnet50"
                      f"_b{BATCH}_img{IMG}_batch_all_bf16",
            "value": None,
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": f"bench did not finish within {budget}s — TPU "
                     "relay unreachable or compile stalled",
            # Last completed real-chip run of this same script (round 2
            # final re-measure, BENCH_r02.json / docs/BENCHMARKS.md
            # headline table) — STALE context only, not this run:
            "stale_last_measured": {
                "value": 32130.8, "augmented_value": 28044.4,
                "vs_baseline": 321.85, "source": "BENCH_r02.json",
            },
        }), flush=True)
        os._exit(3)

    t = threading.Timer(budget, fire)
    t.daemon = True
    t.start()


if __name__ == "__main__":
    _arm_watchdog()
    main()
