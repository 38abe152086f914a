#!/usr/bin/env python
"""v5e-8 throughput projection for configs/batch4096_sharded.yml (r5).

Multi-chip hardware is not reachable from this sandbox (one v5e chip
through the axon relay; the virtual CPU mesh validates semantics, not
speed). This probe measures, on the real chip, every per-chip piece of
the 8-way sharded step at its EXACT per-shard shapes, and combines them
with a stated ICI model for the collectives — the closest this
environment gets to a real multi-chip number (VERDICT r4 task #8).

Pieces (global B=4096, N=8, per-shard bl=512, resnet50 @64px bf16,
remat on, 'default' aug on — the config's settings):

  t_local   : full single-chip train step at B=512 (encoder fwd+bwd,
              aug, adam via the production packed layout) — its miner
              runs at the LOCAL [512, 512] shape, so
  t_m_local : single-chip miner fwd+bwd at [512, 512] (subtract), and
  t_m_shard : the sharded miner's per-chip compute at [512 rows, 4096
              cols] — `_pk_counts` over the [bl, B] block + the
              structured backward matmuls (collectives elided; they are
              costed separately below).

  projected = t_local - t_m_local + t_m_shard + t_coll_exposed

Collective model (stated assumption, not measured): v5e ICI ~45 GB/s
per direction per link; 8 chips on one torus axis = bidirectional ring,
W_eff ~90 GB/s. Grad all-reduce (25.6M f32 params = 102 MB):
2*S*(N-1)/N / W_eff ~= 2.0 ms. Embedding all-gathers (4 MB) + m-psums
(~4 MB) ~= 0.1 ms. XLA overlaps async collectives with the ~2x-longer
backward; we report both bounds (fully exposed / fully hidden).

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/scale_projection.py
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
from embeddingnet_tpu.ops.augment import get_aug
from embeddingnet_tpu.ops.distances import pairwise_sq_l2
from embeddingnet_tpu.ops.mining import (_pk_counts, _pk_group_thresholds,
                                         batch_all_loss)
from embeddingnet_tpu.train import TrainState
from embeddingnet_tpu.train.packing import StatePacker
from embeddingnet_tpu.train.steps import make_triplet_train_step

B_GLOBAL, N_DEV, IMG, KS, D = 4096, 8, 64, 4, 256
BL = B_GLOBAL // N_DEV
STEPS = 30

# ICI model (see module docstring)
W_EFF = 90e9
PARAM_BYTES = None  # filled from the model


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, steps=STEPS, fetch):
    out = fn(*args)
    float(np.asarray(fetch(out)).ravel()[0])
    for _ in range(3):
        out = fn(*args)
    float(np.asarray(fetch(out)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(fetch(out)).ravel()[0])   # host fetch = true sync
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    global PARAM_BYTES
    rng = np.random.default_rng(0)

    # ---- t_local: single-chip production step at the B=512 shard shape
    module = EmbeddingModule(backbone_name="resnet50", encodings_len=D,
                             embeddings_normalization=True,
                             dtype=jnp.bfloat16)
    variables = module.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                            train=False)
    optimizer = optax.adam(2e-3)
    state = TrainState.create(variables, optimizer)
    PARAM_BYTES = sum(l.size * 4 for l in jax.tree_util.tree_leaves(
        state.params))
    packer = StatePacker(state)
    step = jax.jit(make_triplet_train_step(
        module, optimizer, margin=0.5, mode="batch_all",
        compute_dtype=jnp.bfloat16, remat=True,
        augment_fn=get_aug("default", (IMG, IMG, 3)),
        max_positives=KS - 1, **packer.flat_step_hooks(optimizer)),
        donate_argnums=(0,))
    images = jnp.asarray(rng.integers(0, 255, (BL, IMG, IMG, 3), np.uint8))
    labels = jnp.asarray(np.repeat(np.arange(BL // KS), KS).astype(np.int32))

    pstate = jax.jit(packer.pack_state)(state)

    def run_step(s):
        s2, m = step(s, images, labels)
        return s2, m

    # donation: keep re-feeding the returned state
    sref = [pstate]

    def stepper():
        s2, m = step(sref[0], images, labels)
        sref[0] = s2
        return m

    log("compiling t_local (B=512 remat+aug step) ...")
    t_local = timeit(lambda: stepper(), fetch=lambda m: m["loss"])
    log(f"t_local  (single-chip step @B=512) : {t_local:7.2f} ms")

    # ---- t_m_local: miner fwd+bwd at the local [512, 512] shape
    emb_l = jnp.asarray(rng.normal(size=(BL, D)).astype(np.float32))
    lab_l = jnp.asarray(np.repeat(np.arange(BL // KS), KS).astype(np.int32))

    miner_local = jax.jit(jax.grad(
        lambda e: batch_all_loss(e, lab_l, margin=0.5,
                                 max_positives=KS - 1)[0]))
    log("compiling t_m_local ...")
    t_m_local = timeit(lambda: miner_local(emb_l),
                       fetch=lambda g: jnp.sum(g))
    log(f"t_m_local (miner fwd+bwd [512,512]) : {t_m_local:7.2f} ms")

    # ---- t_m_shard: per-chip sharded-miner compute at [512, 4096],
    # collectives elided (psum -> local value, all-gather -> input).
    emb_g = jnp.asarray(rng.normal(size=(B_GLOBAL, D)).astype(np.float32))
    lab_g = jnp.asarray(
        np.repeat(np.arange(B_GLOBAL // KS), KS).astype(np.int32))
    row0 = 0  # shard 0's rows: emb_l == emb_g[:BL], lab_l == lab_g[:BL]

    def miner_shard(emb_local, emb_global):
        # forward: mirrors parallel/sharded.py:_fwd_sm_pk minus psums
        sq = pairwise_sq_l2(emb_local, emb_global)              # [bl, B]
        same = lab_l[:, None] == lab_g[None, :]
        self_m = (row0 + jnp.arange(BL))[:, None] == \
            jnp.arange(B_GLOBAL)[None, :]
        neg_mask = ~same
        t_flat = _pk_group_thresholds(emb_local, 0.5, KS)
        pair_sum, k, m = _pk_counts(sq, neg_mask, t_flat)
        active = jnp.maximum(jnp.sum(k), 1.0)
        loss = jnp.sum(pair_sum) / active
        # backward: mirrors _bwd_sm_pk minus psums
        eg = emb_local.reshape(BL // KS, KS, D)
        k_blk = k.reshape(BL // KS, KS, KS)
        pos_mv = (jnp.einsum("gij,gjd->gid", k_blk, eg)
                  + jnp.einsum("gji,gjd->gid", k_blk, eg)).reshape(BL, D)
        pos_row = (jnp.sum(k_blk, axis=2)
                   + jnp.sum(k_blk, axis=1)).reshape(BL)
        neg_we = jnp.matmul(m, emb_global,
                            preferred_element_type=jnp.float32)
        neg_col = jnp.sum(m, axis=0)
        neg_wte = jnp.einsum("ab,ad->bd", m, emb_local,
                             preferred_element_type=jnp.float32)
        neg_mv = neg_we + jax.lax.dynamic_slice(neg_wte, (row0, 0),
                                                (BL, D))
        neg_row = (jnp.sum(m, axis=1)
                   + jax.lax.dynamic_slice_in_dim(neg_col, row0, BL))
        grad = 2.0 * (((pos_row - neg_row) / active)[:, None] * emb_local
                      - (pos_mv - neg_mv) / active)
        return loss, grad

    miner_shard_j = jax.jit(miner_shard)
    log("compiling t_m_shard ...")
    t_m_shard = timeit(lambda: miner_shard_j(emb_l, emb_g),
                       fetch=lambda o: o[0])
    log(f"t_m_shard (miner/chip [512,4096])   : {t_m_shard:7.2f} ms")

    # ---- collective model
    s_grad = PARAM_BYTES
    t_ar = 2 * s_grad * (N_DEV - 1) / N_DEV / W_EFF * 1e3
    s_small = 3 * B_GLOBAL * D * 4 + B_GLOBAL * 4   # 2 gathers + wte psum
    t_small = 2 * s_small / W_EFF * 1e3             # generous 2x
    t_coll = t_ar + t_small

    worst = t_local - t_m_local + t_m_shard + t_coll
    best = t_local - t_m_local + t_m_shard          # fully overlapped
    log("")
    log(f"grad all-reduce model: {s_grad / 1e6:.0f} MB f32 -> {t_ar:.2f} ms"
        f" @ W_eff={W_EFF / 1e9:.0f} GB/s; miner collectives {t_small:.2f} ms")
    for tag, t in (("collectives fully exposed", worst),
                   ("collectives fully hidden ", best)):
        ips = B_GLOBAL / (t / 1e3)
        log(f"projected v5e-8 step ({tag}): {t:6.2f} ms "
            f"-> {ips:,.0f} img/s ({ips / N_DEV:,.0f}/chip)")


if __name__ == "__main__":
    main()
