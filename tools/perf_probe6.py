#!/usr/bin/env python
"""Probe 6 (r4): input-conversion attribution on the headline step.

The r2 probes measured the uint8->bf16 normalize at 1.8 ms (after the
f16-bridge fix) and attributed it to the physical retile of an 8-bit
(32,128)-tiled tensor with a pathological minor dim of 3. This probe
re-measures that wall and tests a layout-level attack: convert the
batch FLAT ([B, H*W*3] = [1024, 12288], 12288 = 96 lanes of 128 — no
minor-3 tiling) and reshape to NHWC afterwards.

Arms (identical ResNet-50 train step, batch-all mining, adam, bf16):
  a) u8 NHWC input, current f16-bridge normalize   (production today)
  b) bf16 NHWC pre-normalized input                (zero-conversion bound)
  c) u8 FLAT input, lane-aligned convert + reshape (candidate)
  d) u8 NHWC input, convert only, /255 folded into the stem conv's
     kernel (scalar scale commutes through the conv)  (candidate)

Run on TPU: python tools/perf_probe6.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from embeddingnet_tpu.models import EmbeddingModule
from embeddingnet_tpu.ops import mining
from embeddingnet_tpu.train import TrainState

B, IMG, KS = 1024, 64, 4
STEPS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_step(module, optimizer, preprocess, scale_stem=False):
    def step(state, images, labels):
        def loss_fn(params):
            x = preprocess(images)
            if scale_stem:
                # fold /255 into the stem conv kernel: conv(x*s, W) ==
                # conv(x, W*s) for scalar s (exact commutation; one tiny
                # [7,7,3,64] elementwise op instead of a [B,64,64,3] pass)
                params = dict(params)
                bb = dict(params["backbone"])
                stem = dict(bb["stem_conv"])
                stem["kernel"] = stem["kernel"] * (1.0 / 255.0)
                bb["stem_conv"] = stem
                params["backbone"] = bb
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            emb, mut = module.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": state.rng})
            loss, _ = mining.batch_all_loss(
                emb.astype(jnp.float32), labels, margin=0.5,
                max_positives=KS - 1)
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=new_stats,
                             step=state.step + 1), loss

    return step


def timed(name, step, state, x, labels):
    s = state
    s, loss = step(s, x, labels)
    float(loss)
    for _ in range(3):
        s, loss = step(s, x, labels)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        s, loss = step(s, x, labels)
    float(loss)
    dt = (time.perf_counter() - t0) / STEPS
    log(f"[{name:34s}] {dt * 1e3:7.2f} ms/step  "
        f"{B / dt:8.0f} img/s")
    return dt


def main():
    rng_np = np.random.default_rng(0)
    images_u8 = rng_np.integers(0, 255, (B, IMG, IMG, 3), np.uint8)
    labels = jnp.asarray(
        np.repeat(np.arange(B // KS), KS).astype(np.int32))

    module = EmbeddingModule(backbone_name="resnet50", encodings_len=256,
                             embeddings_normalization=True,
                             dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": rng}, jnp.zeros((2, IMG, IMG, 3), jnp.float32),
        train=False)
    optimizer = optax.adam(1e-3)
    state = TrainState.create(variables, optimizer)
    print(list(variables["params"]["backbone"].keys())[:6], file=sys.stderr)

    # a) current: f16 bridge + scalar multiply
    def prep_a(im):
        return (im.astype(jnp.float16)
                * jnp.float16(1.0 / 255.0)).astype(jnp.bfloat16)

    # b) pre-normalized bf16 (no conversion in-step)
    def prep_b(im):
        return im

    # c) flat lane-aligned convert, then reshape
    def prep_c(im_flat):
        x = (im_flat.astype(jnp.float16)
             * jnp.float16(1.0 / 255.0)).astype(jnp.bfloat16)
        return x.reshape(B, IMG, IMG, 3)

    # d) convert only (no multiply), /255 folded into stem kernel
    def prep_d(im):
        return im.astype(jnp.float16).astype(jnp.bfloat16)

    x_u8 = jnp.asarray(images_u8)
    x_bf16 = jnp.asarray(
        (images_u8.astype(np.float32) / 255.0)).astype(jnp.bfloat16)
    x_flat = jnp.asarray(images_u8.reshape(B, IMG * IMG * 3))

    step_a = jax.jit(make_step(module, optimizer, prep_a))
    step_b = jax.jit(make_step(module, optimizer, prep_b))
    step_c = jax.jit(make_step(module, optimizer, prep_c))
    step_d = jax.jit(make_step(module, optimizer, prep_d, scale_stem=True))

    da = timed("a u8 NHWC f16-bridge (today)", step_a, state, x_u8, labels)
    db = timed("b bf16 pre-normalized (bound)", step_b, state, x_bf16,
               labels)
    dc = timed("c u8 flat convert + reshape", step_c, state, x_flat, labels)
    dd = timed("d u8 convert, /255 in stem W", step_d, state, x_u8, labels)
    log(f"normalize cost today : {(da - db) * 1e3:6.2f} ms")
    log(f"flat-convert cost    : {(dc - db) * 1e3:6.2f} ms")
    log(f"fold-into-stem cost  : {(dd - db) * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
