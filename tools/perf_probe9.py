#!/usr/bin/env python
"""Probe 9 (r4): the P-K compare-reduce's [B, B, K] materialization.

bench.py's supplementary mining metric (batch-all fwd+bwd, B=4096, K=8,
grouped P-K) runs at ~9 ms ≈ 45 GB/s effective — far under the chip's
819 GB/s. Suspect: `_pk_counts` builds one [B, B, K] compare tensor
(537 MB at B=4096/K=8 in f32) so three reductions can share it; if XLA
materializes it (or recomputes the broadcast per reduction with its own
pass), traffic explodes. Candidate: unroll the tiny static K axis into K
[B, B] compare/accumulate steps — every intermediate stays 2-D (67 MB),
giving XLA a single fusable pass over `sq` per threshold with scalar
accumulators.

Arms (interleaved best-of-2, dependent-chain timing, grad-of-loss like
bench.py's mining section):
  a) production `batch_all_loss(max_positives=7)` (the [B,B,K] path)
  b) same loss with `_pk_counts` swapped for the K-unrolled variant
  c) rowblock-sort fallback (context: the non-P-K path)

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe9.py
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

import jax
import jax.numpy as jnp

from embeddingnet_tpu.ops import mining

B = int(os.environ.get("PROBE9_B", 4096))
D, KS = 256, 8
STEPS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _pk_counts_unrolled(sq, neg_mask, t_flat):
    """K-unrolled compare-reduce: K static [B, B] passes, no 3-D tensor."""
    neg_sq = jnp.where(neg_mask, sq, jnp.inf)
    neg_val = jnp.where(neg_mask, sq, 0.0)
    kk = t_flat.shape[1]
    m = jnp.zeros_like(sq)
    k_cols, p_cols = [], []
    for j in range(kk):
        t_j = t_flat[:, j][:, None]
        cmp = (neg_sq <= t_j).astype(sq.dtype)
        k_cols.append(jnp.sum(cmp, axis=1))
        p_cols.append(jnp.sum(neg_val * cmp, axis=1))
        m = m + cmp
    k = jnp.stack(k_cols, axis=1)
    p_at_t = jnp.stack(p_cols, axis=1)
    pair_sum = jnp.where(jnp.isfinite(t_flat), k * t_flat - p_at_t, 0.0)
    return pair_sum, k, m


def timed(name, g, emb):
    y = g(emb)
    float(y[0, 0])
    t0 = time.perf_counter()
    y = emb
    for _ in range(STEPS):
        y = g(y)
    float(y[0, 0])
    dt = (time.perf_counter() - t0) / STEPS
    log(f"[{name:28s}] {dt * 1e3:7.2f} ms fwd+bwd")
    return dt


def main():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    labels = jnp.asarray(np.repeat(np.arange(B // KS), KS), jnp.int32)

    def make_grad(max_positives):
        return jax.jit(lambda e: jax.grad(
            lambda x: mining.batch_all_loss(
                x, labels, margin=0.5, max_positives=max_positives)[0])(e))

    g_prod = make_grad(KS - 1)
    g_sort = make_grad(None)
    # force tracing BEFORE the monkeypatch so the production arm compiles
    # the genuine [B,B,K] path (jit traces lazily on first call)
    ga = g_prod(emb)
    gc = g_sort(emb)

    orig = mining._pk_counts
    mining._pk_counts = _pk_counts_unrolled
    try:
        g_unrolled = jax.jit(lambda e: jax.grad(
            lambda x: mining.batch_all_loss(
                x, labels, margin=0.5, max_positives=KS - 1)[0])(e))
        gb = g_unrolled(emb)
    finally:
        mining._pk_counts = orig

    err_ab = float(jnp.max(jnp.abs(ga - gb)))
    err_ac = float(jnp.max(jnp.abs(ga - gc)))
    log(f"grad max|a-b| = {err_ab:.3e}  max|a-c| = {err_ac:.3e} "
        f"(b reduces in a different order; c is the sort oracle)")

    res = {"prod": [], "unrolled": [], "sort": []}
    for rep in range(2):
        res["prod"].append(timed(f"a [B,B,K] compare rep{rep}",
                                 g_prod, emb))
        res["unrolled"].append(timed(f"b K-unrolled rep{rep}",
                                     g_unrolled, emb))
        res["sort"].append(timed(f"c rowblock-sort rep{rep}",
                                 g_sort, emb))
    da, db, dc = (min(res["prod"]), min(res["unrolled"]),
                  min(res["sort"]))
    log(f"best-of-2: [B,B,K] {da * 1e3:.2f} ms | unrolled "
        f"{db * 1e3:.2f} ms ({da / db:.2f}x) | sort {dc * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
