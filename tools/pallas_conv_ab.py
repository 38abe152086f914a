#!/usr/bin/env python
"""One-process end-to-end A/B of PERFORMANCE.pallas_conv on the headline
train step (bench.py's bench_ours harness, identical conditions): XLA
convs vs the FastConv3x3 dispatch (full Pallas at 2x2/4x4, mixed
XLA-fwd/Pallas-bwd at 8x8). Interleaved repetitions so relay drift hits
both arms equally; the go/no-go for making pallas_conv the bench
default. Run on TPU: ``python tools/pallas_conv_ab.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def run(flag: str, augment: bool = False):
    os.environ["BENCH_PALLAS_CONV"] = flag
    ips, flops_rate = bench.bench_ours(bench.BATCH, augment=augment)
    return ips


def main():
    reps = int(os.environ.get("AB_REPS", 2))
    augment = os.environ.get("AB_AUG") == "1"
    xla, pal = [], []
    for r in range(reps):
        xla.append(run("0", augment))
        pal.append(run("1", augment))
        print(f"[rep {r}] xla {xla[-1]:.0f} img/s | pallas {pal[-1]:.0f} "
              f"img/s | ratio {pal[-1] / xla[-1]:.3f}", flush=True)
    bx, bp = max(xla), max(pal)
    print(f"\nbest-of-{reps}{' (augmented)' if augment else ''}: "
          f"xla {bx:.0f} img/s, pallas_conv {bp:.0f} "
          f"img/s -> {bp / bx:.3f}x", flush=True)


if __name__ == "__main__":
    main()
