"""Diff device-lane op time between two ``jax.profiler`` trace dirs.

Usage: python tools/trace_diff.py <trace_dir_A> <trace_dir_B>

Loads the newest ``*.trace.json.gz`` under each dir (also accepts a
direct path to one), sums durations on the TPU "XLA Ops" thread (the
leaf per-op lane — the "Steps"/"XLA Modules" lanes nest over it and
would double-count), buckets ops by their HLO base name, and prints the
top buckets with the B-A delta. This is the tool behind the fused-conv
post-mortem table in docs/BENCHMARKS.md ("End-to-end verdict (r4)"); the
traces it compared are checked in at docs/traces/r3_conv_ab/
(A=xla.trace.json.gz, B=pallas_bnfuse.trace.json.gz).
"""

import collections
import glob
import gzip
import json
import os
import sys


def load(path):
    if os.path.isfile(path):
        fs = [path]
    else:
        fs = sorted(glob.glob(path + "/**/*.trace.json.gz",
                              recursive=True))
    if not fs:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    with gzip.open(fs[-1]) as f:
        data = json.load(f)
    evs = data["traceEvents"] if isinstance(data, dict) else data
    tpu_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_keys = {(e["pid"], e["tid"]) for e in evs
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in tpu_pids
               and e["args"].get("name") == "XLA Ops"}
    tot = collections.Counter()
    n = collections.Counter()
    for e in evs:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_keys:
            tot[e.get("name", "")] += e.get("dur", 0)
            n[e.get("name", "")] += 1
    return tot, n


def bucket(name):
    return name.split(".")[0]


def agg(tot):
    b = collections.Counter()
    for k, v in tot.items():
        b[bucket(k)] += v
    return b


def main():
    ta, _ = load(sys.argv[1])
    tb, _ = load(sys.argv[2])
    print(f"total device op-us: A={sum(ta.values()):.0f} "
          f"B={sum(tb.values()):.0f}")
    ba, bb = agg(ta), agg(tb)
    rows = sorted(set(ba) | set(bb),
                  key=lambda k: -(ba.get(k, 0) + bb.get(k, 0)))
    print(f"{'op bucket':48s} {'A_us':>10s} {'B_us':>10s} {'B-A':>10s}")
    for k in rows[:40]:
        a, b = ba.get(k, 0), bb.get(k, 0)
        print(f"{k[:48]:48s} {a:10.0f} {b:10.0f} {b - a:10.0f}")


if __name__ == "__main__":
    main()
