"""Offline parser for jax.profiler traces: rank ops by device self-time.

Input: the directory passed to scripts/profile_step.py. jax.profiler writes
TensorBoard-format traces under <dir>/plugins/profile/<run>/; this reads the
*.trace.json.gz (Chrome trace events) without needing tensorboard and uses
the per-event XLA metadata (hlo_category, model_flops, bytes_accessed,
device_duration_ps, long_name) of the device "XLA Ops" track to print:

  - an hlo_category rollup (convolution fusion / custom-call / ...)
  - conv time grouped by the largest operand shape (which resolution/width
    the time goes to, with achieved TF/s)  [--by-shape]
  - the top-N instructions with achieved TF/s and GB/s

The session-7 finding this produced: the flagship fused step is 88.8%
convolution fusions, 42% of it the 64^3 C=32 group at ~24 TF/s — see
docs/PERF.md.

Usage: python scripts/parse_trace.py /tmp/step_trace [--top 40] [--steps 5]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import os
import sys


def load_events(trace_dir: str):
    pats = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                  "*.trace.json.gz"))
    pats += glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not pats:
        sys.exit(f"no *.trace.json.gz under {trace_dir}")
    path = sorted(set(pats))[-1]
    print(f"# {path}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def largest_shape(long_name: str) -> str:
    best, bestv = "?", -1
    for m in re.finditer(r"\[(\d+),(\d+),(\d+),(\d+),(\d+)\]", long_name):
        dims = list(map(int, m.groups()))
        v = 1
        for d in dims:
            v *= d
        if v > bestv:
            bestv = v
            best = f"sp={dims[1]}x{dims[2]}x{dims[3]} C={dims[4]}"
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=5,
                    help="traced steps, for ms/step normalization")
    ap.add_argument("--by-shape", action="store_true", default=True)
    a = ap.parse_args()
    events = load_events(a.trace_dir)

    thread = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    by_cat = collections.Counter()
    by_shape = collections.Counter()
    shape_flops = collections.Counter()
    agg = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0, ""])
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if thread.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        args = e.get("args", {})
        dur = float(args.get("device_duration_ps", 0)) / 1e6  # ps -> us
        if not dur:
            continue
        total += dur
        cat = args.get("hlo_category", "?")
        by_cat[cat] += dur
        fl = float(args.get("model_flops", 0) or 0)
        if cat == "convolution fusion":
            key = largest_shape(args.get("long_name", ""))
            by_shape[key] += dur
            shape_flops[key] += fl
        r = agg[e["name"]]
        r[0] += dur
        r[1] += 1
        r[2] += fl
        r[3] += float(args.get("bytes_accessed", 0) or 0)
        if not r[4]:
            r[4] = args.get("long_name", "")[:160]

    if not total:
        sys.exit("no device XLA Ops events found")
    n = max(a.steps, 1)
    print(f"\n# device total {total / 1e3:.1f} ms"
          f" = {total / (n * 1e3):.1f} ms/step ({n} steps)")

    print("\n# by hlo_category")
    for k, v in by_cat.most_common(12):
        print(f"{v / (n * 1e3):9.2f} ms/step {v / total:6.1%}  {k}")

    if by_shape:
        print("\n# conv fusions by largest operand shape")
        for k, v in by_shape.most_common(15):
            tfs = shape_flops[k] / (v * 1e6) if v else 0.0
            print(f"{v / (n * 1e3):9.2f} ms/step {v / total:6.1%} "
                  f"{tfs:6.1f} TF/s  {k}")

    print(f"\n# top {a.top} instructions (ms/step | x count | TF/s | GB/s)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    for name, (dur, c, fl, by, ln) in rows[:a.top]:
        tfs = fl / (dur * 1e6) if dur else 0.0
        gbs = by / (dur * 1e-6) / 1e9 if dur else 0.0
        print(f"{dur / (n * 1e3):8.2f} {dur / total:6.1%} x{c:4d} "
              f"{tfs:6.1f}TF/s {gbs:7.0f}GB/s  {name}")
        print(f"            {ln}")


if __name__ == "__main__":
    main()
