"""Offline parser for jax.profiler traces: rank ops by device self-time.

Input: the directory passed to scripts/profile_step.py. jax.profiler writes
TensorBoard-format traces under <dir>/plugins/profile/<run>/; this reads the
*.trace.json.gz (Chrome trace events) without needing tensorboard, keeps
only complete events ('X') on device (TPU/accelerator) tracks, and prints
the top-N op names by total duration plus a category rollup (conv / fusion /
copy / dynamic-update-slice / all-reduce / other).

Usage: python scripts/parse_trace.py /tmp/step_trace [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
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


def categorize(name: str) -> str:
    n = name.lower()
    if "conv" in n:
        return "conv"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/layout"
    if "dynamic-update-slice" in n or "dynamic-slice" in n:
        return "dus/ds"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "dot" in n:
        return "dot"
    if "rng" in n:
        return "rng"
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--all-tracks", action="store_true",
                    help="include host tracks (default: device-looking only)")
    a = ap.parse_args()
    events = load_events(a.trace_dir)

    # map pid/tid -> track name from metadata events
    proc = {}
    thread = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                thread[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def is_device(pid, tid) -> bool:
        label = (proc.get(pid, "") + " " +
                 thread.get((pid, tid), "")).lower()
        return bool(re.search(r"tpu|device|xla|accelerator|/device", label))

    tracks = collections.Counter()
    by_name = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid, tid = e.get("pid"), e.get("tid")
        label = f"{proc.get(pid, pid)}/{thread.get((pid, tid), tid)}"
        tracks[label] += e["dur"]
        if not a.all_tracks and not is_device(pid, tid):
            continue
        name = e.get("name", "?")
        # strip trailing SSA numbering so repeated ops aggregate
        base = re.sub(r"[.\d]+$", "", name)
        by_name[base] += e["dur"]
        by_cat[categorize(name)] += e["dur"]
        total += e["dur"]

    print("\n# tracks (all, by total us)")
    for k, v in tracks.most_common(12):
        print(f"{v / 1e3:10.1f} ms  {k}")
    if not total:
        sys.exit("\nno device events matched — rerun with --all-tracks "
                 "to inspect host tracks")
    print(f"\n# device total: {total / 1e3:.1f} ms")
    print("\n# by category")
    for k, v in by_cat.most_common():
        print(f"{v / 1e3:10.1f} ms  {v / total:6.1%}  {k}")
    print(f"\n# top {a.top} ops")
    for k, v in by_name.most_common(a.top):
        print(f"{v / 1e3:10.1f} ms  {v / total:6.1%}  {k}")


if __name__ == "__main__":
    main()
