#!/usr/bin/env python
"""Summarize the /tmp/mq* measurement-queue outputs in one table.

Run after scripts/run_measurement_queue{,2,3}.sh finish (see CLAUDE.md
"Post-measurement procedure"). Purely host-side; never touches the TPU.
"""
import json
import os
import re

FILES = [
    ("headline bench (auto)", "/tmp/mq_bench.json"),
    ("headline quick re-check", "/tmp/mq_bench_quick.json"),
    ("128^3 split batch 2", "/tmp/mq_bench128.json"),
    ("stylegan2 64^3", "/tmp/mq_bench_sg2.json"),
    ("fast_dw=on", "/tmp/mq2_bench_dw.json"),
    ("fast_dw=off control", "/tmp/mq2_bench_nodw.json"),
    ("wide_conv=on", "/tmp/mq3_bench_wide.json"),
]
TEXT = [
    ("bwd-conv microbench", "/tmp/mq_bwd.out"),
    ("step decomposition", "/tmp/mq_decomp.out"),
    ("wide-conv isolated/blocks", "/tmp/mq3_wide.out"),
]


def last_json_line(path):
    try:
        with open(path) as f:
            lines = [l.strip() for l in f if l.strip().startswith("{")]
        return json.loads(lines[-1]) if lines else None
    except (OSError, json.JSONDecodeError, IndexError):
        return None


def main():
    print(f"{'run':34s} {'vol/s':>8s} {'vs_base':>8s}")
    for name, path in FILES:
        j = last_json_line(path)
        if j is None:
            status = "MISSING" if not os.path.exists(path) else "no JSON"
            err = path.replace(".json", ".err")
            tail = ""
            if os.path.exists(err):
                with open(err) as f:
                    t = [l.strip() for l in f.readlines()[-3:]]
                tail = " | " + " / ".join(t)[:120]
            print(f"{name:34s} {status}{tail}")
        else:
            print(f"{name:34s} {j.get('value', float('nan')):8.2f} "
                  f"{j.get('vs_baseline', float('nan')):8.3f}")
    for name, path in TEXT:
        print(f"\n== {name} ({path}) ==")
        if not os.path.exists(path):
            print("MISSING")
            continue
        with open(path) as f:
            txt = f.read()
        # keep table-ish lines only
        rows = [l for l in txt.splitlines()
                if re.search(r"\d+\.\d+", l) and not l.startswith("#")]
        print("\n".join(rows[-40:]) if rows else txt[-2000:])


if __name__ == "__main__":
    main()
