"""Dump the optimized HLO of the flagship fused train step for audit.

Builds the exact bench.py program (BigGAN-Deep-3D 64^3, batch 16, iterD=2,
hinge, bf16), lowers + compiles it, and writes the optimized module text to
/tmp/step_hlo.txt, then prints a quick audit: convolution ops grouped by
shape/dtype, fusion counts, transposes/copies, reduce-windows.

Usage: python scripts/dump_step_hlo.py [--batch 16] [--out /tmp/step_hlo.txt]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gan3d_tpu.config import Config  # noqa: E402
from gan3d_tpu.train.trainer import Trainer  # noqa: E402


class _ZeroDataset:
    def __init__(self, n, res):
        self.n, self.res = n, res

    def __len__(self):
        return self.n

    def batch(self, idx):
        return np.zeros((len(idx), self.res, self.res, self.res), np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
    a = ap.parse_args()

    cfg = Config(biggan=True, hinge=True, resolution=a.resolution,
                 filterG=64, filterD=64, z_size=512, batch_size=a.batch,
                 iterD=2, fid_in_loop=False,
                 log_dir=tempfile.mkdtemp(prefix="hlo_"),
                 data_loader_workers=1)
    tr = Trainer(_ZeroDataset(4 * a.batch, a.resolution), cfg)
    reals_shape = jax.ShapeDtypeStruct(
        (cfg.iterD, a.batch, a.resolution, a.resolution, a.resolution, 1),
        np.float32)
    lowered = tr._jit_programs["fused"].lower(tr.state, reals_shape,
                                              tr._base_key)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(a.out, "w") as f:
        f.write(txt)
    print(f"# wrote {len(txt)} bytes to {a.out}", flush=True)

    convs = collections.Counter()
    for m in re.finditer(r"(\S+) = (\S+) convolution\(([^)]*)\)[^\n]*", txt):
        out_t = m.group(2)
        line = m.group(0)
        dnums = re.search(r"dim_labels=(\S+?)[,}]", line)
        win = re.search(r"window={([^}]*)}", line)
        convs[(out_t.split("[")[0],
               (win.group(1)[:40] if win else ""),
               out_t)] += 1
    print("\n== convolutions by output type ==")
    for (dt, win, full), n in sorted(convs.items(), key=lambda kv: -kv[1]):
        print(f"{n:3d}x  {full}  win[{win}]")

    for kind in ("transpose(", "copy(", "reduce-window", "all-reduce",
                 "custom-call", "convert("):
        n = txt.count(" " + kind) + txt.count("= " + kind)
        print(f"{kind:<16} {len(re.findall(re.escape(kind), txt))}")

    f32_convs = [l for l in txt.splitlines()
                 if " convolution(" in l and " f32[" in l.split(" = ")[1][:60]]
    print(f"\nf32-output convolutions: {len(f32_convs)}")
    for l in f32_convs[:20]:
        print("  " + l.strip()[:160])


if __name__ == "__main__":
    main()
