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


def _parse_shape(s):
    """'bf16[16,64,64,64,32]' -> ('bf16', [16, 64, 64, 64, 32])."""
    m = re.match(r"(\w+)\[([0-9,]*)\]", s)
    if not m:
        return None, []
    dims = [int(d) for d in m.group(2).split(",")] if m.group(2) else []
    return m.group(1), dims


def flop_rank(txt, top=25):
    """Rank every HLO convolution by its FLOP count.

    FLOPs = 2 * out_elems * prod(window sizes) * rhs_input_feature_dim —
    exact for plain/grouped/batch-grouped convs because out_elems already
    carries the group multiplicity, and lhs/rhs dilation only changes
    which taps are zero, not the dense MACs XLA issues.
    """
    shapes = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(%?[\w.\-]+) = (\w+\[[0-9,]*\])", line)
        if m:
            shapes[m.group(1).lstrip("%")] = m.group(2)

    rows = []
    for line in txt.splitlines():
        m = re.search(
            r"(%?[\w.\-]+) = (\w+\[[0-9,]*\])[^=]*? convolution\(([^)]*)\)",
            line)
        if not m:
            continue
        name = m.group(1).lstrip("%")
        _, out_dims = _parse_shape(m.group(2))
        ops = [o.strip().lstrip("%").split(" ")[0]
               for o in m.group(3).split(",")]
        rhs_shape = shapes.get(ops[1], "") if len(ops) > 1 else ""
        # rhs input-feature dim via dim_labels (spec between '_' and '->')
        dl = re.search(r"dim_labels=([^,}\s]+)", line)
        rhs_i = None
        if dl and rhs_shape:
            spec = dl.group(1).split("_")[1].split("-")[0]
            _, rhs_dims = _parse_shape(rhs_shape)
            if "i" in spec and len(rhs_dims) == len(spec):
                rhs_i = rhs_dims[spec.index("i")]
        win = re.search(r"window={[^}]*size=([0-9x]+)", line)
        wprod = 1
        if win:
            for d in win.group(1).split("x"):
                wprod *= int(d)
        out_elems = 1
        for d in out_dims:
            out_elems *= d
        if rhs_i is None:
            rhs_i = 1  # conservative; flagged below
        extras = []
        for key in ("stride=[0-9x ]+", "lhs_dilate=[0-9x]+",
                    "rhs_dilate=[0-9x]+", "feature_group_count=\\d+",
                    "batch_group_count=\\d+"):
            e = re.search(key, line)
            if e:
                extras.append(e.group(0))
        rows.append((2 * out_elems * wprod * rhs_i, name, m.group(2),
                     win.group(1) if win else "1", rhs_i, " ".join(extras)))

    rows.sort(key=lambda r: -r[0])
    total = sum(r[0] for r in rows) or 1
    print(f"\n== conv FLOP ranking (total {total/1e12:.2f} TFLOP, "
          f"{len(rows)} convs) ==")
    cum = 0.0
    for fl, name, out, win, rhs_i, extras in rows[:top]:
        cum += fl / total
        print(f"{fl/1e9:9.1f} GF {100*fl/total:5.1f}% cum {100*cum:5.1f}%  "
              f"{out} win={win} ci={rhs_i}  {extras}  {name[:48]}")

    groups = collections.defaultdict(lambda: [0, 0])
    for fl, name, out, win, rhs_i, extras in rows:
        g = groups[(out, win, rhs_i, extras)]
        g[0] += fl
        g[1] += 1
    print(f"\n== conv FLOPs grouped by (out, window, ci, extras) ==")
    cum = 0.0
    for (out, win, rhs_i, extras), (fl, n) in sorted(
            groups.items(), key=lambda kv: -kv[1][0])[:top]:
        cum += fl / total
        print(f"{fl/1e9:9.1f} GF {100*fl/total:5.1f}% cum {100*cum:5.1f}%  "
              f"{n:3d}x {out} win={win} ci={rhs_i}  {extras}")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
    ap.add_argument("--unopt", action="store_true",
                    help="audit the pre-optimization (lowered) HLO — use on "
                         "CPU, where the optimized module rewrites convs "
                         "into eigen custom-calls")
    ap.add_argument("--fast", choices=["auto", "on", "off"], default="auto",
                    help="force fast_upconv/fast_downconv (TPU defaults "
                         "resolve to on; CPU auto = off)")
    ap.add_argument("--family", default="biggan",
                    choices=["biggan", "stylegan2"])
    a = ap.parse_args()

    fam_kw = ({"stylegan2": True} if a.family == "stylegan2"
              else {"biggan": True, "hinge": True})
    cfg = Config(resolution=a.resolution,
                 filterG=64, filterD=64, z_size=512, batch_size=a.batch,
                 iterD=2, fid_in_loop=False,
                 fast_upconv=a.fast, fast_downconv=a.fast,
                 log_dir=tempfile.mkdtemp(prefix="hlo_"),
                 data_loader_workers=1, **fam_kw)
    tr = Trainer(_ZeroDataset(4 * a.batch, a.resolution), cfg)
    reals_shape = jax.ShapeDtypeStruct(
        (cfg.iterD, a.batch, a.resolution, a.resolution, a.resolution, 1),
        np.float32)
    lowered = tr._jit_programs["fused"].lower(tr.state, reals_shape,
                                              tr._base_key)
    if a.unopt:
        txt = lowered.as_text(dialect="hlo")
    else:
        compiled = lowered.compile()
        txt = compiled.as_text()
    with open(a.out, "w") as f:
        f.write(txt)
    print(f"# wrote {len(txt)} bytes to {a.out}", flush=True)

    flop_rank(txt)

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
