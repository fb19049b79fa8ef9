"""Flagship-shape block A/B: lane_conv modes in the fast_upconv=tconv era.

The round-2 lane-conv go/no-go (docs/PERF.md) measured blocks BEFORE the
fused tconv up-conv landed: the up-block's conv2 is now a stride-2
transposed conv (ineligible for lane packing), so the packing-boundary
interaction that sank the "on" mode has changed — only conv3 (k=3 at full
resolution) packs in an up-block now.  This script re-measures every
distinct block shape of the 64^3 flagship (BigGAN-Deep, filterG/D=64,
batch 16) across lane modes with upconv pinned to its auto (tconv) mode.

Usage: python scripts/bench_flagship_blocks.py [--iters 20] [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gan3d_tpu.ops import lane_conv, upsample_conv  # noqa: E402
from scripts.bench_block_conv import bench_block  # noqa: E402
from gan3d_tpu.nn.blocks import DBlockDeep, GBlockDeep  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--modes", type=str, default="off,on,bwd")
    a = ap.parse_args()
    modes = a.modes.split(",")
    print(f"# backend={jax.default_backend()} batch={a.batch} "
          f"upconv={upsample_conv.fast_upconv_variant()}", flush=True)

    # Every distinct block of the 64^3 flagship (hid = in/4 for G, out/4
    # for D). Plain G blocks run at the stage's LOW res (upsample is on the
    # 2nd block of each doubled pair).
    # Hottest-first; hid=128 blocks omitted (T = 128//C = 1: lane packing
    # is not even eligible there, ops/lane_conv.py).
    cases = [
        ("G up 128->64 @32->64", GBlockDeep, 128, 64, 32, dict(upsample=True)),
        ("D down 64->128 @64", DBlockDeep, 64, 128, 64, dict(downsample=True)),
        ("G plain 128@32^3", GBlockDeep, 128, 128, 32, dict()),
        ("G up 256->128 @16->32", GBlockDeep, 256, 128, 16, dict(upsample=True)),
        ("D plain 128@32^3", DBlockDeep, 128, 128, 32, dict()),
        ("D down 128->256 @32", DBlockDeep, 128, 256, 32, dict(downsample=True)),
        ("G plain 256@16^3", GBlockDeep, 256, 256, 16, dict()),
    ]
    for name, cls, cin, cout, size, kw in cases:
        row = {"case": name}
        for mode in modes:
            lane_conv.set_lane_conv_mode(mode)
            jax.clear_caches()
            f, b = bench_block(cls, cin, cout, size, a.batch, a.iters, **kw)
            row[f"{mode}_fwd_ms"] = round(f, 2)
            row[f"{mode}_fwdbwd_ms"] = round(b, 2)
        base = row.get("off_fwdbwd_ms")
        if base:
            for m in modes:
                if m != "off":
                    row[f"{m}_speedup"] = round(base / row[f"{m}_fwdbwd_ms"], 2)
        print(row, flush=True)
    lane_conv.set_lane_conv_mode("auto")


if __name__ == "__main__":
    main()
