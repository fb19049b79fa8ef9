"""Block-level A/B: GBlockDeep / DBlockDeep fwd+bwd with fast_conv on/off.

The isolated-conv microbench (bench_lane_conv.py) says the lane-packed
rewrite wins 23-45%, yet the full train step measures SLOWER with it on.
This script times whole blocks (conv + BN + ReLU + shortcut, the real
fusion neighborhood) to localize where the step-level regression comes
from.

Usage: python scripts/bench_block_conv.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gan3d_tpu.nn.blocks import DBlockDeep, GBlockDeep
from gan3d_tpu.ops import lane_conv, upsample_conv


def time_fn(f, args, iters, warmup=3):
    jf = jax.jit(f)
    out = jf(*args)
    for _ in range(warmup):
        out = jf(*args)
    float(jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    float(jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out)))
    return (time.perf_counter() - t0) / iters


def bench_block(block_cls, cin, cout, size, batch, iters, upsample=False,
                downsample=False):
    kw = dict(in_channels=cin, out_channels=cout, dtype=jnp.bfloat16)
    if block_cls is GBlockDeep:
        kw["upsample"] = upsample
        m = GBlockDeep(**kw)
    else:
        kw["downsample"] = downsample
        m = DBlockDeep(**kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, size, cin)),
                    jnp.bfloat16)
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    def fwd(p, x):
        out = m.apply({"params": p, **extra}, x,
                      mutable=list(extra.keys()) or False)
        return out[0] if isinstance(out, tuple) else out

    def loss(p, x):
        return jnp.sum(fwd(p, x).astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1))

    def both(p, x):
        gp, gx = g(p, x)
        leaves = jax.tree_util.tree_leaves(gp)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return gx + s.astype(gx.dtype)

    t_fwd = time_fn(fwd, (params, x), iters)
    t_bwd = time_fn(both, (params, x), iters)
    return t_fwd * 1e3, t_bwd * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--skip_lane", action="store_true",
                    help="only run the fast_upconv section")
    a = ap.parse_args()
    print(f"# backend={jax.default_backend()} batch={a.batch}", flush=True)

    # the 64^3 flagship's heaviest blocks (filterG/D=64 -> hid=cin/4)
    cases = [
        ("G 64ch@32^3 up", GBlockDeep, 128, 64, 32, dict(upsample=True)),
        ("G 64ch@64^3", GBlockDeep, 64, 64, 64, {}),
        ("D 64ch@64^3 down", DBlockDeep, 64, 128, 64, dict(downsample=True)),
        ("D 64ch@32^3", DBlockDeep, 64, 64, 32, {}),
    ]
    if a.skip_lane:
        cases = []
    for name, cls, cin, cout, size, kw in cases:
        row = {"case": name}
        for mode in ("off", "on", "bwd"):
            lane_conv.set_lane_conv_mode(mode)
            jax.clear_caches()
            f, b = bench_block(cls, cin, cout, size, a.batch, a.iters, **kw)
            row[f"{mode}_fwd_ms"] = round(f, 2)
            row[f"{mode}_fwdbwd_ms"] = round(b, 2)
        for m in ("on", "bwd"):
            row[f"{m}_speedup"] = round(
                row["off_fwdbwd_ms"] / row[f"{m}_fwdbwd_ms"], 2)
        print(row, flush=True)
    lane_conv.set_lane_conv_mode("off")

    # fused upsample+conv A/B (ops/upsample_conv.py) on the G up-blocks
    print("# fast_upconv A/B (lane_conv off)", flush=True)
    up_cases = [
        ("G in128@16^3 up", 128, 64, 16),
        ("G in128@32^3 up", 128, 64, 32),
        ("G in64@32^3 up", 64, 32, 32),
    ]
    for name, cin, cout, size in up_cases:
        row = {"case": name}
        for mode in ("off", "on", "tconv"):
            upsample_conv.set_fast_upconv_mode(mode)
            jax.clear_caches()
            f, b = bench_block(GBlockDeep, cin, cout, size, a.batch,
                               a.iters, upsample=True)
            row[f"{mode}_fwd_ms"] = round(f, 2)
            row[f"{mode}_fwdbwd_ms"] = round(b, 2)
        for m in ("on", "tconv"):
            row[f"{m}_speedup"] = round(
                row["off_fwdbwd_ms"] / row[f"{m}_fwdbwd_ms"], 2)
        print(row, flush=True)
    upsample_conv.set_fast_upconv_mode("auto")
    lane_conv.set_lane_conv_mode("auto")


if __name__ == "__main__":
    main()
