"""Microbenchmark: lane-packed conv vs plain XLA conv on the real chip.

VERDICT r1 #2: demonstrate (or break) the narrow-conv ceiling with a real
kernel. Reports useful-FLOP TFLOP/s (2*N*D*H*W*Cout*Cin*27, NOT the dense
expanded FLOPs) for the reference's hot bottleneck conv shapes, forward
and forward+backward, honest device_get sync (CLAUDE.md: block_until_ready
returns early on the axon tunnel).

Usage: python scripts/bench_lane_conv.py [--iters 20] [--dtype bf16]
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

from gan3d_tpu.ops import lane_conv, pallas_conv


def plain(x, w):
    from jax import lax
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


def time_fn(f, args, iters, warmup=3):
    jf = jax.jit(f)
    out = jf(*args)
    for _ in range(warmup):
        out = jf(*args)
    float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    a = ap.parse_args()
    dt = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32
    print(f"# backend={jax.default_backend()} dtype={a.dtype} "
          f"batch={a.batch}", flush=True)

    shapes = [(16, 64), (32, 64), (32, 32), (64, 32), (128, 16)]
    rng = np.random.default_rng(0)
    rows = []
    for c, s in shapes:
        x = jnp.asarray(rng.normal(size=(a.batch, s, s, s, c)), dt)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)) / np.sqrt(27 * c), dt)
        useful = 2 * a.batch * s ** 3 * c * c * 27
        t = lane_conv.pick_tile(c, s)
        variants = {"xla": lambda x, w: plain(x, w)}
        if t is not None:
            variants["k2"] = lambda x, w, t=t: lane_conv.lane_conv3d(x, w, t, "k2")
            variants["k3"] = lambda x, w, t=t: lane_conv.lane_conv3d(x, w, t, "k3")
            variants["pl"] = lambda x, w, t=t: pallas_conv.pallas_conv3d(x, w, t)
        row = {"shape": f"{c}ch@{s}^3", "T": t}
        for name, f in variants.items():
            dt_fwd = time_fn(f, (x, w), a.iters)
            # fwd+bwd: grads wrt both args through a scalar reduction.
            # Return a value depending on BOTH grads so neither is DCE'd.
            def loss(x, w, f=f):
                return jnp.sum(f(x, w).astype(jnp.float32))
            g = jax.grad(loss, argnums=(0, 1))

            def both(x, w, g=g):
                gx, gw = g(x, w)
                return gx + jnp.sum(gw.astype(jnp.float32)).astype(gx.dtype)

            dt_bwd = time_fn(both, (x, w), a.iters)
            row[f"{name}_fwd_tflops"] = round(useful / dt_fwd / 1e12, 1)
            row[f"{name}_fwdbwd_tflops"] = round(3 * useful / dt_bwd / 1e12, 1)
            row[f"{name}_fwd_ms"] = round(dt_fwd * 1e3, 2)
        rows.append(row)
        print(row, flush=True)
    print("\n# summary (useful TFLOP/s, fwd / fwd+bwd):")
    for r in rows:
        best = max((k.split("_")[0] for k in r if k.endswith("fwd_tflops")),
                   key=lambda n: r[f"{n}_fwd_tflops"])
        print(f"  {r['shape']:>10} T={r['T']}: " + "  ".join(
            f"{n}={r.get(f'{n}_fwd_tflops', '-')}/{r.get(f'{n}_fwdbwd_tflops', '-')}"
            for n in ("xla", "k2", "k3", "pl")) + f"  best={best}", flush=True)


if __name__ == "__main__":
    main()
