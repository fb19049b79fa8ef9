"""A/B: DBlockDeep's `avgpool(2) -> 1x1 expand conv` pair vs one k=2/s=2 conv.

avg_pool3d(2) and a 1x1 conv are both linear, so (like the fused upsample+
conv that won 20-25%/block, ops/upsample_conv.py) the pair collapses
algebraically into ONE stride-2 k=2 conv whose kernel is the 1x1 weight
tiled over the 2^3 window and divided by 8:

    conv1x1(W)(avgpool2(x)) == conv_{k=2,s=2}(tile(W)/8)(x)

Unlike the upsample case, the expected win is small: avgpool SHRINKS its
input 8x (nothing big is materialized), while the fused form multiplies the
1x1 conv's MACs by 8.  This script measures whether the saved intermediate
(one read+write of the pooled tensor) beats the extra FLOPs at the flagship
64^3 D-block shapes (reference utils.py:108-117: conv4 expand and the
shortcut conv_sc both sit behind an AvgPool3d).

Usage: python scripts/bench_down_conv.py [--iters 20] [--batch 16]
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
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gan3d_tpu.ops.conv3d import avg_pool3d  # noqa: E402

_DN = ("NDHWC", "DHWIO", "NDHWC")


def composed(w, x):
    # relu stands in for the block's preceding activation (it fuses into
    # whichever op consumes x first, as in the real DBlockDeep).
    h = avg_pool3d(jax.nn.relu(x), 2)
    return lax.conv_general_dilated(h, w, (1, 1, 1), [(0, 0)] * 3,
                                    dimension_numbers=_DN,
                                    preferred_element_type=h.dtype)


def fused(w, x):
    ci, co = w.shape[3], w.shape[4]
    w2 = jnp.broadcast_to(w[0, 0, 0] / 8, (2, 2, 2, ci, co))
    return lax.conv_general_dilated(jax.nn.relu(x), w2, (2, 2, 2),
                                    [(0, 0)] * 3, dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


def time_fn(f, args, iters, warmup=3):
    jf = jax.jit(f)
    out = jf(*args)
    for _ in range(warmup):
        out = jf(*args)
    float(jax.device_get(jnp.sum(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    float(jax.device_get(jnp.sum(out)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--blocks", action="store_true",
                    help="whole-DBlockDeep A/B instead of the op pairs")
    a = ap.parse_args()
    print(f"# backend={jax.default_backend()} batch={a.batch}", flush=True)
    if a.blocks:
        bench_blocks(a.iters, a.batch)
        return

    # (name, cin, cout, input size): flagship D's pooled 1x1s — conv4 expand
    # (hid -> out) and shortcut conv_sc (in -> out-in) at each down stage.
    cases = [
        ("conv4 32->128 @64^3", 32, 128, 64),
        ("conv_sc 64->64 @64^3", 64, 64, 64),
        ("conv4 64->256 @32^3", 64, 256, 32),
        ("conv_sc 128->128 @32^3", 128, 128, 32),
        ("conv4 128->512 @16^3", 128, 512, 16),
    ]
    rng = np.random.default_rng(0)
    for name, ci, co, size in cases:
        x = jnp.asarray(rng.normal(size=(a.batch, size, size, size, ci)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(1, 1, 1, ci, co)) * 0.05,
                        jnp.bfloat16)
        row = {"case": name}
        for mode, f in (("composed", composed), ("fused", fused)):
            def loss(w_, x_, f=f):
                return jnp.sum(f(w_, x_).astype(jnp.float32))

            def both(w_, x_, g=jax.grad(loss, argnums=(0, 1))):
                gw, gx = g(w_, x_)
                return jnp.sum(gw.astype(jnp.float32)) + \
                    jnp.sum(gx.astype(jnp.float32))

            row[f"{mode}_fwd_ms"] = round(time_fn(f, (w, x), a.iters), 3)
            row[f"{mode}_fwdbwd_ms"] = round(time_fn(both, (w, x), a.iters), 3)
        row["fused_speedup"] = round(
            row["composed_fwdbwd_ms"] / row["fused_fwdbwd_ms"], 2)
        # numerics sanity
        d = float(jnp.max(jnp.abs(composed(w, x).astype(jnp.float32) -
                                  fused(w, x).astype(jnp.float32))))
        row["max_abs_diff"] = round(d, 5)
        print(row, flush=True)



def bench_blocks(iters: int, batch: int) -> None:
    """Whole-DBlockDeep A/B (the fusion-neighborhood check that sank the
    lane-conv rewrite; run with --blocks)."""
    from gan3d_tpu.nn.blocks import DBlockDeep
    from gan3d_tpu.ops import downsample_conv
    from scripts.bench_block_conv import bench_block

    cases = [
        ("D down 64->128 @64", 64, 128, 64),
        ("D down 128->256 @32", 128, 256, 32),
        ("D down 256->512 @16", 256, 512, 16),
    ]
    for name, cin, cout, size in cases:
        row = {"case": name}
        for mode in ("off", "on"):
            downsample_conv.set_fast_downconv_mode(mode)
            jax.clear_caches()
            f, b = bench_block(DBlockDeep, cin, cout, size, batch, iters,
                               downsample=True)
            row[f"{mode}_fwd_ms"] = round(f, 2)
            row[f"{mode}_fwdbwd_ms"] = round(b, 2)
        row["on_speedup"] = round(
            row["off_fwdbwd_ms"] / row["on_fwdbwd_ms"], 2)
        print(row, flush=True)
    downsample_conv.set_fast_downconv_mode("auto")


if __name__ == "__main__":
    main()
