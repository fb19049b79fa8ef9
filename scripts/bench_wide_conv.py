"""Go/no-go bench for the transposed-layout wide-N conv (ops/wide_conv.py).

Isolated conv (fwd and fwd+bwd) vs XLA at every hot flagship shape, then —
the test lane packing failed — the whole-block A/B at every distinct
flagship block shape with wide_conv on/off.

Usage: python scripts/bench_wide_conv.py [--iters 20] [--batch 16]
       [--blocks]   (block-level A/B too)
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax import lax  # noqa: E402

from gan3d_tpu.ops import wide_conv  # noqa: E402

DN = ("NDHWC", "DHWIO", "NDHWC")


def time_fn(f, args, iters, warmup=3):
    jf = jax.jit(f)
    out = jf(*args)
    for _ in range(warmup):
        out = jf(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jax.device_get(jnp.sum(leaves[0].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jax.device_get(jnp.sum(leaves[0].astype(jnp.float32))))
    return (time.perf_counter() - t0) / iters * 1e3


def plain(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=DN,
        preferred_element_type=x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--blocks", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="also validate jax.checkpoint over the kernel "
                         "(the 128^3 path; not expressible in interpret "
                         "mode — tests/test_wide_conv.py)")
    a = ap.parse_args()
    print(f"# backend={jax.default_backend()} batch={a.batch}", flush=True)
    rng = np.random.default_rng(0)

    for name, dim, ch in [("16ch@64^3", 64, 16), ("32ch@64^3", 64, 32),
                          ("64ch@32^3", 32, 64), ("128ch@16^3", 16, 128)]:
        x = jnp.asarray(rng.normal(size=(a.batch, dim, dim, dim, ch)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, ch, ch)) / np.sqrt(27 * ch),
                        jnp.bfloat16)
        gf = 2 * a.batch * dim ** 3 * ch * ch * 27 / 1e9

        t_xf = time_fn(plain, (x, w), a.iters)

        def loss_x(x, w):
            return jnp.sum(plain(x, w).astype(jnp.float32))

        def loss_w(x, w):
            return jnp.sum(wide_conv.wide_conv3d(x, w).astype(jnp.float32))

        t_xb = time_fn(jax.grad(loss_x, argnums=(0, 1)), (x, w), a.iters)
        line = f"{name}: fwd XLA {t_xf:.2f} ms ({gf/t_xf:.1f} TF/s)"
        # first Mosaic compile of the kernel happens here — keep the XLA
        # rows even if it rejects
        try:
            t_wf = time_fn(wide_conv.wide_conv3d, (x, w), a.iters)
            t_wb = time_fn(jax.grad(loss_w, argnums=(0, 1)), (x, w), a.iters)
            y1 = jax.jit(plain)(x, w).astype(jnp.float32)
            y2 = jax.jit(wide_conv.wide_conv3d)(x, w).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(y1 - y2)))
            line += (f" | wide {t_wf:.2f} ms ({gf/t_wf:.1f} TF/s, "
                     f"{t_xf/t_wf:.2f}x) || fwd+bwd XLA {t_xb:.2f} ms "
                     f"({3*gf/t_xb:.1f} TF/s) | wide {t_wb:.2f} ms "
                     f"({3*gf/t_wb:.1f} TF/s, {t_xb/t_wb:.2f}x) | "
                     f"max|diff| {err:.3g}")
        except Exception as e:  # noqa: BLE001 — record and continue
            line += (f" || fwd+bwd XLA {t_xb:.2f} ms | wide FAILED: "
                     f"{type(e).__name__}: {str(e)[:160]}")
        print(line, flush=True)

    if a.remat:
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 16)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)) / 21,
                        jnp.bfloat16)

        def f(x, w):
            return jnp.sum(wide_conv.wide_conv3d(x, w).astype(jnp.float32))

        g1 = jax.jit(jax.grad(f, argnums=(0, 1)))(x, w)
        g2 = jax.jit(jax.grad(lambda x, w: jax.checkpoint(f)(x, w),
                              argnums=(0, 1)))(x, w)
        err = max(float(jnp.max(jnp.abs(a_.astype(jnp.float32)
                                        - b_.astype(jnp.float32))))
                  for a_, b_ in zip(g1, g2))
        print(f"remat-over-kernel parity: max|diff| {err:.3g}", flush=True)

    if a.blocks:
        from scripts.bench_block_conv import bench_block  # noqa: E402
        from gan3d_tpu.nn.blocks import DBlockDeep, GBlockDeep  # noqa: E402

        cases = [
            ("G up 128->64 @32->64", GBlockDeep, 128, 64, 32,
             dict(upsample=True)),
            ("D down 64->128 @64", DBlockDeep, 64, 128, 64,
             dict(downsample=True)),
            ("G plain 128@32^3", GBlockDeep, 128, 128, 32, dict()),
            ("G up 256->128 @16->32", GBlockDeep, 256, 128, 16,
             dict(upsample=True)),
            ("D plain 128@32^3", DBlockDeep, 128, 128, 32, dict()),
            ("D down 128->256 @32", DBlockDeep, 128, 256, 32,
             dict(downsample=True)),
            ("G plain 256@16^3", GBlockDeep, 256, 256, 16, dict()),
        ]
        for name, cls, cin, cout, size, kw in cases:
            row = {"case": name}
            for mode in ("off", "on"):
                wide_conv.set_wide_conv_mode(mode)
                jax.clear_caches()
                f, b = bench_block(cls, cin, cout, size, a.batch, a.iters,
                                   **kw)
                row[f"{mode}_fwd_ms"] = round(f, 2)
                row[f"{mode}_fwdbwd_ms"] = round(b, 2)
            row["on_speedup"] = round(
                row["off_fwdbwd_ms"] / row["on_fwdbwd_ms"], 2)
            print(row, flush=True)
        wide_conv.set_wide_conv_mode("auto")


if __name__ == "__main__":
    main()
