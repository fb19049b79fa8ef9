"""Microbench the backward-pass convs the HLO audit ranked hottest.

The flagship step's top conv instructions by FLOPs (scripts/dump_step_hlo.py)
are the BACKWARD ops of the D blocks: the dx of the fused k=2/s=2
avgpool+1x1 convs (lowered by XLA as lhs_dilate=2 convs) and the dx/dW of
the 3^3 bottleneck convs. For a stride==kernel conv there is no window
overlap, so dx is algebraically a single GEMM
    dx[n, 2i+a, 2j+b, 2k+c, ci] = sum_co dout[n,i,j,k,co] W[a,b,c,ci,co]
= [N*(D/2)^3, Co] @ [Co, 8*Ci] followed by a depth-to-space interleave.
This times XLA's dilated-conv dx against that GEMM form at the two hot
shapes to decide whether ops/downsample_conv.py needs a custom VJP.

Usage: python scripts/bench_bwd_convs.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                    ("NDHWC", "DHWIO", "NDHWC"))


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


def dx_dilated(dout, w):
    """XLA's native dx of a k=2/s=2 conv: lhs_dilate=2 conv with the
    spatially-reversed kernel (what jax.vjp emits)."""
    wr = w[::-1, ::-1, ::-1]  # reverse spatial
    wt = wr.transpose(0, 1, 2, 4, 3)  # IO swap
    return jax.lax.conv_general_dilated(
        dout, wt, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        lhs_dilation=(2, 2, 2), dimension_numbers=DN,
        preferred_element_type=dout.dtype)


def dx_gemm(dout, w):
    """stride==kernel dx as one GEMM + depth-to-space."""
    n, d, h, wd, co = dout.shape
    kd, kh, kw, ci, _ = w.shape  # 2,2,2,ci,co
    wm = w.reshape(8 * ci, co).T  # [co, 8*ci]
    y = jax.lax.dot_general(dout.reshape(-1, co), wm, (((1,), (0,)), ((), ())),
                            preferred_element_type=dout.dtype)
    y = y.reshape(n, d, h, wd, 2, 2, 2, ci)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # N d 2 h 2 w 2 ci
    return y.reshape(n, 2 * d, 2 * h, 2 * wd, ci)


def dx_uniform(dout, w1):
    """The shipped backward (ops/downsample_conv.py): for the UNIFORM tiled
    kernel (avgpool fusion) all 8 parities are equal — one [M,Co]@[Co,Ci]
    GEMM + nearest-upsample.  w1: [ci, co] (the 1x1 weight, pre-tiling)."""
    n, d, h, wd, co = dout.shape
    ci = w1.shape[0]
    y = jax.lax.dot_general(dout.reshape(-1, co), w1 / 8,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=dout.dtype)
    y = y.reshape(n, d, h, wd, ci)
    y = jnp.broadcast_to(y[:, :, None, :, None, :, None, :],
                         (n, d, 2, h, 2, wd, 2, ci))
    return y.reshape(n, 2 * d, 2 * h, 2 * wd, ci)


def fwd_conv(x, w, stride=2):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3, padding="VALID",
        dimension_numbers=DN, preferred_element_type=x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    a = ap.parse_args()
    print(f"# backend={jax.default_backend()} batch={a.batch}", flush=True)
    rng = np.random.default_rng(0)

    # (name, out_spatial, Ci, Co) for the fused downconvs (dx shapes):
    # d0_0 conv_sc @64^3: dx [16,64^3,64] from dout [16,32^3,128]
    # d0_0 conv4  @64^3: dx [16,64^3,32] from dout [16,32^3,128]
    # d1_0 conv_sc @32^3: dx [16,32^3,128] from dout [16,16^3,256]
    cases = [
        ("sc@64^3 128->8*64", 32, 64, 128),
        ("c4@64^3 128->8*32", 32, 32, 128),
        ("sc@32^3 256->8*128", 16, 128, 256),
        ("c4@32^3 256->8*64", 16, 64, 256),
    ]
    for name, od, ci, co in cases:
        dout = jnp.asarray(rng.normal(size=(a.batch, od, od, od, co)),
                           jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(2, 2, 2, ci, co)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(ci, co)), jnp.bfloat16)
        t_dil = time_fn(dx_dilated, (dout, w), a.iters)
        t_gemm = time_fn(dx_gemm, (dout, w), a.iters)
        t_uni = time_fn(dx_uniform, (dout, w1), a.iters)
        # numerics check (dilated vs generic gemm form only; the uniform
        # form computes a different op — the avgpool-fused kernel's dx)
        y1 = jax.jit(dx_dilated)(dout, w)
        y2 = jax.jit(dx_gemm)(dout, w)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                    - y2.astype(jnp.float32))))
        print(f"{name}: dilated {t_dil:.2f} ms | gemm+interleave "
              f"{t_gemm:.2f} ms ({t_dil / t_gemm:.2f}x) | uniform-collapse "
              f"{t_uni:.2f} ms ({t_dil / t_uni:.2f}x) "
              f"| max|diff| {err:.3g}", flush=True)

    # the dW of the same conv (for completeness): grad wrt w via vjp
    def loss_w(w, x):
        return jnp.sum(fwd_conv(x, w).astype(jnp.float32))

    for name, od, ci, co in cases[:2]:
        x = jnp.asarray(rng.normal(size=(a.batch, 2 * od, 2 * od, 2 * od,
                                         ci)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(2, 2, 2, ci, co)), jnp.bfloat16)
        t_dw = time_fn(jax.grad(loss_w), (w, x), a.iters)
        t_f = time_fn(fwd_conv, (x, w), a.iters)
        print(f"{name}: fwd {t_f:.2f} ms | dW(grad) {t_dw:.2f} ms", flush=True)

    # dW of the hot k=3/s=1/p=1 bottleneck convs (15.8% of step FLOPs,
    # scripts/dump_step_hlo.py): XLA's conv-form dW vs 27 shifted-slice
    # GEMMs (no materialized im2col).
    def conv3(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=DN,
            preferred_element_type=x.dtype)

    def dw_conv(x, g):
        w0 = jnp.zeros((3, 3, 3, x.shape[-1], g.shape[-1]), x.dtype)
        return jax.grad(lambda w_: jnp.vdot(
            conv3(x, w_).astype(jnp.float32), g.astype(jnp.float32)))(w0)

    def dw_gemm(x, g):
        n, d, h, wd, ci = x.shape
        co = g.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        gm = g.reshape(-1, co)
        taps = []
        for kd in range(3):
            for kh in range(3):
                for kw in range(3):
                    xs = xp[:, kd:kd + d, kh:kh + h, kw:kw + wd, :]
                    taps.append(jax.lax.dot_general(
                        xs.reshape(-1, ci), gm, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
        return jnp.stack(taps).reshape(3, 3, 3, ci, co)

    from gan3d_tpu.ops import dw_conv as dwk

    for name, dim, ch in [("k3 32ch@64^3", 64, 32), ("k3 64ch@32^3", 32, 64),
                          ("k3 128ch@16^3", 16, 128)]:
        x = jnp.asarray(rng.normal(size=(a.batch, dim, dim, dim, ch)),
                        jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(a.batch, dim, dim, dim, ch)),
                        jnp.bfloat16)
        t_c = time_fn(dw_conv, (x, g), a.iters)
        t_g = time_fn(dw_gemm, (x, g), a.iters)
        gf = 2 * a.batch * dim ** 3 * ch * ch * 27 / 1e9
        line = (f"{name}: dW conv-form {t_c:.2f} ms ({gf/t_c:.1f} TF/s) | "
                f"27-GEMM {t_g:.2f} ms")
        # The pallas forms' first Mosaic compile happens here — keep the
        # XLA rows even if it rejects the kernel.
        try:
            t_p = time_fn(dwk.conv3d_dw, (x, g), a.iters)
            t_p3 = time_fn(partial(dwk.conv3d_dw, split=3), (x, g), a.iters)
            y_c = jax.jit(dw_conv)(x, g).astype(jnp.float32)
            y_p = jax.jit(dwk.conv3d_dw)(x, g)
            scale = float(jnp.max(jnp.abs(y_c))) or 1.0
            err = float(jnp.max(jnp.abs(y_c - y_p))) / scale
            line += (f" | pallas wide-N {t_p:.2f} ms ({gf/t_p:.1f} TF/s, "
                     f"{t_c / t_p:.2f}x) | pallas split3 {t_p3:.2f} ms "
                     f"({gf/t_p3:.1f} TF/s) | rel|diff| {err:.3g}")
        except Exception as e:  # noqa: BLE001 — record and continue
            line += f" | pallas FAILED: {type(e).__name__}: {str(e)[:160]}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
