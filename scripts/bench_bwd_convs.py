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
        t_dil = time_fn(dx_dilated, (dout, w), a.iters)
        t_gemm = time_fn(dx_gemm, (dout, w), a.iters)
        # numerics check
        y1 = jax.jit(dx_dilated)(dout, w)
        y2 = jax.jit(dx_gemm)(dout, w)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                    - y2.astype(jnp.float32))))
        print(f"{name}: dilated {t_dil:.2f} ms | gemm+interleave "
              f"{t_gemm:.2f} ms | speedup {t_dil / t_gemm:.2f}x "
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


if __name__ == "__main__":
    main()
