"""Space-to-depth A/B for the narrow k=3 convs: phase-shifted packing.

docs/PERF.md's narrow-conv chapter dismissed space-to-depth using the
ALIGNED packing variant (block b holds original positions {2b, 2b+1}):
there a k=3 original kernel straddles 3 packed blocks per dim, so the
packed kernel is k=3 over 2x channels per dim -> 8x dense FLOPs for 3-D
packing ("a wash").  But a PHASE-SHIFTED packing — pad the SAME-conv
halo first, then let block b hold {2b-1, 2b} — makes the 4-tap window
2P-1..2P+2 land on exactly TWO packed blocks, so the packed kernel is
k=2 per packed dim and the dense-FLOP inflation is only (4/3)^d:

    pack H,W by 2:   k [3,2,2], channels 4x (32 -> 128 = one MXU lane
                     tile), 1.78x FLOPs
    pack D,H,W by 2: k [2,2,2], channels 8x (32 -> 256), 2.37x FLOPs

At the measured wide-conv regime (128ch@64^3 sustains 132.6 TF/s vs
12.6 at 32ch, PERF.md table) even 1.78x FLOP inflation projects ~3x
effective speedup on the convs that the session-6 trace shows are 88.8%
of the flagship step.  This script measures it honestly: the FULL
pack -> embed-weights -> conv -> unpack pipeline (pack/unpack relayout
and the tiny weight-embedding einsum included), fwd and fwd+bwd, with
effective speedup normalized to USEFUL (original-conv) FLOPs, plus an
exact-algebra parity check per case.

The packing and weight embedding here are the reference construction
for ops/s2d_conv.py if the verdict is go.

Usage: python scripts/bench_s2d_conv.py [--iters 20] [--batch 16]
"""

from __future__ import annotations

import argparse
import functools
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

_DN = ("NDHWC", "DHWIO", "NDHWC")


def conv_same(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


# ---------------------------------------------------------------- packing

@functools.lru_cache(maxsize=None)
def _embed_matrix() -> np.ndarray:
    """m1[K, q, p, t+1] in {0,1}: per packed dim, packed-kernel tap K at
    input subposition q contributing to output subposition p reads
    original kernel tap t = 2K - 1 + q - p when |t| <= 1 (k=3 original,
    pack factor 2, phase-shifted packing).  6 of 8 (K,q,p) combos are
    live -> 4/3 dense-FLOP inflation per packed dim."""
    m1 = np.zeros((2, 2, 2, 3), np.float32)
    for K in range(2):
        for q in range(2):
            for p in range(2):
                t = 2 * K - 1 + q - p
                if -1 <= t <= 1:
                    m1[K, q, p, t + 1] = 1.0
    return m1


def embed_weights_hw2(w):
    """[3,3,3,Ci,Co] -> [3,2,2,4Ci,4Co] (H,W packed by 2)."""
    m1 = jnp.asarray(_embed_matrix(), w.dtype)  # [K,q,p,t]
    # Wp[kd,Kh,Kw, qh,qw,ci, ph,pw,co]
    wp = jnp.einsum("KqpT,LrsU,dTUio->dKLqripso", m1, m1, w)
    kd, ci, co = w.shape[0], w.shape[3], w.shape[4]
    return wp.reshape(kd, 2, 2, 4 * ci, 4 * co)


def embed_weights_dhw2(w):
    """[3,3,3,Ci,Co] -> [2,2,2,8Ci,8Co] (D,H,W packed by 2)."""
    m1 = jnp.asarray(_embed_matrix(), w.dtype)
    # Wp[Kd,Kh,Kw, qd,qh,qw,ci, pd,ph,pw,co]
    wp = jnp.einsum("AaxS,BbyT,CczU,STUio->ABCabcixyzo", m1, m1, m1, w)
    ci, co = w.shape[3], w.shape[4]
    return wp.reshape(2, 2, 2, 8 * ci, 8 * co)


def pack2(x, dims):
    """Phase-shifted pack of `dims` (subset of {1,2,3}) by 2: pad 1 both
    sides on each packed dim, then block b holds padded {2b, 2b+1} =
    original {2b-1, 2b}.  Packed subpositions join the channel dim in
    (q_dims-order, c) order, matching the weight embeddings above."""
    pad = [(0, 0)] * 5
    for d in dims:
        pad[d] = (1, 1)
    x = jnp.pad(x, pad)
    shape = []
    for i, s in enumerate(x.shape):
        shape += [s // 2, 2] if i in dims else [s]
    x = x.reshape(shape)
    block_axes, q_axes = [], []
    j = 0
    for i in range(5):
        block_axes.append(j)
        j += 1
        if i in dims:
            q_axes.append(j)
            j += 1
    x = x.transpose(block_axes[:-1] + q_axes + [block_axes[-1]])
    return x.reshape(*x.shape[:4], -1)


def unpack2(y, dims, out_c):
    """Inverse of the OUTPUT packing (aligned: out block P holds
    {2P, 2P+1}): y [N, d', (p.., c)] -> original layout."""
    nq = len(dims)
    y = y.reshape(*y.shape[:4], *([2] * nq), out_c)
    perm, p_axes, pi = [], list(range(4, 4 + nq)), 0
    for i in range(4):
        perm.append(i)
        if i in dims:
            perm.append(p_axes[pi])
            pi += 1
    perm.append(4 + nq)
    y = y.transpose(perm)
    out, j = [y.shape[0]], 1
    for d in range(1, 4):
        if d in dims:
            out.append(y.shape[j] * y.shape[j + 1])
            j += 2
        else:
            out.append(y.shape[j])
            j += 1
    out.append(out_c)
    return y.reshape(out)


def s2d_conv_hw2(x, w):
    """SAME k=3 conv via H,W space-to-depth: exact algebra."""
    xp = pack2(x, dims=(2, 3))          # [N, D, H/2+1, W/2+1, 4C]
    wp = embed_weights_hw2(w)
    y = lax.conv_general_dilated(
        xp, wp, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
        dimension_numbers=_DN, preferred_element_type=x.dtype)
    return unpack2(y, dims=(2, 3), out_c=w.shape[4])


def s2d_conv_dhw2(x, w):
    xp = pack2(x, dims=(1, 2, 3))
    wp = embed_weights_dhw2(w)
    y = lax.conv_general_dilated(
        xp, wp, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=_DN, preferred_element_type=x.dtype)
    return unpack2(y, dims=(1, 2, 3), out_c=w.shape[4])


def _gemm_sum(xp, wp):
    """The packed conv as explicit shifted GEMMs: bypasses XLA's conv
    emitter (slow at packed shapes: small-spatial x wide-channel) and
    feeds the MXU pure wide dot_generals instead.  xp [N,d,h,w,Cp],
    wp [kd,kh,kw,Cp,Cq]; VALID conv."""
    kd, kh, kw = wp.shape[:3]
    n, d, h, w, cp = xp.shape
    do, ho, wo = d - kd + 1, h - kh + 1, w - kw + 1
    acc = None
    for a in range(kd):
        for b in range(kh):
            for c in range(kw):
                xs = lax.slice(xp, (0, a, b, c, 0),
                               (n, a + do, b + ho, c + wo, cp))
                t = jnp.einsum("ndhwc,cq->ndhwq", xs, wp[a, b, c],
                               preferred_element_type=xp.dtype)
                acc = t if acc is None else acc + t
    return acc


def s2d_conv_hw2_gemm(x, w):
    xp = pack2(x, dims=(2, 3))
    xp = jnp.pad(xp, [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)])
    y = _gemm_sum(xp, embed_weights_hw2(w))
    return unpack2(y, dims=(2, 3), out_c=w.shape[4])


def s2d_conv_dhw2_gemm(x, w):
    xp = pack2(x, dims=(1, 2, 3))
    y = _gemm_sum(xp, embed_weights_dhw2(w))
    return unpack2(y, dims=(1, 2, 3), out_c=w.shape[4])


# ---------------------------------------------------------------- harness

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


def check_parity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)) * 0.2, jnp.float32)
    ref = np.asarray(conv_same(x, w))
    for name, f in (("hw2", s2d_conv_hw2), ("dhw2", s2d_conv_dhw2)):
        got = np.asarray(jax.jit(f)(x, w))
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=name)
    print("# parity: hw2/dhw2 exact vs SAME conv (f32, rtol 2e-4)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gemm_only", action="store_true",
                    help="orig vs the explicit-GEMM packed forms only")
    a = ap.parse_args()
    print(f"# backend={jax.default_backend()} batch={a.batch}", flush=True)
    check_parity()

    # flagship hot k=3 conv shapes (hid channels @ resolution)
    cases = [(32, 64), (32, 32), (64, 32), (64, 16), (128, 16), (128, 8)]
    rng = np.random.default_rng(0)
    for c, s in cases:
        x = jnp.asarray(rng.normal(size=(a.batch, s, s, s, c)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)) * 0.05,
                        jnp.bfloat16)
        useful_tf = 2 * a.batch * s**3 * 27 * c * c / 1e12
        row = {"case": f"{c}ch @ {s}^3"}
        modes = (("orig", conv_same), ("hw2", s2d_conv_hw2),
                 ("dhw2", s2d_conv_dhw2),
                 ("hw2g", s2d_conv_hw2_gemm), ("dhw2g", s2d_conv_dhw2_gemm))
        if a.gemm_only:
            modes = (("orig", conv_same), ("hw2g", s2d_conv_hw2_gemm),
                     ("dhw2g", s2d_conv_dhw2_gemm))
        for mode, f in modes:
            def loss(w_, x_, f=f):
                return jnp.sum(f(x_, w_).astype(jnp.float32))

            def both(w_, x_, g=jax.grad(loss, argnums=(0, 1))):
                gw, gx = g(w_, x_)
                return jnp.sum(gw.astype(jnp.float32)) + \
                    jnp.sum(gx.astype(jnp.float32))

            try:
                fwd = time_fn(lambda w_, x_, f=f: f(x_, w_), (w, x), a.iters)
                bwd = time_fn(both, (w, x), a.iters)
            except Exception as e:  # keep the ladder going
                row[f"{mode}"] = f"FAILED {type(e).__name__}"
                continue
            row[f"{mode}_fwd_ms"] = round(fwd, 2)
            row[f"{mode}_fwdbwd_ms"] = round(bwd, 2)
            row[f"{mode}_fwd_tfs"] = round(useful_tf / (fwd / 1e3), 1)
        for mode in ("hw2", "dhw2", "hw2g", "dhw2g"):
            if f"{mode}_fwdbwd_ms" in row and "orig_fwdbwd_ms" in row:
                row[f"{mode}_speedup"] = round(
                    row["orig_fwdbwd_ms"] / row[f"{mode}_fwdbwd_ms"], 2)
                row[f"{mode}_fwd_speedup"] = round(
                    row["orig_fwd_ms"] / row[f"{mode}_fwd_ms"], 2)
        print(row, flush=True)


if __name__ == "__main__":
    main()
