"""Space-to-depth forms for the stride-2 conv families (up + down).

Companions to scripts/bench_s2d_conv.py (the k=3 s=1 case):

DOWN — the fast_downconv k=2 s=2 convs: windows align exactly with 2x2x2
input blocks, so an ALIGNED pack (no halo) turns the conv into a 1x1 conv
at 8x input channels — ZERO FLOP inflation, contraction dim 8*Ci wide
(e.g. 32 -> 256), a pure wide GEMM [N*S^3, 8Ci] @ [8Ci, Co].

UP — the fast_upconv stride-2 k=3 transposed convs: a tconv s=2 is
exactly `conv + depth-to-space` (subpixel conv) — the output is produced
PRE-PACKED at 8*Co channels. The dense single-conv form scatters the 27
taps into a k=2^3 kernel by output parity (dense FLOPs 64/27 = 2.37x, but
both GEMM dims wide: K = 8*Ci, N = 8*Co).

Both forms are exact algebra (parity-checked here against the production
ops). Usage: python scripts/bench_s2d_updown.py [--iters 20] [--batch 16]
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

from gan3d_tpu.ops.conv3d import conv_transpose3d  # noqa: E402

_DN = ("NDHWC", "DHWIO", "NDHWC")


# ------------------------------------------------------------------ down

def down_conv_ref(x, w):
    """k=2 s=2 conv (the fast_downconv form; w [2,2,2,Ci,Co])."""
    return lax.conv_general_dilated(x, w, (2, 2, 2), [(0, 0)] * 3,
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


def pack_aligned(x):
    """[N,D,H,W,C] -> [N,D/2,H/2,W/2,8C]; block holds {2b, 2b+1} per dim,
    subpositions ordered (qd, qh, qw, c)."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, d // 2, h // 2, w // 2, 8 * c)


def down_conv_s2d(x, w):
    """Same conv as a 1x1 on the aligned-packed input (exact, 0 inflation)."""
    ci, co = w.shape[3], w.shape[4]
    xp = pack_aligned(x)
    # packed channel (qd,qh,qw,ci) must contract against w[qd,qh,qw,ci,co]
    wp = w.reshape(1, 1, 1, 8 * ci, co)
    return lax.conv_general_dilated(xp, wp, (1, 1, 1), [(0, 0)] * 3,
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


# -------------------------------------------------------------------- up

def up_tconv_ref(x, w):
    """ConvTranspose3d k=3 s=2 p=1 op=1 (the fast_upconv tconv form;
    w [3,3,3,Ci,Co]) — doubles each spatial dim."""
    return conv_transpose3d(x, w, stride=2, padding=1, output_padding=1)


def up_tconv_subpixel(x, w):
    """Same tconv as one k=2 VALID conv producing 8*Co packed output,
    then depth-to-space.  Derivation: y[2P+p] = sum_j x[j] w[2P+p - 2j + 1]
    (p=1 torch tconv => tap t = i - 2j + 1 in [0,3)).  With input blocks
    j in {P, P+1} (pad x by 1 on the right): tap t = p - 2K + 1 where
    K in {0,1} is the packed kernel offset; valid combos (K,p):
    (0,0)->t=1, (0,1)->t=2, (1,1)->t=0 — 3 of 4 slots live per dim
    (dense inflation (2*2)/3 per dim = 64/27 overall)."""
    ci, co = w.shape[3], w.shape[4]
    m1 = np.zeros((2, 2, 3), np.float32)  # [K, p, t]
    for K in range(2):
        for p in range(2):
            t = p - 2 * K + 1
            if 0 <= t <= 2:
                m1[K, p, t] = 1.0
    m = jnp.asarray(m1, w.dtype)
    # Wp[Kd,Kh,Kw, ci, pd,ph,pw,co]
    wp = jnp.einsum("AxS,ByT,CzU,STUio->ABCixyzo", m, m, m, w)
    wp = wp.reshape(2, 2, 2, ci, 8 * co)
    xp = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 1), (0, 0)])
    y = lax.conv_general_dilated(xp, wp, (1, 1, 1), [(0, 0)] * 3,
                                 dimension_numbers=_DN,
                                 preferred_element_type=x.dtype)
    # depth-to-space: [N,D,H,W,(pd,ph,pw,co)] -> [N,2D,2H,2W,co]
    n, d, h, wd = y.shape[:4]
    y = y.reshape(n, d, h, wd, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, 2 * d, 2 * h, 2 * wd, co)


# --------------------------------------------------------------- harness

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
    wd = jnp.asarray(rng.normal(size=(2, 2, 2, 4, 6)) * 0.2, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jax.jit(down_conv_s2d)(x, wd)),
        np.asarray(down_conv_ref(x, wd)), rtol=2e-4, atol=2e-4)
    wu = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)) * 0.2, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jax.jit(up_tconv_subpixel)(x, wu)),
        np.asarray(up_tconv_ref(x, wu)), rtol=2e-4, atol=2e-4)
    print("# parity: down-s2d + up-subpixel exact (f32, rtol 2e-4)",
          flush=True)


def bench(name, ref, alt, x, w, useful_tf, iters):
    row = {"case": name}
    for mode, f in (("ref", ref), ("s2d", alt)):
        def loss(w_, x_, f=f):
            return jnp.sum(f(x_, w_).astype(jnp.float32))

        def both(w_, x_, g=jax.grad(loss, argnums=(0, 1))):
            gw, gx = g(w_, x_)
            return jnp.sum(gw.astype(jnp.float32)) + \
                jnp.sum(gx.astype(jnp.float32))

        fwd = time_fn(lambda w_, x_, f=f: f(x_, w_), (w, x), iters)
        bwd = time_fn(both, (w, x), iters)
        row[f"{mode}_fwd_ms"] = round(fwd, 2)
        row[f"{mode}_fwdbwd_ms"] = round(bwd, 2)
        row[f"{mode}_fwd_tfs"] = round(useful_tf / (fwd / 1e3), 1)
    row["s2d_fwd_speedup"] = round(row["ref_fwd_ms"] / row["s2d_fwd_ms"], 2)
    row["s2d_speedup"] = round(
        row["ref_fwdbwd_ms"] / row["s2d_fwdbwd_ms"], 2)
    print(row, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    a = ap.parse_args()
    print(f"# backend={jax.default_backend()} batch={a.batch}", flush=True)
    check_parity()
    rng = np.random.default_rng(0)

    # fast_downconv shapes (conv4 expand + conv_sc at each D down stage)
    for ci, co, s in [(32, 128, 64), (64, 64, 64), (64, 256, 32),
                      (128, 128, 32), (128, 512, 16)]:
        x = jnp.asarray(rng.normal(size=(a.batch, s, s, s, ci)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(2, 2, 2, ci, co)) * 0.05,
                        jnp.bfloat16)
        tf = 2 * a.batch * (s // 2)**3 * 8 * ci * co / 1e12
        bench(f"down {ci}->{co} @{s}^3", down_conv_ref, down_conv_s2d,
              x, w, tf, a.iters)

    # fast_upconv tconv shapes (G up blocks: hid -> hid at low res)
    for c, s in [(32, 32), (64, 16), (128, 8)]:
        x = jnp.asarray(rng.normal(size=(a.batch, s, s, s, c)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)) * 0.05,
                        jnp.bfloat16)
        tf = 2 * a.batch * (2 * s)**3 * 27 / 8 * c * c / 1e12
        bench(f"up {c}->{c} @{s}->{2*s}", up_tconv_ref, up_tconv_subpixel,
              x, w, tf, a.iters)


if __name__ == "__main__":
    main()
