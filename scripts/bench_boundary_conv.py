"""Tap-map rewrites for the C=1 boundary convs (G head 64->1, D stem 1->64).

The session-7 trace decomposition (docs/PERF.md) shows the two k=3 convs
at the volume boundary — G's output conv (Ci=64 -> Co=1, fused with tanh)
and D's stem conv (Ci=1 -> Co=64) — running at 1.4-1.7 TF/s: with Co=1
(resp. K=27*1) only 1 of 128 MXU lanes (resp. 27 rows) is live.  Across
the step's traversals they cost ~50 ms/step (~6%).

Both have exact reformulations that keep every GEMM dimension respectable:

HEAD (64 -> 1): contract channels FIRST: u[m, t] = sum_c x[m, c] W[t, c]
  — ONE GEMM [M, 64] @ [64, 27] (N=27 beats N=1 by 27x) — then the spatial
  kernel is a 27-tap shift-ADD of the tap maps (pure elementwise/slice,
  bandwidth-bound).

STEM (1 -> 64): im2col the single channel: v[m, t] = 27 shifted copies
  (slice concat, bandwidth-bound), then ONE GEMM [M, 27] @ [27, 64]
  (K=27, N=64 beats K=27, N=... the conv's degenerate lowering).

Usage: python scripts/bench_boundary_conv.py [--iters 20] [--batch 16]
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

_DN = ("NDHWC", "DHWIO", "NDHWC")


def conv_same(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


def _shifts27(u):
    """y[o] = sum_t u[o + t - 1, t] over the 3 spatial dims (SAME halo).

    u: [N, D, H, W, 27]; returns [N, D, H, W, 1]."""
    n, d, h, w, _ = u.shape
    up = jnp.pad(u, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    acc = None
    t = 0
    for td in range(3):
        for th in range(3):
            for tw in range(3):
                s = lax.slice(up, (0, td, th, tw, t),
                              (n, td + d, th + h, tw + w, t + 1))
                acc = s if acc is None else acc + s
                t += 1
    return acc


def head_tapmap(x, w):
    """k=3 SAME conv Ci -> 1 as channel-GEMM + 27-tap shift-add."""
    ci = w.shape[3]
    wt = w.reshape(27, ci, 1)[..., 0]                    # [27, Ci]
    u = jnp.einsum("ndhwc,tc->ndhwt", x, wt,
                   preferred_element_type=x.dtype)       # GEMM N=27
    return _shifts27(u)


def stem_tapmap(x, w):
    """k=3 SAME conv 1 -> Co as single-channel im2col + GEMM [M,27]@[27,Co]."""
    n, d, h, wd, _ = x.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    taps = []
    for td in range(3):
        for th in range(3):
            for tw in range(3):
                taps.append(lax.slice(
                    xp, (0, td, th, tw, 0),
                    (n, td + d, th + h, tw + wd, 1)))
    v = jnp.concatenate(taps, axis=-1)                   # [N,D,H,W,27]
    wt = w.reshape(27, w.shape[4])                       # [27, Co]
    return jnp.einsum("ndhwt,tc->ndhwc", v, wt,
                      preferred_element_type=x.dtype)


def stem_hw2(x, w):
    """Stem via H,W space-to-depth (bench_s2d_conv construction): the C=1
    input tensor is tiny (8 MB at batch 16 @64^3) so the relayout tax that
    sank s2d for the wide convs is negligible here, while the packed conv
    gets Ci'=4, Co'=4*Co wide."""
    from scripts.bench_s2d_conv import s2d_conv_hw2
    return s2d_conv_hw2(x, w)


def stem_dhw2(x, w):
    from scripts.bench_s2d_conv import s2d_conv_dhw2
    return s2d_conv_dhw2(x, w)


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
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 10, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 1)) * 0.1, jnp.float32)
    np.testing.assert_allclose(np.asarray(jax.jit(head_tapmap)(x, w)),
                               np.asarray(conv_same(x, w)),
                               rtol=2e-4, atol=2e-4)
    x1 = jnp.asarray(rng.normal(size=(2, 8, 6, 10, 1)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 64)) * 0.1, jnp.float32)
    np.testing.assert_allclose(np.asarray(jax.jit(stem_tapmap)(x1, w1)),
                               np.asarray(conv_same(x1, w1)),
                               rtol=2e-4, atol=2e-4)
    print("# parity: head/stem tap-map exact (f32, rtol 2e-4)", flush=True)


def bench(name, ref, alt, x, w, iters, extra=()):
    row = {"case": name}
    for mode, f in (("ref", ref), ("tap", alt)) + tuple(extra):
        def loss(w_, x_, f=f):
            return jnp.sum(f(x_, w_).astype(jnp.float32))

        def both(w_, x_, g=jax.grad(loss, argnums=(0, 1))):
            gw, gx = g(w_, x_)
            return jnp.sum(gw.astype(jnp.float32)) + \
                jnp.sum(gx.astype(jnp.float32))

        row[f"{mode}_fwd_ms"] = round(
            time_fn(lambda w_, x_, f=f: f(x_, w_), (w, x), iters), 2)
        row[f"{mode}_fwdbwd_ms"] = round(time_fn(both, (w, x), iters), 2)
    for mode in [m for m, _ in (("tap", None),) + tuple(extra)]:
        row[f"{mode}_fwd_speedup"] = round(
            row["ref_fwd_ms"] / row[f"{mode}_fwd_ms"], 2)
        row[f"{mode}_speedup"] = round(
            row["ref_fwdbwd_ms"] / row[f"{mode}_fwdbwd_ms"], 2)
    print(row, flush=True)


def bench_chain(batch, iters):
    """The boundary IN CONTEXT: head conv -> tanh -> stem conv -> mean,
    fwd and full grad. The per-op benches cannot see the step's real cost —
    the C=1 tensor's batch-minor layout forces transpose-shaped fusions at
    BOTH its producer (add_tanh, 57 GB/s in the step trace) and consumer.
    Variants rewrite one or both sides so no rank-5 C=1 tensor is interior.
    """
    rng = np.random.default_rng(0)
    s = 64
    h = jnp.asarray(rng.normal(size=(batch, s, s, s, 64)), jnp.bfloat16)
    wh = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 1)) * 0.05, jnp.bfloat16)
    ws = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 64)) * 0.05, jnp.bfloat16)

    def chain(head, stem):
        def f(h_, wh_, ws_):
            y = jnp.tanh(head(h_, wh_))
            return jnp.mean(stem(y, ws_).astype(jnp.float32) ** 2)
        return f

    variants = {
        "ref": chain(conv_same, conv_same),
        "taphead": chain(head_tapmap, conv_same),
        "taphead+hw2stem": chain(head_tapmap, stem_hw2),
        "taphead+tapstem": chain(head_tapmap, stem_tapmap),
        "hw2stem": chain(conv_same, stem_hw2),
    }
    ref = None
    for name, f in variants.items():
        val = float(jax.device_get(jax.jit(f)(h, wh, ws)))
        if ref is None:
            ref = val
        assert abs(val - ref) < 5e-3 * abs(ref) + 1e-5, (name, val, ref)
        g = jax.grad(f, argnums=(0, 1, 2))

        def gsum(h_, wh_, ws_, g=g):
            gh, gwh, gws = g(h_, wh_, ws_)
            return (jnp.sum(gh.astype(jnp.float32)) +
                    jnp.sum(gwh.astype(jnp.float32)) +
                    jnp.sum(gws.astype(jnp.float32)))

        fwd = time_fn(f, (h, wh, ws), iters)
        fb = time_fn(gsum, (h, wh, ws), iters)
        print({"chain": name, "fwd_ms": round(fwd, 2),
               "fwdbwd_ms": round(fb, 2)}, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain-only", action="store_true")
    a = ap.parse_args()
    print(f"# backend={jax.default_backend()} batch={a.batch}", flush=True)
    if not a.chain_only:
        check_parity()
        rng = np.random.default_rng(0)
        s = 64
        xh = jnp.asarray(rng.normal(size=(a.batch, s, s, s, 64)),
                         jnp.bfloat16)
        wh = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 1)) * 0.05,
                         jnp.bfloat16)
        bench("head 64->1 @64^3", conv_same, head_tapmap, xh, wh, a.iters)
        xs = jnp.asarray(rng.normal(size=(a.batch, s, s, s, 1)),
                         jnp.bfloat16)
        ws = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 64)) * 0.05,
                         jnp.bfloat16)
        bench("stem 1->64 @64^3", conv_same, stem_tapmap, xs, ws, a.iters,
              extra=(("hw2", stem_hw2), ("dhw2", stem_dhw2)))
    bench_chain(a.batch, a.iters)


if __name__ == "__main__":
    main()
