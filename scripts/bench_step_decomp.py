"""Decompose the flagship train step: where does the 0.85 s go?

Times the four constituents of the fused iteration (iterD=2 D-updates +
1 G-update ~= 2*(G fwd + D fwd+bwd) + (G fwd+bwd + D fwd)) individually at
the flagship config (BigGAN-Deep-3D 64^3, batch 16, bf16), with honest
device_get syncs, and prints the implied step budget vs the measured
end-to-end step. Run after any kernel change to keep docs/PERF.md's
decomposition table current.

Usage: python scripts/bench_step_decomp.py [--iters 20] [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gan3d_tpu.config import Config  # noqa: E402
from gan3d_tpu.models import build_models  # noqa: E402


def time_fn(f, args, iters, warmup=3):
    jf = jax.jit(f)
    out = jf(*args)
    for _ in range(warmup):
        out = jf(*args)
    float(jax.device_get(out if out.ndim == 0 else jnp.sum(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    float(jax.device_get(out if out.ndim == 0 else jnp.sum(out)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=64)
    a = ap.parse_args()
    cfg = Config(biggan=True, hinge=True, resolution=a.resolution,
                 filterG=64, filterD=64, z_size=512, batch_size=a.batch,
                 log_dir="/tmp/decomp")
    G, D = build_models(cfg)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (a.batch, cfg.z_size), jnp.float32)
    x = jax.random.normal(key, (a.batch, a.resolution, a.resolution,
                                a.resolution, 1), jnp.float32)
    gv = jax.jit(G.init)({"params": key}, z)
    dv = jax.jit(D.init)({"params": key}, x)
    g_mut = [k for k in gv if k != "params"]
    d_mut = [k for k in dv if k != "params"]

    def g_fwd(gv, z):
        fake, _ = G.apply(gv, z, train=True, mutable=g_mut)
        return jnp.sum(fake.astype(jnp.float32))

    def d_fwd(dv, x):
        out, _ = D.apply(dv, x, mutable=d_mut)
        return jnp.sum(out.astype(jnp.float32))

    def g_loss(p, rest, z):
        fake, _ = G.apply({"params": p, **rest}, z, train=True, mutable=g_mut)
        return jnp.sum(fake.astype(jnp.float32))

    def d_loss(p, rest, x):
        out, _ = D.apply({"params": p, **rest}, x, mutable=d_mut)
        return jnp.sum(out.astype(jnp.float32))

    def g_both(gv, z):
        gr = jax.grad(g_loss)(gv["params"],
                              {k: gv[k] for k in g_mut}, z)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(gr))

    def d_both(dv, x):
        gr = jax.grad(d_loss)(dv["params"],
                              {k: dv[k] for k in d_mut}, x)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(gr))

    rows = {}
    for name, f, args in (("G_fwd", g_fwd, (gv, z)),
                          ("D_fwd", d_fwd, (dv, x)),
                          ("G_fwd+bwd", g_both, (gv, z)),
                          ("D_fwd+bwd", d_both, (dv, x))):
        rows[name] = round(time_fn(f, args, a.iters), 1)
        print(f"{name}: {rows[name]} ms", flush=True)
    implied = 2 * (rows["G_fwd"] + rows["D_fwd+bwd"]) + \
        rows["G_fwd+bwd"] + rows["D_fwd"]
    print(f"implied step (2*(Gf+Dfb) + Gfb + Df): {implied:.0f} ms "
          f"-> {a.batch / implied * 1e3:.1f} vol/s upper bound "
          f"(excl. optimizer/EMA/loss glue)", flush=True)


if __name__ == "__main__":
    main()
