"""Microbenchmark: 3D self-attention fwd and fwd+bwd, Pallas vs XLA paths.

The SAGAN attention at 32^3 (32768 q tokens, 4096 pooled kv) sits in every
G forward of the flagship model; the Pallas blockwise kernel's FORWARD was
measured in round 1 (14 ms at batch 16) but its custom-VJP backward never
was. This times fwd and fwd+bwd for the Pallas kernel against the chunked
and einsum XLA fallbacks at the two model placements (G 32^3, D 16^3).

Usage: python scripts/bench_attention.py [--iters 10]
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

from gan3d_tpu.ops import attention as att


def time_fn(f, args, iters, warmup=2):
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    a = ap.parse_args()
    print(f"# backend={jax.default_backend()} batch={a.batch}", flush=True)

    # (name, q_len, kv_len, qk_dim, v_dim) at the two model placements:
    # G @32^3: ch=128 -> f,g ch/8=16, h ch/8=16 (v conv expands after)
    # D @16^3: ch=512 -> 64
    cases = [
        ("G@32^3", 32768, 4096, 16, 16),
        ("D@16^3", 4096, 512, 64, 64),
    ]
    rng = np.random.default_rng(0)
    for name, lq, lkv, dk, dv in cases:
        q = jnp.asarray(rng.normal(size=(a.batch, lq, dk)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(a.batch, lkv, dk)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(a.batch, lkv, dv)), jnp.bfloat16)
        row = {"case": name}
        for impl in ("pallas", "chunked", "einsum"):
            try:
                f = lambda q, k, v, impl=impl: att.pooled_attention(q, k, v, impl=impl)
                t_f = time_fn(f, (q, k, v), a.iters)

                def loss(q, k, v, f=f):
                    return jnp.sum(f(q, k, v).astype(jnp.float32))

                g = jax.grad(loss, argnums=(0, 1, 2))

                def both(q, k, v, g=g):
                    gq, gk, gv = g(q, k, v)
                    return (jnp.sum(gq.astype(jnp.float32))
                            + jnp.sum(gk.astype(jnp.float32))
                            + jnp.sum(gv.astype(jnp.float32)))

                t_b = time_fn(both, (q, k, v), a.iters)
                row[f"{impl}_fwd_ms"] = round(t_f * 1e3, 2)
                row[f"{impl}_fwdbwd_ms"] = round(t_b * 1e3, 2)
            except Exception as e:  # noqa: BLE001
                row[f"{impl}_error"] = str(e).split("\n")[0][:80]
        print(row, flush=True)


if __name__ == "__main__":
    main()
