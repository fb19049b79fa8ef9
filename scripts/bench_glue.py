"""Attribute the fused-step residual (the 'glue'): program-level ablations.

docs/PERF.md's decomposition (G/D fwd and fwd+bwd measured as separate
programs) leaves ~15-20% of the 64^3 flagship step unattributed, but the
accounting is ambiguous (the D loss backs through TWO forwards; the G
backward re-traverses D's dx chain). This ladder measures the attribution
directly, each rung a full jitted program at the flagship config:

  fused       - the production fused step (control; == bench.py)
  split       - d_step x iterD + g_step as separate programs (scheduling
                across phase boundaries)
  sgd         - fused step with Adam replaced by plain SGD (Adam moment
                traffic + per-param math)
  opt_only    - ONLY the optimizer updates (2x Adam(D) + 1x Adam(G)) on the
                real param trees (absolute optimizer cost)
  sn_frozen   - fused step with the SN power iteration patched out (the two
                matvecs per SN layer per traversal; sigma still applied)
  sn_off      - fused step with sigma := 1 (whole SN normalize removed:
                matvecs + full-kernel fp32 divide per traversal)
  no_fake     - fused step that drops the fake-batch output (output
                materialization)

Timing is honest: each rung syncs via jax.device_get readback (axon's
block_until_ready returns early — CLAUDE.md). Donated state is re-put per
rung. Run on the TPU:  python scripts/bench_glue.py [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gan3d_tpu.config import Config  # noqa: E402
from gan3d_tpu.models import build_models  # noqa: E402
from gan3d_tpu.train.state import TrainState, make_optimizer  # noqa: E402
from gan3d_tpu.train.step import build_split_steps, build_train_step  # noqa: E402


def _build(cfg: Config):
    G, D = build_models(cfg)
    key = jax.random.key(cfg.seed)
    kg, kd, base = jax.random.split(key, 3)
    z0 = jnp.zeros((cfg.batch_size, cfg.z_size), jnp.float32)
    x0 = jnp.zeros((cfg.batch_size, cfg.resolution, cfg.resolution,
                    cfg.resolution, 1), jnp.float32)
    g_vars = jax.jit(G.init)({"params": kg}, z0)
    d_vars = jax.jit(D.init)({"params": kd}, x0)
    g_params = g_vars["params"]
    d_params = d_vars["params"]
    g_tx = make_optimizer(cfg.lrG, cfg.adam_b1, cfg.adam_b2)
    d_tx = make_optimizer(cfg.lrD, cfg.adam_b1, cfg.adam_b2)
    state = TrainState(
        step=jnp.int32(0),
        g_params=g_params,
        g_state={k: v for k, v in g_vars.items() if k != "params"},
        g_opt=g_tx.init(g_params),
        d_params=d_params,
        d_state={k: v for k, v in d_vars.items() if k != "params"},
        d_opt=d_tx.init(d_params))
    return G, D, g_tx, d_tx, state, base


def _time_step(step, state_host, reals, base_key, iters, warmup=2,
               sync=None):
    state = jax.device_put(state_host)
    out = None
    for _ in range(warmup):
        state, out = step(state, reals, base_key)
    (sync or _default_sync)(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state, reals, base_key)
    (sync or _default_sync)(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _default_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))
                         if leaf.ndim else leaf))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--variants", default="all",
                    help="comma list: fused,split,sgd,opt_only,sn_frozen,"
                         "sn_off,no_fake")
    a = ap.parse_args()
    want = (None if a.variants == "all"
            else set(a.variants.split(",")))

    def on(name):
        return want is None or name in want

    cfg = Config(biggan=True, hinge=True, resolution=a.resolution,
                 filterG=64, filterD=64, z_size=512, batch_size=a.batch,
                 iterD=2, fid_in_loop=False,
                 log_dir=tempfile.mkdtemp(prefix="glue_"))
    G, D, g_tx, d_tx, state, base = _build(cfg)
    state_host = jax.device_get(state)
    rng = np.random.default_rng(0)
    reals = jnp.asarray(rng.normal(size=(
        cfg.iterD, a.batch, a.resolution, a.resolution, a.resolution,
        1)).astype(np.float32).clip(-1, 1))
    results = {}

    def fused_program(g_tx_, d_tx_, keep_fake=True):
        fn = build_train_step(cfg, G, D, g_tx_, d_tx_)

        def wrapped(st, r, k):
            st, metrics, fake = fn(st, r, k)
            return st, (metrics if not keep_fake else (metrics, fake))

        return jax.jit(wrapped, donate_argnums=(0,))

    if on("fused"):
        results["fused"] = _time_step(fused_program(g_tx, d_tx), state_host,
                                      reals, base, a.iters)
        print(f"fused: {results['fused']:.1f} ms", flush=True)

    if on("split"):
        d_fn, g_fn = build_split_steps(cfg, G, D, g_tx, d_tx)
        d_jit = jax.jit(d_fn, donate_argnums=(0,))
        g_jit = jax.jit(g_fn, donate_argnums=(0,))

        def run_split(st):
            for k in range(cfg.iterD):
                st, dm = d_jit(st, reals[k], base, jnp.int32(k))
            st, gm, fake = g_jit(st, base)
            return st, (dm, gm, fake)

        st = jax.device_put(state_host)
        for _ in range(2):
            st, out = run_split(st)
        _default_sync(out[1]["g_loss"])
        t0 = time.perf_counter()
        for _ in range(a.iters):
            st, out = run_split(st)
        _default_sync(out[1]["g_loss"])
        results["split"] = (time.perf_counter() - t0) / a.iters * 1e3
        print(f"split: {results['split']:.1f} ms", flush=True)

    if on("sgd"):
        sgd_g = optax.sgd(cfg.lrG)
        sgd_d = optax.sgd(cfg.lrD)
        # the step reads state.{g,d}_opt with Adam's structure; rebuild state
        # fields to SGD's (empty) structure.
        st_sgd = state_host.replace(g_opt=sgd_g.init(state_host.g_params),
                                    d_opt=sgd_d.init(state_host.d_params))
        results["sgd"] = _time_step(fused_program(sgd_g, sgd_d), st_sgd,
                                    reals, base, a.iters)
        print(f"sgd: {results['sgd']:.1f} ms", flush=True)

    if on("opt_only"):
        def opt_only(st, r, k):
            # synthetic grads that cannot be constant-folded away
            dg = jax.tree.map(lambda p: p * 1e-6, st.d_params)
            gg = jax.tree.map(lambda p: p * 1e-6, st.g_params)
            d_params, d_opt = st.d_params, st.d_opt
            for _ in range(cfg.iterD):
                up, d_opt = d_tx.update(dg, d_opt, d_params)
                d_params = optax.apply_updates(d_params, up)
            up, g_opt = g_tx.update(gg, st.g_opt, st.g_params)
            g_params = optax.apply_updates(st.g_params, up)
            st = st.replace(g_params=g_params, g_opt=g_opt,
                            d_params=d_params, d_opt=d_opt)
            return st, jnp.float32(0)

        results["opt_only"] = _time_step(jax.jit(opt_only, donate_argnums=(0,)),
                                         state_host, reals, base, a.iters)
        print(f"opt_only: {results['opt_only']:.2f} ms", flush=True)

    if on("sn_frozen") or on("sn_off"):
        from gan3d_tpu.nn import layers as L
        orig_pi, orig_sig = L._power_iter, L.spectral_sigma
        try:
            if on("sn_frozen"):
                L._power_iter = lambda w, u, v, n: (u, v)
                results["sn_frozen"] = _time_step(
                    fused_program(g_tx, d_tx), state_host, reals, base,
                    a.iters)
                print(f"sn_frozen: {results['sn_frozen']:.1f} ms", flush=True)
            if on("sn_off"):
                L._power_iter = lambda w, u, v, n: (u, v)
                L.spectral_sigma = lambda w, u, v: jnp.float32(1.0)
                results["sn_off"] = _time_step(
                    fused_program(g_tx, d_tx), state_host, reals, base,
                    a.iters)
                print(f"sn_off: {results['sn_off']:.1f} ms", flush=True)
        finally:
            L._power_iter, L.spectral_sigma = orig_pi, orig_sig

    if on("no_fake"):
        results["no_fake"] = _time_step(
            fused_program(g_tx, d_tx, keep_fake=False), state_host, reals,
            base, a.iters, sync=lambda out: _default_sync(out["g_loss"]))
        print(f"no_fake: {results['no_fake']:.1f} ms", flush=True)

    print("\n# attribution (ms, batch %d @ %d^3, iterD=%d)"
          % (a.batch, a.resolution, cfg.iterD), flush=True)
    for k, v in results.items():
        print(f"{k}: {v:.1f}")
    if "fused" in results:
        f = results["fused"]
        print(f"vol/s fused: {a.batch / f * 1e3:.1f}")
        for k, v in results.items():
            if k != "fused":
                print(f"delta {k}: {v - f:+.1f} ms ({(v - f) / f:+.1%})")


if __name__ == "__main__":
    main()
