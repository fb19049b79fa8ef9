"""A/B: K training steps chained inside ONE jitted lax.scan program.

VERDICT (round 4, measured): NO-GO — dcgan 64^3 batch 32 on v5e measured
460.3 vol/s chained (K=8) vs 470.1 per-step (0.979x). JAX's async
dispatch already pipelines the per-step loop (single readback at the
end); there is no per-dispatch bubble for scan to close. The trace's
"device busy 37.8 ms vs 68 ms wall" gap that motivated this was profiler
attribution undercounting, not real idle time. Kept as the recorded
negative result + re-measurement harness (docs/PERF.md round 4
session 2).

Motivation (round 4): the dcgan 64^3 batch-32 trace shows device busy =
37.8 ms/step but wall = ~60-70 ms/step — only ~54-63% device utilization.
bench.py's dispatch loop already pipelines (single readback at the end),
so the gap is per-dispatch overhead over the ~30 ms-RTT axon tunnel
(arg handling + donation bookkeeping + RPC). Chaining K steps inside one
program amortizes that overhead K-fold; the math per step is unchanged
(same step_fn, scanned), and the reals for the K steps ride in as one
[K, iterD, B, D, H, W, 1] array (one transfer instead of K).

sg1 is the control: its trace shows 92% device utilization, so scan
chaining should buy little there.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_scan_chain.py --family dcgan --k 8
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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="dcgan",
                   choices=["biggan", "stylegan2", "stylegan", "dcgan",
                            "hybrid"])
    p.add_argument("--batch", type=int, default=0, help="0 = family default")
    p.add_argument("--k", type=int, default=8, help="steps per scan call")
    p.add_argument("--iters", type=int, default=40,
                   help="total steps measured (rounded down to a multiple "
                        "of k for the chained arm)")
    p.add_argument("--warmup", type=int, default=6)
    args = p.parse_args()

    from bench import _ZeroDataset  # reuse the stub dataset
    from gan3d_tpu.config import Config
    from gan3d_tpu.train.trainer import Trainer

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    batch = args.batch or (32 if args.family in ("dcgan", "stylegan2")
                           else 16)
    res = 64
    fam_kw = {
        "biggan": {"biggan": True, "hinge": True},
        "stylegan2": {"stylegan2": True},
        "stylegan": {"stylegan": True},
        "dcgan": {"dcgan": True},
        "hybrid": {"hybrid": True},
    }[args.family]
    cfg = Config(resolution=res, filterG=64, filterD=64, z_size=512,
                 batch_size=batch, iterD=2, fid_in_loop=False,
                 log_dir=tempfile.mkdtemp(prefix="chain_"),
                 data_loader_workers=1, **fam_kw)
    tr = Trainer(_ZeroDataset(4 * batch, res), cfg)
    rng = np.random.default_rng(0)
    reals1 = jax.device_put(
        rng.normal(size=(cfg.iterD, batch, res, res, res, 1))
        .astype(np.float32).clip(-1, 1), tr._batch_in)

    def sync(m):
        return float(jax.device_get(m["g_loss"]))

    # --- arm A: the production per-step dispatch loop (bench.py's form) ---
    state = tr.state
    for i in range(args.warmup):
        state, metrics, _ = tr._step(state, reals1, tr._base_key, i)
    sync(metrics)
    t0 = time.perf_counter()
    for i in range(args.warmup, args.warmup + args.iters):
        state, metrics, _ = tr._step(state, reals1, tr._base_key, i)
    sync(metrics)
    dt_a = time.perf_counter() - t0
    vps_a = batch * args.iters / dt_a
    print(f"# per-step dispatch: {vps_a:.1f} vol/s "
          f"({dt_a / args.iters * 1e3:.1f} ms/step)", flush=True)

    # --- arm B: K steps chained in one scanned program -------------------
    if not cfg.fused_step or cfg.stylegan2 or cfg.stylegan:
        # stylegan families route through their own step builders with a
        # python-side program choice per step (lazy reg) — handled by the
        # real trainer feature, not this probe.
        print("# scan-chain probe only supports the plain fused step here")
        return
    from gan3d_tpu.train.step import build_train_step

    step_fn = build_train_step(cfg, tr.G, tr.D, tr.g_tx, tr.d_tx)

    K = args.k

    def chain_fn(state, reals_k, base_key):
        def body(st, reals):
            st, m, _ = step_fn(st, reals, base_key)
            return st, m

        state, ms = jax.lax.scan(body, state, reals_k)
        return state, jax.tree.map(lambda x: x[-1], ms)

    chain = jax.jit(chain_fn, donate_argnums=(0,))
    # K-leading variant of the trainer's batch sharding so arm B measures
    # the same data placement as arm A under a multi-device mesh.
    from jax.sharding import NamedSharding, PartitionSpec

    batch_in_k = NamedSharding(
        tr.mesh, PartitionSpec(None, *tr._batch_in.spec))
    reals_k = jax.device_put(
        rng.normal(size=(K, cfg.iterD, batch, res, res, res, 1))
        .astype(np.float32).clip(-1, 1), batch_in_k)

    # arm A's _step donates its state argument, so tr.state is gone —
    # continue from arm A's live output state.
    t0 = time.perf_counter()
    for _ in range(max(1, args.warmup // K)):
        state, m = chain(state, reals_k, tr._base_key)
    sync(m)
    print(f"# chain compile+warm {time.perf_counter() - t0:.1f}s",
          flush=True)
    calls = max(1, args.iters // K)
    t0 = time.perf_counter()
    for _ in range(calls):
        state, m = chain(state, reals_k, tr._base_key)
    sync(m)
    dt_b = time.perf_counter() - t0
    vps_b = batch * calls * K / dt_b
    print(f"# scan-chain K={K}: {vps_b:.1f} vol/s "
          f"({dt_b / (calls * K) * 1e3:.1f} ms/step)  "
          f"ratio {vps_b / vps_a:.3f}x", flush=True)
    tr.loader.close()


if __name__ == "__main__":
    main()
