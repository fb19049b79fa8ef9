"""Headline benchmark: BigGAN-Deep-3D training throughput at 64^3.

Measures the fused train step (iterD=2 D-updates + 1 G-update, hinge loss,
spectral norm + 3D self-attention — BASELINE.json config 3) on the available
accelerator and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "volumes/sec/chip", "vs_baseline": N}

volumes/sec counts generated volumes per second: batch_size * full_steps/sec.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
denominator is an analytic A100 estimate for the same config documented
below; it is replaced by a measured value if BASELINE_MEASURED.json exists
(written on a machine that can run the torch reference on an A100).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Provisional A100 baseline for torch eager BigGAN-Deep-3D 64^3 batch 16,
# hinge, AMP (volumes/sec on ONE A100). Derivation: the reference trains
# eagerly with cuDNN 3D convs; comparable published 3D-GAN training runs at
# 64^3 sustain ~2-4 iter/s at batch 16 on A100-class parts -> ~32-64 vol/s.
# We take the optimistic end (64) so vs_baseline is conservative.
A100_BASELINE_VPS = 64.0


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache — first bench compile is minutes; the
    driver's end-of-round run then hits the warm cache."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure(batch_size: int, iters: int, warmup: int, resolution: int = 64,
            filters: int = 64, remat: bool = False,
            channel_ratio: int = 4) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gan3d_tpu.config import Config
    from gan3d_tpu.models import build_models
    from gan3d_tpu.parallel.mesh import make_mesh
    from gan3d_tpu.train.state import TrainState, make_optimizer
    from gan3d_tpu.train.step import build_train_step

    cfg = Config(biggan=True, hinge=True, resolution=resolution,
                 filterG=filters, filterD=filters, z_size=512,
                 batch_size=batch_size, iterD=2, remat=remat,
                 channel_ratio=channel_ratio)
    mesh = make_mesh(1)
    G, D = build_models(cfg)
    key = jax.random.key(0)
    z0 = jnp.zeros((batch_size, cfg.z_size))
    t = time.perf_counter()
    # jit the inits: eager init dispatches hundreds of tiny compiles.
    gv = jax.jit(G.init)({"params": key}, z0)
    fshape = jax.eval_shape(
        lambda v, z: G.apply(v, z, train=True,
                             mutable=["batch_stats", "spectral"])[0], gv, z0)
    dv = jax.jit(D.init)({"params": key},
                         jnp.zeros(fshape.shape, jnp.float32))
    jax.block_until_ready((gv, dv))
    print(f"# init {time.perf_counter() - t:.1f}s", file=sys.stderr, flush=True)
    g_tx = make_optimizer(cfg.lrG, cfg.adam_b1, cfg.adam_b2)
    d_tx = make_optimizer(cfg.lrD, cfg.adam_b1, cfg.adam_b2)
    state = TrainState(
        step=jnp.int32(0),
        g_params=gv["params"],
        g_state={k: v for k, v in gv.items() if k != "params"},
        g_opt=g_tx.init(gv["params"]),
        d_params=dv["params"],
        d_state={k: v for k, v in dv.items() if k != "params"},
        d_opt=d_tx.init(dv["params"]),
    )
    rep = NamedSharding(mesh, P())
    batch_in = NamedSharding(mesh, P(None, "data"))
    batch_out = NamedSharding(mesh, P("data"))
    state = jax.device_put(state, rep)
    step = jax.jit(build_train_step(cfg, G, D, g_tx, d_tx),
                   in_shardings=(rep, batch_in, rep),
                   out_shardings=(rep, rep, batch_out),
                   donate_argnums=(0,))
    rng = np.random.default_rng(0)
    reals = jax.device_put(
        rng.normal(size=(cfg.iterD, batch_size, resolution, resolution,
                         resolution, 1)).astype(np.float32).clip(-1, 1),
        batch_in)
    base_key = jax.random.key(1)

    def sync(m):
        # device_get forces a real device->host readback; on the experimental
        # axon tunnel block_until_ready alone returns before execution
        # finishes, inflating throughput ~10x.
        return float(jax.device_get(m["g_loss"]))

    t = time.perf_counter()
    for _ in range(warmup):
        state, metrics, _ = step(state, reals, base_key)
    sync(metrics)
    print(f"# compile+warmup {time.perf_counter() - t:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics, _ = step(state, reals, base_key)
    sync(metrics)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer iters")
    p.add_argument("--batch", type=int, default=0, help="0 = auto")
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--filters", type=int, default=64)
    p.add_argument("--channel_ratio", type=int, default=4,
                   help="bottleneck shrink (4 = reference; smaller = wider "
                        "hidden convs, better MXU utilization)")
    a = p.parse_args()
    _enable_compile_cache()
    iters = 5 if a.quick else 20
    warmup = 2 if a.quick else 3

    if a.batch:
        candidates = [(a.batch, False), (a.batch, True)]
    else:
        candidates = [(16, False), (16, True), (8, False), (4, False)]
    vps, used = None, None
    for b, remat in candidates:
        try:
            vps = measure(b, iters, warmup, a.resolution, a.filters, remat,
                          a.channel_ratio)
            used = f"{b}{'+remat' if remat else ''}"
            break
        except Exception as e:  # noqa: BLE001 — OOM fallback
            msg = str(e).split("\n")[0][:200]
            print(f"# batch {b} remat={remat} failed ({type(e).__name__}: "
                  f"{msg}); retrying", file=sys.stderr, flush=True)
    if vps is None:
        raise SystemExit("benchmark failed at all batch sizes")

    baseline = A100_BASELINE_VPS
    if os.path.isfile("BASELINE_MEASURED.json"):
        with open("BASELINE_MEASURED.json") as f:
            baseline = float(json.load(f)["volumes_per_sec"])
    print(json.dumps({
        "metric": f"BigGAN-Deep-3D {a.resolution}^3 train throughput "
                  f"(batch {used}, iterD=2, hinge)",
        "value": round(vps, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
