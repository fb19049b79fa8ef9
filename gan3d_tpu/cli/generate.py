"""Batch volume generation — the serving entry point.

The reference has no standalone generation CLI; samples only fall out of
eval.py as a side effect (reference eval.py:70-75).  "Generate N volumes
from a trained model as fast as the chip allows" is the deployment surface
of a GAN, so this CLI makes it first-class, tuned like the train path: ONE
jitted program with weights as arguments (compile-cache friendly, no HLO
weight constants), device-resident PRNG, optional DP-mesh batch sharding
(--num_devices), double-buffered host readback (the next batch is issued
before the previous one is fetched), and honest device_get-synced
throughput.

Accepts our run dirs and reference torch run dirs alike (eval/load.py).
The dump is dataset-compatible (npz key "X", [N, D, H, W] float32 in
[-1, 1]), so generated sets feed straight back into eval/tournament/real
data tooling; --ncdhw switches to the reference's NCDHW sample-dump layout
(eval.py:73).

Usage:
    python -m gan3d_tpu.cli.generate -l log/BigGAN0 --num 128 --batch 16 \
        --out fakes.npz
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from gan3d_tpu.eval.load import load_run, make_sampler
from gan3d_tpu.parallel.mesh import make_mesh
from gan3d_tpu.utils.platform import enable_compile_cache, force_platform


def generate(params) -> np.ndarray:
    import jax

    cfg, G, _, g_vars, _ = load_run(params.model_log,
                                    compute_dtype=params.compute_dtype
                                    or None)
    mesh = (make_mesh(params.num_devices)
            if params.num_devices != 1 else None)
    sample = make_sampler(cfg, G, g_vars, mesh)
    key = jax.random.key(params.seed)

    n_batches = -(-params.num // params.batch)
    out, pending = [], None
    t_first = t0 = time.perf_counter()
    for i in range(n_batches):
        key, kz = jax.random.split(key)
        z = jax.random.normal(kz, (params.batch, cfg.z_size))
        x = sample(z)
        if pending is not None:
            out.append(np.asarray(pending))  # overlaps with the new batch
        pending = x
        if i == 0:
            out.append(np.asarray(pending))
            pending = None
            t0 = time.perf_counter()  # exclude compile from steady-state
    if pending is not None:
        out.append(np.asarray(pending))
    dt = time.perf_counter() - t0
    vols = np.concatenate(out, axis=0)[:params.num, ..., 0]
    steady = max(n_batches - 1, 1) * params.batch
    print(f"generated {vols.shape} in {time.perf_counter() - t_first:.1f}s "
          f"(steady state {steady / dt:.1f} vol/s)", flush=True)
    return vols


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-l", "--model_log", type=str, required=True,
                   help="run dir (ours or a reference torch run)")
    p.add_argument("--num", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="",
                   help="output npz (default <model_log>/generated.npz)")
    p.add_argument("--ncdhw", action="store_true",
                   help="dump the reference's NCDHW layout instead of a "
                        "dataset-compatible X=[N,D,H,W] file")
    p.add_argument("--num_devices", type=int, default=1,
                   help="data-parallel generation devices (0 = all)")
    p.add_argument("--compute_dtype", type=str, default="",
                   help="override the run's compute dtype (e.g. bfloat16)")
    p.add_argument("--platform", type=str, default="",
                   help="force a JAX platform ('cpu'/'tpu')")
    params = p.parse_args(argv)
    force_platform(params.platform)
    enable_compile_cache()
    vols = generate(params)
    out = params.out or os.path.join(params.model_log, "generated.npz")
    if params.ncdhw:
        np.savez_compressed(out, vols[:, None])
    else:
        np.savez_compressed(out, X=vols)
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
