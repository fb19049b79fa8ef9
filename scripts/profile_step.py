"""Capture a jax.profiler trace of the flagship fused step on the TPU.

Runs ~12 training steps at the flagship config with cfg.profile_dir set;
utils/profiling.StepProfiler traces steps [5, 10). Parse the result offline
with scripts/parse_trace.py to rank ops by device self-time — the direct
answer to where the fused step's wall clock goes (docs/PERF.md's
decomposition leaves ~15-20% unattributed).

Usage: python scripts/profile_step.py [--out /tmp/step_trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gan3d_tpu.config import Config  # noqa: E402
from gan3d_tpu.train.trainer import Trainer  # noqa: E402


class _ZeroDataset:
    def __init__(self, n: int, res: int):
        self.n, self.res = n, res

    def __len__(self) -> int:
        return self.n

    def batch(self, idx):
        return np.zeros((len(idx), self.res, self.res, self.res), np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/step_trace")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--family", default="biggan",
                    choices=["biggan", "stylegan2", "stylegan", "dcgan"])
    a = ap.parse_args()
    fam_kw = {
        "biggan": {"biggan": True, "hinge": True},
        "stylegan2": {"stylegan2": True},
        "stylegan": {"stylegan": True},
        "dcgan": {"dcgan": True},
    }[a.family]
    cfg = Config(resolution=a.resolution,
                 filterG=64, filterD=64, z_size=512, batch_size=a.batch,
                 iterD=2, fid_in_loop=False, profile_dir=a.out,
                 log_dir=tempfile.mkdtemp(prefix="prof_"),
                 data_loader_workers=1, **fam_kw)
    tr = Trainer(_ZeroDataset(4 * a.batch, a.resolution), cfg)
    rng = np.random.default_rng(0)
    reals = jax.device_put(
        rng.normal(size=(cfg.iterD, a.batch, a.resolution, a.resolution,
                         a.resolution, 1)).astype(np.float32).clip(-1, 1),
        tr._batch_in)
    state = tr.state
    for i in range(a.steps):
        tr.profiler.step(i)
        t0 = time.perf_counter()
        state, metrics, _ = tr._step(state, reals, tr._base_key, i)
        # sync INSIDE the trace window so device activity lands in it
        g = float(jax.device_get(metrics["g_loss"]))
        print(f"step {i}: {time.perf_counter() - t0:.2f}s g_loss={g:.3f}",
              flush=True)
    tr.profiler.close()
    tr.loader.close()
    print(f"trace written under {a.out}", flush=True)


if __name__ == "__main__":
    main()
