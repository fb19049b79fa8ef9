"""Metric calibration harness (reference: eval_metrics.py).

Sanity-checks every metric on three control pairs x 3 reps:
  1. data batch vs data batch   (distances should be small)
  2. randn vs randn             (self-consistent)
  3. randn vs rand-uniform      (distances should be large)
Also exposed as a library function so tests/test_eval_calibration.py can run
it as a real pytest module (the reference's closest thing to a test suite,
SURVEY §4).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List

import jax
import numpy as np

from gan3d_tpu.data.datasets import open_dataset
from gan3d_tpu.data.loader import Loader
from gan3d_tpu.eval import metrics as M
from gan3d_tpu.eval.fid_resnet import get_fid_model
from gan3d_tpu.eval.slice_fid import SliceFID


def _summarize(tag: str, rows: List[Dict[str, float]]) -> Dict[str, float]:
    keys = rows[0].keys()
    means = {k: float(np.mean([r[k] for r in rows])) for k in keys}
    stds = {k: float(np.std([r[k] for r in rows])) for k in keys}
    print(f"Metrics {tag}")
    print("\t".join(f"{k}: {means[k]:.2f}+-{stds[k]:.2f}" for k in keys),
          flush=True)
    return means


def calibrate(data_batches=None, reps: int = 3, size: int = 32,
              batch: int = 8, fid_features=None, sfid=None, seed: int = 0
              ) -> Dict[str, Dict[str, float]]:
    """Run the three control comparisons; returns mean metrics per control."""
    if fid_features is None:
        _, _, fid_features = get_fid_model(None)
    if sfid is None:
        sfid = SliceFID()
    key = jax.random.key(seed)

    def all_metrics(x1, x2):
        fa, fc, fs = sfid(x1, x2)
        return {
            "SSIM": M.ms_ssim_3d(x1, x2),
            "MMD": float(M.mmd(x1, x2)),
            "FIDax": fa, "FIDcor": fc, "FIDsag": fs,
            "3dFID": M.fid_3d(fid_features, x1, x2),
        }

    results = {}
    if data_batches is not None:
        rows = []
        for r in range(reps):
            x1 = data_batches[2 * r % len(data_batches)]
            x2 = data_batches[(2 * r + 1) % len(data_batches)]
            rows.append(all_metrics(x1, x2))
        results["data_vs_data"] = _summarize("vs 2 Data Batches", rows)

    rows = []
    for r in range(reps):
        key, k1, k2 = jax.random.split(key, 3)
        x1 = np.asarray(jax.random.normal(k1, (batch, size, size, size, 1)))
        x2 = np.asarray(jax.random.normal(k2, (batch, size, size, size, 1)))
        rows.append(all_metrics(x1, x2))
    results["randn_vs_randn"] = _summarize("vs 2 RandN", rows)

    rows = []
    for r in range(reps):
        key, k1, k2 = jax.random.split(key, 3)
        x1 = np.asarray(jax.random.normal(k1, (batch, size, size, size, 1)))
        x2 = np.asarray(jax.random.uniform(k2, (batch, size, size, size, 1)))
        rows.append(all_metrics(x1, x2))
    results["randn_vs_rand"] = _summarize("vs RandN/RandU", rows)
    return results


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--data_path", type=str, default="test_lidc_128.npz")
    p.add_argument("--fid_checkpoint", type=str, default="resnet_50.pth")
    p.add_argument("--inception_checkpoint", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    fid_ckpt = a.fid_checkpoint if os.path.isfile(a.fid_checkpoint) else None
    if fid_ckpt is None and a.fid_checkpoint:
        print(f"warning: {a.fid_checkpoint} not found — random FID features",
              flush=True)
    _, _, fid_features = get_fid_model(fid_ckpt)
    sfid = SliceFID(weights_path=a.inception_checkpoint or None)

    batches = None
    if os.path.exists(a.data_path):
        ds = open_dataset(a.data_path)
        print(len(ds))
        loader = Loader(ds, a.batch_size, seed=a.seed, drop_last=False)
        batches = [b[..., None] for _, b in zip(range(6), iter(loader))]
        size = batches[0].shape[1]
    else:
        size = 32
    calibrate(data_batches=batches, size=size, batch=a.batch_size,
              fid_features=fid_features, sfid=sfid, seed=a.seed)


if __name__ == "__main__":
    main()
