"""Cross-model discriminator-judged tournament (reference: tournament.py).

For every judge model (D + its own G), a decision bound is the midpoint of
mean D(real) and mean D(G_own(z)); every rival G then plays `rounds` rounds
of 2x batch fakes, scoring the fraction that clear the bound; mean win rate
per G is reported (reference tournament.py:35-98).

Deviation from the reference (documented, SURVEY §2.3): the reference resets
its real/fake score accumulators inside the data loop (tournament.py:38), so
the bound effectively uses only the LAST batch. We accumulate over all
batches by default; pass --compat_last_batch to reproduce the reference.
"""

from __future__ import annotations

import argparse
from typing import Dict, List

import jax
import numpy as np

from gan3d_tpu.data.datasets import open_dataset
from gan3d_tpu.utils.platform import enable_compile_cache
from gan3d_tpu.data.loader import Loader
from gan3d_tpu.eval.load import load_run, make_discriminator_fn, make_sampler
from gan3d_tpu.parallel.mesh import make_mesh


def get_decision_bound(score, sample, z_size: int, loader, key,
                       compat_last_batch: bool = False) -> float:
    rs: List[np.ndarray] = []
    fs: List[np.ndarray] = []
    for x in loader:
        if compat_last_batch:
            rs, fs = [], []
        x = x[..., None]
        key, kz = jax.random.split(key)
        noise = jax.random.normal(kz, (x.shape[0], z_size))
        rs.append(np.asarray(score(x)).ravel())
        fs.append(np.asarray(score(sample(noise))).ravel())
    r = np.concatenate(rs)
    f = np.concatenate(fs)
    return float((r.mean() + f.mean()) / 2.0)


def play_round(score, sample, z_size: int, bound: float, batch_size: int,
               key, rounds: int = 2) -> float:
    wins = 0
    for i in range(rounds):
        key, kz = jax.random.split(key)
        noise = jax.random.normal(kz, (batch_size, z_size))
        f = np.asarray(score(sample(noise))).ravel()
        wins += int((f > bound).sum())
    return wins / (batch_size * rounds)


def tournament(loader, params) -> Dict[str, float]:
    names = params.model_log
    res: Dict[str, List[float]] = {n: [] for n in names}
    key = jax.random.key(params.seed)
    # Data-parallel evaluation mesh (BASELINE config 5: tournament at 128^3
    # across a DP TPU mesh); num_devices=1 stays single-chip.
    mesh = make_mesh(params.num_devices) if params.num_devices != 1 else None
    for name_d in names:
        for k in range(params.n_seeds):
            cfg_d, G_d, D_d, gv_d, dv_d = load_run(name_d + f"{k}")
            score = make_discriminator_fn(cfg_d, D_d, dv_d, mesh)
            sample_own = make_sampler(cfg_d, G_d, gv_d, mesh)
            key, kb = jax.random.split(key)
            bound = get_decision_bound(score, sample_own, cfg_d.z_size,
                                       loader, kb,
                                       params.compat_last_batch)
            for name_g in names:
                if name_d == name_g:
                    continue
                for m in range(params.n_seeds):
                    cfg_g, G_g, _, gv_g, _ = load_run(name_g + f"{m}")
                    sample = make_sampler(cfg_g, G_g, gv_g, mesh)
                    key, kr = jax.random.split(key)
                    wr = play_round(score, sample, cfg_g.z_size, bound,
                                    params.batch_size, kr)
                    res[name_g].append(wr)

    print("------------- Tournament Results -------------")
    means = {}
    for n in names:
        means[n] = float(np.mean(res[n])) if res[n] else float("nan")
        print(f"G of {n} with Mean Win Rate of {means[n]:.2f}")
    return means


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--data_path", type=str, default="test_lidc_128.npz")
    p.add_argument("--log_dir", type=str, default="log")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_seeds", type=int, default=3)
    p.add_argument("--num_devices", type=int, default=1,
                   help="data-parallel eval devices (0 = all)")
    p.add_argument("--compat_last_batch", action="store_true",
                   help="reproduce the reference's last-batch-only bound")
    p.add_argument("-l", "--model_log", action="append", type=str,
                   required=True)
    params = p.parse_args(argv)
    enable_compile_cache()

    dataset = open_dataset(params.data_path)
    print(len(dataset))
    loader = Loader(dataset, params.batch_size, seed=params.seed,
                    drop_last=False)
    tournament(loader, params)


if __name__ == "__main__":
    main()
