"""Offline model evaluation CLI (reference: eval.py).

For each `-l` run dir x 3 seeds (`path+'0/1/2'`, reference eval.py:47-48):
rebuild G from the run's persisted params, loop the test set computing
MS-SSIM-3D / MMD / 3D-FID / per-axis slice FID per batch, dump 6 generated
volumes at batch 3, print mean±std, and save `{model}_stats.npz`.

Usage:
    python -m gan3d_tpu.cli.eval -l log/BigGAN --data_path=test_lidc_128.npz \
        --fid_checkpoint=resnet_50.pth
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from gan3d_tpu.data.datasets import open_dataset
from gan3d_tpu.utils.platform import enable_compile_cache
from gan3d_tpu.data.loader import Loader
from gan3d_tpu.eval import metrics as M
from gan3d_tpu.eval.fid_resnet import get_fid_model
from gan3d_tpu.eval.load import load_run, make_sampler
from gan3d_tpu.parallel.mesh import make_mesh
from gan3d_tpu.eval.slice_fid import SliceFID


def evaluate(params) -> None:
    dataset = open_dataset(params.data_path)
    print(len(dataset))
    loader = Loader(dataset, params.batch_size, seed=params.seed)
    _, _, fid_features = get_fid_model(params.fid_checkpoint or None)
    sfid = SliceFID(weights_path=params.inception_checkpoint or None)
    os.makedirs(params.log_dir, exist_ok=True)
    key = jax.random.key(params.seed)
    mesh = make_mesh(params.num_devices) if params.num_devices != 1 else None

    for model_path in params.model_log:
        print(model_path, flush=True)
        stats = {k: [] for k in ("ssim", "mmds", "fid", "fid_ax", "fid_cor",
                                 "fid_sag")}
        for j in range(params.n_seeds):
            run = model_path + f"{j}"
            cfg, G, _, g_vars, _ = load_run(run)
            sample = make_sampler(cfg, G, g_vars, mesh)
            for i, data in enumerate(loader):
                x1 = data[..., None]  # NDHWC
                key, kz = jax.random.split(key)
                x2 = np.asarray(sample(jax.random.normal(
                    kz, (data.shape[0], cfg.z_size))))
                stats["ssim"].append(M.ms_ssim_3d(x1, x2))
                stats["fid"].append(M.fid_3d(fid_features, x1, x2))
                stats["mmds"].append(float(M.mmd(x1, x2)))
                fa, fc, fs = sfid(x1, x2)
                stats["fid_ax"].append(fa)
                stats["fid_cor"].append(fc)
                stats["fid_sag"].append(fs)
                if i == 3:
                    # NCDHW in the dump, like the reference (eval.py:73)
                    np.savez_compressed(f"{run}_ims.npz",
                                        np.moveaxis(x2[:6], -1, 1))
        arr = {k: np.asarray(v) for k, v in stats.items()}
        print(f"SSIM: {arr['ssim'].mean():.2f}+-{arr['ssim'].std():.2f}"
              f"\tMMD: {arr['mmds'].mean():.2f}+-{arr['mmds'].std():.2f}"
              f"\tFID ax: {arr['fid_ax'].mean():.1f}+-{arr['fid_ax'].std():.1f}"
              f"\tFID cor: {arr['fid_cor'].mean():.1f}+-{arr['fid_cor'].std():.1f}"
              f"\tFID sag: {arr['fid_sag'].mean():.1f}+-{arr['fid_sag'].std():.1f}"
              f"\t3d-FID: {arr['fid'].mean():.2f}+-{arr['fid'].std():.2f}",
              flush=True)
        p = model_path.rstrip("/").split("/")[-1]
        np.savez_compressed(os.path.join(params.log_dir, f"{p}_stats.npz"),
                            **arr)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--data_path", type=str, default="test_lidc_128.npz")
    parser.add_argument("--log_dir", type=str, default="log")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num_devices", type=int, default=1,
                        help="data-parallel eval devices (0 = all)")
    parser.add_argument("--n_seeds", type=int, default=3,
                        help="run dirs per model: path+0..path+N-1")
    parser.add_argument("-l", "--model_log", action="append", type=str,
                        required=True)
    parser.add_argument("--fid_checkpoint", type=str, default="resnet_50.pth",
                        help="MedicalNet weights; '' = random features")
    parser.add_argument("--inception_checkpoint", type=str, default="",
                        help="Inception weights for slice FID; '' = random "
                             "feature stand-in")
    params = parser.parse_args(argv)
    enable_compile_cache()
    if params.fid_checkpoint and not os.path.isfile(params.fid_checkpoint):
        print(f"warning: {params.fid_checkpoint} not found — using "
              "randomly-initialized FID features", flush=True)
        params.fid_checkpoint = ""
    evaluate(params)


if __name__ == "__main__":
    main()
