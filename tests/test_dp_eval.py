"""Data-parallel evaluation over the virtual 8-device mesh
(BASELINE config 5 machinery at test scale)."""

import numpy as np

import jax

from gan3d_tpu.config import Config
from gan3d_tpu.data.datasets import NpzDataset
from gan3d_tpu.train import Trainer


def test_tournament_dp_mesh(tmp_path, capsys):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 16, 16, 16)).astype(np.float32).clip(-1, 1)
    data_path = str(tmp_path / "test.npz")
    np.savez(data_path, X=x)
    ds = NpzDataset(data_path)

    bases = {}
    for fam, flags in [("a", dict(dcgan=True)), ("b", dict(hinge=True))]:
        base = str(tmp_path / fam)
        for seed in range(1):
            cfg = Config(resolution=16, z_size=16, filterG=8, filterD=8,
                         batch_size=4, niters=1, iterD=1, steps_per_log=5,
                         steps_per_img_log=5, steps_per_ckpt=5,
                         log_dir=base + f"{seed}", seed=seed,
                         compute_dtype="float32", num_devices=1,
                         data_loader_workers=1, **flags)
            Trainer(ds, cfg).train()
        bases[fam] = base

    from gan3d_tpu.cli.tournament import main

    assert len(jax.devices()) == 8
    main(["--data_path", data_path, "--batch_size", "8", "--n_seeds", "1",
          "--num_devices", "0", "-l", bases["a"], "-l", bases["b"]])
    out = capsys.readouterr().out
    assert "Tournament Results" in out
    assert out.count("Mean Win Rate") == 2


def test_dp_sampler_sharding(tmp_path):
    from gan3d_tpu.eval.load import load_run, make_sampler
    from gan3d_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 16, 16, 16)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "d.npz")
    np.savez(p, X=x)
    cfg = Config(dcgan=True, resolution=16, z_size=16, filterG=8, filterD=8,
                 batch_size=4, niters=1, iterD=1, num_devices=1,
                 steps_per_log=5, steps_per_img_log=5, steps_per_ckpt=5,
                 log_dir=str(tmp_path / "run0"), compute_dtype="float32",
                 data_loader_workers=1)
    Trainer(NpzDataset(p), cfg).train()

    cfg2, G, _, g_vars, _ = load_run(str(tmp_path / "run0"))
    mesh = make_mesh(8)
    sample = make_sampler(cfg2, G, g_vars, mesh)
    out = sample(np.random.default_rng(0).normal(
        size=(8, 16)).astype(np.float32))
    assert out.shape == (8, 16, 16, 16, 1)
    assert len(out.sharding.device_set) == 8
