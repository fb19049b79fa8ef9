"""Aux subsystems: energy tracking, profiling window, multi-host batch
helper (single-process path), inception feature extractor."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def test_energy_tracker_writes_summary(tmp_path):
    from gan3d_tpu.utils.energy import EnergyTracker

    t = EnergyTracker(enabled=True, n_chips=2, watts_per_chip=100.0)
    for _ in range(3):
        t.epoch_start()
        t.epoch_end()
    t.write(str(tmp_path))
    with open(tmp_path / "energy.json") as f:
        s = json.load(f)
    assert s["chips"] == 2
    assert s["kwh_estimate"] >= 0
    # disabled tracker writes nothing
    t2 = EnergyTracker(enabled=False)
    t2.write(str(tmp_path / "none"))
    assert not os.path.exists(tmp_path / "none" / "energy.json")


def test_training_with_energy_and_profile(tmp_path):
    from gan3d_tpu.config import Config
    from gan3d_tpu.data.datasets import NpzDataset
    from gan3d_tpu.train import Trainer

    x = np.random.default_rng(0).normal(
        size=(8, 16, 16, 16)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "d.npz")
    np.savez(p, X=x)
    cfg = Config(dcgan=True, resolution=16, z_size=16, filterG=8, filterD=8,
                 batch_size=4, niters=2, iterD=1, num_devices=1,
                 steps_per_log=5, steps_per_img_log=5, steps_per_ckpt=5,
                 log_dir=str(tmp_path / "log"), compute_dtype="float32",
                 data_loader_workers=1, track_energy=True)
    t = Trainer(NpzDataset(p), cfg)
    t.train()
    assert os.path.isfile(os.path.join(cfg.log_dir, "energy.json"))


def test_put_global_batch_single_process():
    from gan3d_tpu.parallel.mesh import make_mesh, put_global_batch

    mesh = make_mesh(4)
    x = np.zeros((2, 8, 4, 4, 4, 1), np.float32)
    from jax.sharding import PartitionSpec as P

    arr = put_global_batch(mesh, x, P(None, "data"))
    assert arr.shape == x.shape
    assert len(arr.sharding.device_set) == 4


def test_inception_converter_roundtrip(tmp_path):
    import torch

    from gan3d_tpu.eval.inception import InceptionV3, load_torch_weights

    model = InceptionV3()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))

    sd = {}

    def walk(params, stats, prefix):
        for k, v in params.items():
            path = f"{prefix}.{k}" if prefix else k
            if k == "conv":
                sd[path + ".weight"] = torch.from_numpy(
                    np.asarray(v["kernel"]).transpose(3, 2, 0, 1).copy())
            elif k == "bn":
                sd[path + ".weight"] = torch.from_numpy(np.asarray(v["scale"]))
                sd[path + ".bias"] = torch.from_numpy(np.asarray(v["bias"]))
                st = stats[k]
                sd[path + ".running_mean"] = torch.from_numpy(
                    np.asarray(st["mean"]))
                sd[path + ".running_var"] = torch.from_numpy(
                    np.asarray(st["var"]))
            else:
                walk(v, stats[k], path)

    walk(variables["params"], variables["batch_stats"], "")
    path = str(tmp_path / "pt_inception.pth")
    torch.save(sd, path)
    loaded = load_torch_weights(path)
    x = jnp.asarray(np.random.default_rng(0).random((1, 75, 75, 3)),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(model.apply(variables, x)),
                               np.asarray(model.apply(loaded, x)), atol=1e-5)


def test_slice_fid_with_inception_extractor():
    from gan3d_tpu.eval.inception import InceptionV3Features
    from gan3d_tpu.eval.slice_fid import SliceFID

    feats = InceptionV3Features()  # random init
    sfid = SliceFID(extractor=feats, batch_size=32)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 8, 8, 8, 1)).astype(np.float32)
    b = rng.normal(size=(4, 8, 8, 8, 1)).astype(np.float32)
    fa, fc, fs = sfid(a, b)
    assert all(np.isfinite([fa, fc, fs]))


def test_inloop_fid_auto_warns_without_weights(tmp_path, capsys):
    """Default fid_in_loop=None (auto): faithful in-loop FID whenever
    Inception weights exist; without them it warns once and logs nan
    (VERDICT r1 missing #3)."""
    from gan3d_tpu.config import Config
    from gan3d_tpu.data.datasets import NpzDataset
    from gan3d_tpu.train import Trainer

    x = np.random.default_rng(0).normal(
        size=(8, 16, 16, 16)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "d.npz")
    np.savez(p, X=x)
    cfg = Config(dcgan=True, resolution=16, z_size=16, filterG=8, filterD=8,
                 batch_size=4, niters=1, iterD=1, num_devices=1,
                 steps_per_log=1, steps_per_img_log=5, steps_per_ckpt=5,
                 log_dir=str(tmp_path / "log"), compute_dtype="float32",
                 data_loader_workers=1)
    assert cfg.fid_in_loop is None  # auto is the default
    t = Trainer(NpzDataset(p), cfg)
    t.train()
    out = capsys.readouterr().out
    assert "no Inception weights found" in out
    assert "FID nan" in out


def test_inloop_fid_with_random_features(tmp_path, capsys):
    """cfg.fid_in_loop wires the in-loop axial slice FID (random-feature
    stand-in without Inception weights) — numbers become finite."""
    from gan3d_tpu.config import Config
    from gan3d_tpu.data.datasets import NpzDataset
    from gan3d_tpu.train import Trainer

    x = np.random.default_rng(0).normal(
        size=(8, 16, 16, 16)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "d.npz")
    np.savez(p, X=x)
    cfg = Config(dcgan=True, resolution=16, z_size=16, filterG=8, filterD=8,
                 batch_size=4, niters=2, iterD=1, num_devices=1,
                 steps_per_log=1, steps_per_img_log=5, steps_per_ckpt=5,
                 log_dir=str(tmp_path / "log"), compute_dtype="float32",
                 data_loader_workers=1, fid_in_loop=True)
    t = Trainer(NpzDataset(p), cfg)
    t.train()
    out = capsys.readouterr().out
    assert "FID nan" not in out
    assert t.fid and np.isfinite(t.fid[-1])
