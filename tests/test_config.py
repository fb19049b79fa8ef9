"""Config round-trip, family precedence, derived architectures."""

import os

from gan3d_tpu.config import Config, config_from_args


def test_roundtrip(tmp_path):
    cfg = Config(biggan=True, hinge=True, filterG=64, filterD=64,
                 log_dir=str(tmp_path))
    cfg.save()
    cfg2 = Config.load(str(tmp_path))
    assert cfg2 == cfg


def test_family_precedence():
    # reference trainer.py:52-68: hybrid > dcgan > stylegan2 > stylegan > biggan
    assert Config(hybrid=True, dcgan=True, stylegan2=True).family() == "hybrid"
    assert Config(dcgan=True, stylegan2=True).family() == "dcgan"
    assert Config(stylegan2=True, stylegan=True).family() == "stylegan2"
    assert Config(stylegan=True, sngan=True).family() == "stylegan"
    assert Config(sngan=True).family() == "biggan"
    assert Config(biggan=True).family() == "biggan"
    assert Config().family() == "biggan"


def test_biggan_arch_matches_reference_at_128():
    cfg = Config(filterG=128, filterD=128, resolution=128)
    g = cfg.biggan_g_arch()
    # reference biggan.py:14-17
    assert g["in_channels"] == [m * 128 for m in [16, 16, 8, 4, 2]]
    assert g["out_channels"] == [m * 128 for m in [16, 8, 4, 2, 1]]
    assert g["resolution"] == [8, 16, 32, 64, 128]
    assert g["attention"][32] and not g["attention"][64]
    d = cfg.biggan_d_arch()
    # reference biggan.py:70-75
    assert d["in_channels"] == [m * 128 for m in [1, 2, 4, 8, 16]]
    assert d["out_channels"] == [m * 128 for m in [2, 4, 8, 16, 16]]
    assert d["resolution"] == [64, 32, 16, 8, 4]
    assert d["attention"][16] and not d["attention"][8]


def test_dcgan_channels_at_128():
    cfg = Config(filterG=128, filterD=128, resolution=128)
    # reference dcgan.py:17-70 / 117-182
    assert cfg.dcgan_g_channels() == [128 * m for m in [16, 8, 4, 2, 1]]
    assert cfg.dcgan_d_channels() == [128 * m for m in [1, 2, 4, 8, 16]]


def test_small_resolutions():
    cfg = Config(filterG=32, resolution=32)
    assert cfg.num_up_stages == 3
    assert cfg.dcgan_g_channels() == [128, 64, 32]
    g = cfg.biggan_g_arch()
    assert g["resolution"] == [8, 16, 32]


def test_cli_bool_parsing():
    cfg = config_from_args(["--biggan=True", "--hinge=true", "--dcgan=False",
                            "--filterG", "64"])
    assert cfg.biggan and cfg.hinge and not cfg.dcgan and cfg.filterG == 64


def test_load_reference_pickle(tmp_path):
    # eval-time interop with reference params.pkl (argparse Namespace).
    import argparse
    import pickle

    ns = argparse.Namespace(niters=100, batch_size=4, z_size=64, filterG=16,
                            filterD=16, dcgan=True, sngan=False, biggan=False)
    with open(os.path.join(tmp_path, "params.pkl"), "wb") as f:
        pickle.dump(ns, f)
    cfg = Config.load(str(tmp_path))
    assert cfg.dcgan and cfg.z_size == 64 and cfg.filterG == 16
