"""Tensor (channel) parallelism over the "model" mesh axis (parallel/tp.py).

The reference's only parallelism is nn.DataParallel (SURVEY §2.2); TP is
the TPU-native extension the survey sketches for when a model outgrows one
chip's HBM channel-wise. Verified on the virtual CPU mesh against
data-parallel-only numerics: the sharding annotations must be invisible to
training dynamics (GSPMD inserts the collectives; same logical program).
"""

import jax
import numpy as np
import pytest

from gan3d_tpu.config import Config
from gan3d_tpu.data.datasets import NpzDataset
from gan3d_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from gan3d_tpu.parallel.tp import count_sharded, tp_shardings
from gan3d_tpu.train import Trainer


@pytest.fixture
def dataset16(tmp_path):
    x = np.random.default_rng(0).normal(
        size=(8, 16, 16, 16)).astype(np.float32)
    path = str(tmp_path / "train16.npz")
    np.savez(path, X=np.clip(x, -1, 1))
    return NpzDataset(path)


def _cfg(tmp_path, name, **kw):
    base = dict(resolution=16, z_size=16, filterG=8, filterD=8, batch_size=4,
                niters=2, iterD=2, steps_per_log=1, steps_per_img_log=10,
                steps_per_ckpt=10, log_dir=str(tmp_path / name),
                compute_dtype="float32", data_loader_workers=1,
                num_devices=0)
    base.update(kw)
    return Config(**base)


def _reset_attention_impl():
    from gan3d_tpu.ops.attention import set_attention_impl

    set_attention_impl(None)


def test_mesh_model_axis():
    mesh = make_mesh(4, model=2)
    assert mesh.shape == {"data": 2, MODEL_AXIS: 2}


def test_mesh_rejects_spatial_plus_model():
    with pytest.raises(ValueError, match="cannot be combined"):
        make_mesh(8, spatial=2, model=2)


def test_tp_sharding_rule():
    """Wide kernels shard their last dim; biases/vectors and attention
    params replicate."""
    mesh = make_mesh(4, model=2)
    tree = {
        "conv": {"kernel": np.zeros((3, 3, 3, 8, 32)),
                 "bias": np.zeros((32,))},
        "dense": {"kernel": np.zeros((16, 64))},
        "narrow": {"kernel": np.zeros((3, 3, 3, 8, 8))},  # 8/2 < 8: rep
        "odd": {"kernel": np.zeros((3, 3, 3, 8, 33))},    # not divisible
        "attn0": {"f": {"kernel": np.zeros((1, 1, 1, 64, 32))}},  # excluded
    }
    sh = tp_shardings(tree, mesh)
    assert count_sharded(sh) == 2  # conv.kernel + dense.kernel
    assert sh["conv"]["kernel"].spec[-1] == MODEL_AXIS
    assert sh["conv"]["bias"].spec == ()
    assert sh["attn0"]["f"]["kernel"].spec == ()


def test_tp_biggan_train_matches_data_parallel(dataset16, tmp_path):
    """Full fused BigGAN train on a 2x2 (data, model) mesh reproduces the
    data-parallel losses (16^3 / 4 devices — same virtual-CPU rendezvous
    limit as tests/test_spatial.py)."""
    assert len(jax.devices()) == 8
    try:
        t_tp = Trainer(dataset16, _cfg(tmp_path, "tp", biggan=True,
                                       hinge=True, num_devices=4,
                                       model_devices=2))
        # the rule must actually engage on this model
        assert count_sharded(t_tp._state_shard) > 0
        t_tp.train()
    finally:
        _reset_attention_impl()
    t_dp = Trainer(dataset16, _cfg(tmp_path, "dp", biggan=True, hinge=True,
                                   num_devices=4))
    t_dp.train()
    assert np.isfinite(t_tp.G_losses).all()
    # Same logical program, different partitioning: equal modulo f32
    # reduction order, amplified over 2 optimizer steps.
    np.testing.assert_allclose(t_tp.G_losses, t_dp.G_losses,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t_tp.D_losses),
                               np.asarray(t_dp.D_losses),
                               rtol=5e-3, atol=5e-3)


def test_tp_dcgan_train_runs(dataset16, tmp_path):
    """DCGAN family (transposed convs) under TP: finite losses, sharded
    leaves engaged."""
    try:
        t = Trainer(dataset16, _cfg(tmp_path, "tpd", dcgan=True,
                                    num_devices=4, model_devices=2))
        assert count_sharded(t._state_shard) > 0
        t.train()
    finally:
        _reset_attention_impl()
    assert np.isfinite(t.G_losses).all()
