"""Spatial (GSPMD) parallelism: volume-depth sharding over a "space" axis.

The volumetric analog of context parallelism (SURVEY §5.7): activations
shard their depth axis across the mesh and XLA's SPMD partitioner inserts
the conv halo exchanges. Verified here on the virtual 8-device CPU mesh
(2 data x 4 space) against unsharded numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gan3d_tpu.config import Config
from gan3d_tpu.data.datasets import NpzDataset
from gan3d_tpu.ops.conv3d import avg_pool3d, conv3d, conv_transpose3d
from gan3d_tpu.ops.upsample_conv import upsample_conv3d_tconv
from gan3d_tpu.parallel.mesh import make_mesh
from gan3d_tpu.train import Trainer


@pytest.fixture
def mesh():
    return make_mesh(0, spatial=4)  # 8 devices -> 2 data x 4 space


def _vol(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), jnp.float32)


def _run_sharded(mesh, fn, x, *rest):
    """jit fn with x sharded [N, D(space), H, W, C] and result gathered."""
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
    rep = [jax.device_put(r, NamedSharding(mesh, P())) for r in rest]
    out = jax.jit(fn)(xs, *rep)
    return np.asarray(jax.device_get(out))


def test_spatial_conv_halo_matches_unsharded(mesh):
    x = _vol((2, 16, 8, 8, 4))
    w = _vol((3, 3, 3, 4, 6), seed=1)
    fn = lambda a, b: conv3d(a, b, stride=1, padding=1)  # noqa: E731
    np.testing.assert_allclose(
        _run_sharded(mesh, fn, x, w), np.asarray(fn(x, w)),
        rtol=1e-5, atol=1e-5)


def test_spatial_strided_and_transposed_conv(mesh):
    x = _vol((2, 16, 8, 8, 4))
    w = _vol((4, 4, 4, 4, 6), seed=2)
    down = lambda a, b: conv3d(a, b, stride=2, padding=1)  # noqa: E731
    np.testing.assert_allclose(
        _run_sharded(mesh, down, x, w), np.asarray(down(x, w)),
        rtol=1e-5, atol=1e-5)
    wt = _vol((4, 4, 4, 4, 6), seed=3)
    up = lambda a, b: conv_transpose3d(a, b, stride=2, padding=1)  # noqa: E731
    np.testing.assert_allclose(
        _run_sharded(mesh, up, x, wt), np.asarray(up(x, wt)),
        rtol=1e-5, atol=1e-5)


def test_spatial_fused_tconv_upconv(mesh):
    """The fast_upconv tconv form (lhs-dilated conv) under depth sharding."""
    x = _vol((2, 8, 8, 8, 4))
    w = _vol((3, 3, 3, 4, 6), seed=4)
    np.testing.assert_allclose(
        _run_sharded(mesh, upsample_conv3d_tconv, x, w),
        np.asarray(upsample_conv3d_tconv(x, w)), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("vjp_mode", ["custom", "autodiff"])
def test_spatial_fused_downconv_and_vjp(mesh, vjp_mode):
    """The fast_downconv fused convs AND both their backward forms (the
    collapsed custom VJP — the 128^3 TPU default — and plain autodiff,
    ops/downsample_conv.py) under depth sharding: the reshape-based
    pool/broadcast must survive GSPMD.  CPU auto-mode resolves
    fast_downconv off and downconv_vjp to autodiff, so this pins both
    TPU code paths explicitly."""
    from gan3d_tpu.ops.downsample_conv import (
        avgpool_concat_conv3d,
        avgpool_conv3d,
        set_downconv_vjp_mode,
    )

    x = _vol((2, 16, 8, 8, 4))
    w = _vol((1, 1, 1, 4, 6), seed=5)
    set_downconv_vjp_mode(vjp_mode)
    try:
        for op in (avgpool_conv3d, avgpool_concat_conv3d):
            np.testing.assert_allclose(
                _run_sharded(mesh, op, x, w), np.asarray(op(x, w)),
                rtol=1e-5, atol=1e-5, err_msg=op.__name__)

            def loss(a, b, _op=op):
                y = _op(a, b)
                return jnp.sum(
                    y * jnp.sin(jnp.arange(y.size, dtype=jnp.float32)
                                .reshape(y.shape)))

            grad = jax.grad(loss, argnums=(0, 1))
            gx_ref, gw_ref = jax.jit(grad)(x, w)
            xs = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
            wr = jax.device_put(w, NamedSharding(mesh, P()))
            gx_sp, gw_sp = jax.jit(grad)(xs, wr)
            np.testing.assert_allclose(
                np.asarray(jax.device_get(gx_sp)), np.asarray(gx_ref),
                rtol=1e-5, atol=1e-5, err_msg=op.__name__)
            np.testing.assert_allclose(
                np.asarray(jax.device_get(gw_sp)), np.asarray(gw_ref),
                rtol=1e-5, atol=1e-5, err_msg=op.__name__)
    finally:
        set_downconv_vjp_mode("auto")


def test_spatial_avgpool(mesh):
    x = _vol((2, 16, 8, 8, 4))
    fn = lambda a: avg_pool3d(a, 2)  # noqa: E731
    np.testing.assert_allclose(
        _run_sharded(mesh, fn, x), np.asarray(fn(x)), rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
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


def test_spatial_biggan_train_matches_data_parallel(dataset16, tmp_path):
    """Full fused BigGAN train step on a 2x2 (data, space) mesh reproduces
    the data-parallel losses.

    16^3 / 4 devices on purpose: a 32^3 training program with 8 rendezvous
    participants overwhelms the virtual CPU backend (the collective
    rendezvous hard-aborts under pytest load) — the 32^3 attention path is
    covered by the single-forward parity test below instead.
    """
    assert len(jax.devices()) == 8
    try:
        t_sp = Trainer(dataset16, _cfg(tmp_path, "sp", biggan=True,
                                       hinge=True, num_devices=4,
                                       spatial_devices=2))
        t_sp.train()
    finally:
        _reset_attention_impl()
    t_dp = Trainer(dataset16, _cfg(tmp_path, "dp", biggan=True, hinge=True,
                                   num_devices=4))
    t_dp.train()
    assert np.isfinite(t_sp.G_losses).all()
    # Same logical program, different partitioning: equal modulo f32
    # reduction order, amplified over 2 optimizer steps.
    np.testing.assert_allclose(t_sp.G_losses, t_dp.G_losses,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t_sp.D_losses),
                               np.asarray(t_dp.D_losses),
                               rtol=5e-3, atol=5e-3)


def test_spatial_biggan_32cube_attention_fwd_parity(mesh):
    """Single G forward at 32^3 — covers the SAGAN attention (reshape across
    the sharded depth axis forces a GSPMD reshard) without a training loop."""
    from gan3d_tpu.models import build_models
    from gan3d_tpu.ops.attention import set_attention_impl

    cfg = Config(biggan=True, hinge=True, resolution=32, filterG=8,
                 filterD=8, z_size=16, batch_size=2,
                 compute_dtype="float32", spatial_devices=4)
    set_attention_impl("xla")
    try:
        G, _ = build_models(cfg)
        z = jax.random.normal(jax.random.key(1), (2, 16))
        gv = jax.jit(G.init)({"params": jax.random.key(0)}, z)

        def gfwd(v, zz):
            return G.apply(v, zz, train=True,
                           mutable=["batch_stats", "spectral"])[0]

        ref = np.asarray(jax.jit(gfwd)(gv, z))
        rep = NamedSharding(mesh, P())
        bout = NamedSharding(mesh, P("data", "space"))
        sharded = np.asarray(jax.device_get(
            jax.jit(gfwd, in_shardings=(rep, rep),
                    out_shardings=bout)(gv, z)))
    finally:
        _reset_attention_impl()
    np.testing.assert_allclose(ref, sharded, atol=2e-4)


def test_spatial_dcgan_train(dataset16, tmp_path):
    """DCGAN's stride-2 transposed-conv G under depth sharding."""
    try:
        t = Trainer(dataset16, _cfg(tmp_path, "dcsp", dcgan=True,
                                    num_devices=4, spatial_devices=2))
        t.train()
    finally:
        _reset_attention_impl()
    assert np.isfinite(t.G_losses).all()


def test_spatial_stylegan2_train(dataset16, tmp_path):
    """StyleGAN2's synthesis (upfirdn lhs-dilated convs, modulated conv,
    per-layer noise) + lazy-reg step builder under depth sharding."""
    try:
        t = Trainer(dataset16, _cfg(tmp_path, "sgsp", stylegan2=True,
                                    filterG=64, filterD=64, iterD=1,
                                    num_devices=4, spatial_devices=2))
        t.train()
    finally:
        _reset_attention_impl()
    assert np.isfinite(t.G_losses).all()
    assert t.state.ema_params is not None


def test_spatial_resolution_divisibility_raises(dataset16, tmp_path):
    with pytest.raises(ValueError, match="divisible"):
        Trainer(dataset16, _cfg(tmp_path, "bad", dcgan=True,
                                spatial_devices=3, num_devices=0))
    _reset_attention_impl()
