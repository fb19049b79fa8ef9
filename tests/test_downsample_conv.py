"""Parity tests for the fused avgpool+1x1-conv path (ops/downsample_conv.py).

The fusion is a pure reformulation: DBlockDeep's `avg_pool3d(2) -> conv4`
main path and `concat([avgpool(x), conv_sc(avgpool(x))])` shortcut
(reference utils.py:108-117) collapse into single k=2/s=2 convs. These
tests pin (f32, CPU): op-level forward and gradient parity vs the composed
formulation, identical param/state trees (checkpoint compatibility), and
block/step-level numerical equality with the mode toggled.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan3d_tpu.nn.blocks import DBlockDeep
from gan3d_tpu.ops import downsample_conv
from gan3d_tpu.ops.conv3d import avg_pool3d, conv3d
from gan3d_tpu.ops.downsample_conv import (
    avgpool_concat_conv3d,
    avgpool_conv3d,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _composed(w, x):
    return conv3d(avg_pool3d(x, 2), w)


def _composed_concat(w, x):
    p = avg_pool3d(x, 2)
    return jnp.concatenate([p, conv3d(p, w)], axis=-1)


def test_avgpool_conv3d_matches_composed(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 1, 1, 5, 7)), jnp.float32)
    np.testing.assert_allclose(avgpool_conv3d(x, w), _composed(w, x),
                               rtol=1e-5, atol=1e-5)


def test_avgpool_concat_conv3d_matches_composed(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 1, 1, 5, 3)), jnp.float32)
    np.testing.assert_allclose(avgpool_concat_conv3d(x, w),
                               _composed_concat(w, x),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fused,composed", [
    (lambda w, x: avgpool_conv3d(x, w), _composed),
    (lambda w, x: avgpool_concat_conv3d(x, w), _composed_concat),
], ids=["main", "concat_shortcut"])
def test_gradients_match_composed(rng, fused, composed):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 1, 1, 5, 3)), jnp.float32)

    def loss(f):
        # non-uniform cotangent so the VJP is exercised beyond a plain sum
        def inner(w_, x_):
            y = f(w_, x_)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size, dtype=jnp.float32)
                                       .reshape(y.shape)))
        return inner

    gw_f, gx_f = jax.grad(loss(fused), argnums=(0, 1))(w, x)
    gw_c, gx_c = jax.grad(loss(composed), argnums=(0, 1))(w, x)
    np.testing.assert_allclose(gw_f, gw_c, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gx_f, gx_c, rtol=1e-4, atol=1e-5)


def _block_apply(mode, x, variables=None):
    downsample_conv.set_fast_downconv_mode(mode)
    try:
        m = DBlockDeep(in_channels=6, out_channels=10, downsample=True)
        if variables is None:
            variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out, mut = m.apply(variables, x, mutable=["spectral"])
        return out, variables, mut
    finally:
        downsample_conv.set_fast_downconv_mode("auto")


def test_dblockdeep_mode_is_pure_reformulation(rng):
    """Same params in -> same output and same spectral-state update, with
    the fused mode on vs off; param trees identical (checkpoint compat)."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 6)), jnp.float32)
    out_off, vars_off, mut_off = _block_apply("off", x)
    out_on, vars_on, mut_on = _block_apply("on", x)

    paths_off = [jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(vars_off)[0]]
    paths_on = [jax.tree_util.keystr(k) for k, _ in
                jax.tree_util.tree_flatten_with_path(vars_on)[0]]
    assert paths_off == paths_on
    for a, b in zip(jax.tree_util.tree_leaves(vars_off),
                    jax.tree_util.tree_leaves(vars_on)):
        np.testing.assert_array_equal(a, b)

    np.testing.assert_allclose(out_on, out_off, rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut_off),
                    jax.tree_util.tree_leaves(mut_on)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # cross-application: params initialized under one mode drive the other
    out_cross, _, _ = _block_apply("on", x, variables=vars_off)
    np.testing.assert_allclose(out_cross, out_off, rtol=1e-5, atol=1e-5)


def test_dblockdeep_grads_match(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 6)), jnp.float32)
    m = DBlockDeep(in_channels=6, out_channels=10, downsample=True)

    downsample_conv.set_fast_downconv_mode("off")
    try:
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    finally:
        downsample_conv.set_fast_downconv_mode("auto")

    def loss(params, mode):
        downsample_conv.set_fast_downconv_mode(mode)
        try:
            out, _ = m.apply({"params": params,
                              "spectral": variables["spectral"]}, x,
                             mutable=["spectral"])
            return jnp.sum(out ** 2)
        finally:
            downsample_conv.set_fast_downconv_mode("auto")

    g_off = jax.grad(lambda p: loss(p, "off"))(variables["params"])
    g_on = jax.grad(lambda p: loss(p, "on"))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_off),
                    jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_train_step_matches_composed(tmp_path):
    """Two biggan train steps produce identical losses with the mode on vs
    off (f32) — the fusion is invisible to training dynamics."""
    from gan3d_tpu.config import Config
    from gan3d_tpu.data.datasets import NpzDataset
    from gan3d_tpu.train import Trainer

    x = np.random.default_rng(0).normal(size=(16, 16, 16, 16))
    path = str(tmp_path / "train.npz")
    np.savez(path, X=np.clip(x, -1, 1).astype(np.float32))
    ds = NpzDataset(path)
    base = dict(resolution=16, z_size=16, filterG=8, filterD=8, batch_size=4,
                niters=2, iterD=2, steps_per_log=10, steps_per_img_log=10,
                steps_per_ckpt=10, compute_dtype="float32",
                data_loader_workers=1, num_devices=1, biggan=True, hinge=True)
    ta = Trainer(ds, Config(log_dir=str(tmp_path / "off"),
                            fast_downconv="off", **base))
    ta.train()
    tb = Trainer(ds, Config(log_dir=str(tmp_path / "on"),
                            fast_downconv="on", **base))
    tb.train()
    np.testing.assert_allclose(ta.G_losses, tb.G_losses, rtol=1e-4)
    np.testing.assert_allclose(ta.D_losses, tb.D_losses, rtol=1e-4)
