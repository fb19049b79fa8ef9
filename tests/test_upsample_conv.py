"""Parity tests for the fused upsample+conv (ops/upsample_conv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan3d_tpu.ops.conv3d import conv3d, upsample_nearest3d
from gan3d_tpu.ops.upsample_conv import upsample_conv3d, upsample_conv3d_tconv


def _composed(x, w):
    return conv3d(upsample_nearest3d(x, 2), w, stride=1, padding=1)


@pytest.mark.parametrize("fused", [upsample_conv3d, upsample_conv3d_tconv])
@pytest.mark.parametrize(
    "shape,cin,cout",
    [((2, 4, 4, 4), 8, 8),
     ((1, 3, 5, 4), 16, 4),     # non-cubic
     ((2, 2, 2, 2), 4, 12)])    # tiny volume, cin != cout
def test_value_parity(fused, shape, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(*shape, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)), jnp.float32)
    ref = _composed(x, w)
    got = fused(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fused_op", [upsample_conv3d, upsample_conv3d_tconv])
def test_grad_parity(fused_op):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 16)), jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(jnp.tanh(_composed(x, w)))

    def loss_fused(x, w):
        return jnp.sum(jnp.tanh(fused_op(x, w)))

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("mode", ["on", "tconv"])
def test_gblock_fused_parity(mode):
    """GBlockDeep with fast_upconv on/tconv vs off: identical params (the
    fused conv is the same layer), near-identical outputs."""
    from gan3d_tpu.nn.blocks import GBlockDeep
    from gan3d_tpu.ops import upsample_conv as uc

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 16)), jnp.float32)
    m = GBlockDeep(in_channels=16, out_channels=8, upsample=True)
    old = uc._MODE
    try:
        uc.set_fast_upconv_mode("off")
        v_off = m.init(jax.random.PRNGKey(0), x)
        y_off = m.apply(v_off, x, mutable=["batch_stats", "spectral"])[0]
        uc.set_fast_upconv_mode(mode)
        v_on = m.init(jax.random.PRNGKey(0), x)
        chex = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape, v_off["params"], v_on["params"]))
        assert chex, "fused path must not change the param tree"
        y_on = m.apply(v_off, x, mutable=["batch_stats", "spectral"])[0]
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   rtol=1e-5, atol=1e-5)
    finally:
        uc.set_fast_upconv_mode(old)


def test_bf16_runs():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 8)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)), jnp.bfloat16)
    y = upsample_conv3d(x, w)
    assert y.dtype == jnp.bfloat16 and y.shape == (1, 8, 8, 8, 8)
    ref = _composed(x.astype(jnp.float32), w.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.1)
