"""Parity for the explicit-conv first-order backward (ops/dx_conv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan3d_tpu.ops import dx_conv

RNG = np.random.default_rng(11)


def _ref_conv(x, w, pads):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=[(p, p) for p in pads],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


@pytest.mark.parametrize("ci,co,pads", [(16, 32, (1, 1, 1)),
                                        (32, 16, (0, 0, 0)),
                                        (24, 24, (1, 0, 1))])
def test_value_and_grads_match_autodiff(ci, co, pads):
    x = jnp.asarray(RNG.normal(size=(2, 6, 6, 6, ci)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(3, 3, 3, ci, co)), jnp.float32)

    def loss(fn):
        return lambda xx, ww: jnp.sum(
            fn(xx, ww) * jnp.cos(jnp.arange(
                fn(xx, ww).size, dtype=jnp.float32).reshape(
                    fn(xx, ww).shape)))

    ref = np.asarray(_ref_conv(x, w, pads))
    got = np.asarray(dx_conv.conv3d_dx(x, w, pads))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    gx_ref, gw_ref = jax.jit(jax.grad(loss(
        lambda a, b: _ref_conv(a, b, pads)), argnums=(0, 1)))(x, w)
    gx, gw = jax.jit(jax.grad(loss(
        lambda a, b: dx_conv.conv3d_dx(a, b, pads)), argnums=(0, 1)))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=2e-4, atol=2e-4)


def test_eligibility_gate():
    e = dx_conv.eligible
    ok = ((2, 8, 8, 8, 16), (3, 3, 3, 16, 32), (1, 1, 1), (1, 1, 1),
          (1, 1, 1), 1)
    assert e(*ok)
    assert not e((2, 8, 8, 8, 1), (3, 3, 3, 1, 32), (1, 1, 1), (1, 1, 1),
                 (1, 1, 1), 1)          # tiny channels -> band/tap paths
    assert not e((2, 8, 8, 8, 16), (3, 3, 3, 16, 32), (2, 2, 2), (1, 1, 1),
                 (1, 1, 1), 1)          # strided
    assert not e((2, 8, 8, 8, 16), (1, 1, 1, 16, 32), (1, 1, 1), (0, 0, 0),
                 (1, 1, 1), 1)          # k=1
    assert not e((2, 8, 8, 8, 16), (3, 3, 3, 8, 32), (1, 1, 1), (1, 1, 1),
                 (1, 1, 1), 2)          # grouped


def test_through_sg1_generator_train_grads():
    """Value + G-param grads of a jitted sg1 forward/backward are identical
    with conv_dx forced on (the wired dx_vjp call sites) vs off."""
    from gan3d_tpu.config import Config
    from gan3d_tpu.models.stylegan import StyleGAN1Generator

    cfg = Config(stylegan=True, resolution=16, z_size=32, filterG=64,
                 filterD=64, compute_dtype="float32")
    G = StyleGAN1Generator(cfg)
    key = jax.random.key(0)
    z = jax.random.normal(key, (2, 32))
    variables = G.init({"params": key, "mixing": key}, z)

    def run():
        def loss(params):
            img = G.apply({"params": params}, z, train=False)
            return jnp.sum(img ** 2)

        val, grads = jax.jit(jax.value_and_grad(loss))(variables["params"])
        return float(val), grads

    dx_conv.set_conv_dx_mode("off")
    try:
        v_ref, g_ref = run()
        dx_conv.set_conv_dx_mode("on")
        v_on, g_on = run()
    finally:
        dx_conv.set_conv_dx_mode("auto")
    assert np.isclose(v_on, v_ref, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
