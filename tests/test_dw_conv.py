"""Parity tests for the Pallas weight-gradient kernel (ops/dw_conv.py).

Runs in Pallas interpret mode on CPU (tests/conftest.py forces the CPU
backend); the real-MXU go/no-go numbers live in scripts/bench_bwd_convs.py
runs on the chip (docs/PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from gan3d_tpu.ops import dw_conv
from gan3d_tpu.ops.conv3d import conv3d


def _plain(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


@pytest.mark.parametrize(
    "n,spatial,cin,cout",
    [(2, (4, 4, 8), 16, 16),
     (1, (3, 5, 8), 8, 16),      # non-cubic, odd rows (dd=1 or 3)
     (1, (8, 4, 4), 16, 32),     # multi-row tiles (dd>1)
     (2, (2, 8, 8), 32, 8),
     (1, (4, 32, 32), 8, 64)],   # h*w over the rhs budget -> h-tiling
)
def test_dw_parity(n, spatial, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, *spatial, cin)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(n, *spatial, cout)), jnp.float32)
    w0 = jnp.zeros((3, 3, 3, cin, cout), jnp.float32)
    ref = jax.grad(
        lambda w_: jnp.vdot(_plain(x, w_), g))(w0)
    with pltpu.force_tpu_interpret_mode():
        got = dw_conv.conv3d_dw(x, g)
        got3 = dw_conv.conv3d_dw(x, g, split=3)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_custom_vjp_full_parity():
    """conv3d_k3_dw's (dx, dW) match plain autodiff through a nonlinearity."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)) / np.sqrt(27 * 16),
                    jnp.float32)

    def loss_plain(x, w):
        return jnp.sum(jnp.tanh(_plain(x, w)))

    def loss_pallas(x, w):
        return jnp.sum(jnp.tanh(dw_conv.conv3d_k3_dw(x, w)))

    # forward is bit-identical (same lax conv)
    np.testing.assert_array_equal(
        np.asarray(_plain(x, w)), np.asarray(dw_conv.conv3d_k3_dw(x, w)))

    gx_r, gw_r = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    with pltpu.force_tpu_interpret_mode():
        gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    # dx takes the same conv autodiff emits — tight tolerance
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


def test_conv3d_routes_when_enabled():
    """conv3d() takes the custom-VJP path only for eligible convs + mode on."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)), jnp.float32)
    w_s2 = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)), jnp.float32)
    try:
        dw_conv.set_fast_dw_mode("on")
        y = conv3d(x, w, stride=1, padding=1)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(_plain(x, w)))
        # ineligible (stride 2) still goes through the plain path
        y2 = conv3d(x, w_s2, stride=2, padding=1)
        assert y2.shape == (1, 2, 2, 4, 8)
        with pltpu.force_tpu_interpret_mode():
            gw = jax.grad(lambda w_: jnp.sum(conv3d(x, w_, 1, 1) ** 2))(w)
        gw_ref = jax.grad(lambda w_: jnp.sum(_plain(x, w_) ** 2))(w)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                                   rtol=1e-4, atol=1e-5)
    finally:
        dw_conv.set_fast_dw_mode("auto")


def test_dw_parity_bf16():
    """The TPU path runs bf16 inputs with f32 accumulation."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)), jnp.bfloat16)
    w0 = jnp.zeros((3, 3, 3, 16, 16), jnp.bfloat16)
    ref = jax.grad(lambda w_: jnp.vdot(
        _plain(x, w_).astype(jnp.float32),
        g.astype(jnp.float32)))(w0).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = dw_conv.conv3d_dw(x, g)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-2)


def test_custom_vjp_under_remat():
    """jax.checkpoint over the custom-VJP conv (the 128^3 remat path)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)) / np.sqrt(27 * 8),
                    jnp.float32)

    def f(x, w):
        return jnp.sum(jnp.tanh(dw_conv.conv3d_k3_dw(x, w)) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_plain = jax.grad(f, argnums=(0, 1))(x, w)
        g_remat = jax.grad(
            lambda x, w: jax.checkpoint(f)(x, w), argnums=(0, 1))(x, w)
    for a, b in zip(g_plain, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_eligibility():
    assert dw_conv.eligible((2, 8, 8, 8, 16), (3, 3, 3, 16, 16),
                            (1, 1, 1), (1, 1, 1), (1, 1, 1), 1)
    # wrong kernel size / stride / padding / groups
    assert not dw_conv.eligible((2, 8, 8, 8, 16), (1, 1, 1, 16, 16),
                                (1, 1, 1), (0, 0, 0), (1, 1, 1), 1)
    assert not dw_conv.eligible((2, 8, 8, 8, 16), (3, 3, 3, 16, 16),
                                (2, 2, 2), (1, 1, 1), (1, 1, 1), 1)
    assert not dw_conv.eligible((2, 8, 8, 8, 16), (3, 3, 3, 8, 16),
                                (1, 1, 1), (1, 1, 1), (1, 1, 1), 2)
    # rhs tile beyond the VMEM budget (huge Co at big spatial)
    assert not dw_conv.eligible((1, 64, 64, 64, 8), (3, 3, 3, 8, 2048),
                                (1, 1, 1), (1, 1, 1), (1, 1, 1), 1)
