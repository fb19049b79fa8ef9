"""Parity for the space-to-depth stem conv (ops/s2d_conv.py).

The packed k=[3,2,2] form must be exactly the k=3 SAME conv (same
multiplies; structural zeros contribute exactly 0), including gradients
and under the spatial (data, space) mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from gan3d_tpu.ops.s2d_conv import (
    eligible,
    fast_stem_enabled,
    set_fast_stem_mode,
    stem_conv3d_s2d,
)

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _ref(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


@pytest.mark.parametrize("shape", [(2, 8, 8, 8), (1, 4, 6, 10),
                                   (2, 16, 8, 12)])
def test_stem_s2d_matches_conv(shape):
    rng = np.random.default_rng(0)
    n, d, h, w = shape
    x = jnp.asarray(rng.normal(size=(n, d, h, w, 1)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 32)) * 0.2, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jax.jit(stem_conv3d_s2d)(x, wt)),
        np.asarray(_ref(x, wt)), rtol=2e-4, atol=2e-4)


def test_stem_s2d_grads_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 16)) * 0.2, jnp.float32)

    def mk_loss(f):
        def loss(x_, w_):
            y = f(x_, w_)
            return jnp.sum(y * jnp.cos(
                jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)))
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    gx_a, gw_a = mk_loss(stem_conv3d_s2d)(x, wt)
    gx_b, gw_b = mk_loss(_ref)(x, wt)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_a), np.asarray(gw_b),
                               rtol=1e-4, atol=1e-4)


def test_eligibility_gates():
    s1, p1, d1 = (1, 1, 1), (1, 1, 1), (1, 1, 1)
    assert eligible((2, 16, 16, 16, 1), (3, 3, 3, 1, 32), s1, p1, d1, 1)
    # not single-channel input
    assert not eligible((2, 16, 16, 16, 4), (3, 3, 3, 4, 32), s1, p1, d1, 1)
    # narrow output
    assert not eligible((2, 16, 16, 16, 1), (3, 3, 3, 1, 8), s1, p1, d1, 1)
    # wrong kernel
    assert not eligible((2, 16, 16, 16, 1), (4, 4, 4, 1, 32),
                        (2, 2, 2), (1, 1, 1), d1, 1)
    # odd H
    assert not eligible((2, 16, 15, 16, 1), (3, 3, 3, 1, 32), s1, p1, d1, 1)
    # strided / padded differently
    assert not eligible((2, 16, 16, 16, 1), (3, 3, 3, 1, 32),
                        (2, 2, 2), p1, d1, 1)
    assert not eligible((2, 16, 16, 16, 1), (3, 3, 3, 1, 32),
                        s1, (0, 0, 0), d1, 1)


def test_mode_flag_and_dispatch():
    from gan3d_tpu.ops.conv3d import conv3d

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 16)) * 0.2, jnp.float32)
    assert not fast_stem_enabled()  # auto = off until step-level A/B
    base = np.asarray(conv3d(x, wt, 1, 1))
    set_fast_stem_mode("on")
    try:
        assert fast_stem_enabled()
        np.testing.assert_allclose(np.asarray(conv3d(x, wt, 1, 1)), base,
                                   rtol=2e-4, atol=2e-4)
    finally:
        set_fast_stem_mode("auto")


def test_spatial_mesh_parity():
    """The pack/unpack reshapes must survive GSPMD depth sharding (the
    spatial mesh shards D, which stays unpacked)."""
    import os
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "space"))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 16)) * 0.2, jnp.float32)
    ref = np.asarray(jax.jit(stem_conv3d_s2d)(x, wt))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
    wr = jax.device_put(wt, NamedSharding(mesh, P()))
    got = np.asarray(jax.device_get(jax.jit(stem_conv3d_s2d)(xs, wr)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
