"""Parity tests for the lane-packed conv rewrite (ops/lane_conv.py).

The rewrite must be numerically equivalent (modulo f32 summation order) to
the plain XLA conv for the exact shapes it claims: k=3, stride 1,
padding 1, dilation 1, groups 1 — both values and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan3d_tpu.ops import lane_conv
from gan3d_tpu.ops.conv3d import conv3d


def _plain(x, w):
    from jax import lax
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


@pytest.mark.parametrize("variant", ["k2", "k3"])
@pytest.mark.parametrize(
    "shape,cin,cout,t",
    [((2, 8, 8, 8), 32, 32, 4),
     ((1, 6, 5, 8), 16, 16, 8),      # non-cubic volume
     ((2, 4, 4, 16), 24, 48, 2),     # cin != cout, non-pow2 channels
     ((1, 8, 8, 8), 8, 64, 2),
     ((1, 4, 4, 4), 32, 32, 2)],     # W == 2T edge (k3: nW=2; k2: 3 tiles)
)
def test_value_parity(variant, shape, cin, cout, t):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(*shape, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)), jnp.float32)
    ref = _plain(x, w)
    got = lane_conv.lane_conv3d(x, w, t, variant)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant", ["k2", "k3"])
def test_grad_parity(variant):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 32)), jnp.float32)

    def loss_plain(x, w):
        return jnp.sum(jnp.tanh(_plain(x, w)))

    def loss_lane(x, w):
        return jnp.sum(jnp.tanh(lane_conv.lane_conv3d(x, w, 4, variant)))

    gx_r, gw_r = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    gx_l, gw_l = jax.grad(loss_lane, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_l), np.asarray(gx_r),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gw_l), np.asarray(gw_r),
                               rtol=5e-4, atol=5e-5)


def test_hybrid_parity():
    """hybrid_conv3d (plain fwd, lane-packed dx): value is the plain conv
    by construction; custom-VJP grads must match plain autodiff."""
    rng = np.random.default_rng(3)
    for cin, cout, t in [(16, 16, 8), (32, 32, 4), (24, 48, 2)]:
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 8, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(lane_conv.hybrid_conv3d(x, w, t)),
            np.asarray(_plain(x, w)))

        def loss_plain(x, w):
            return jnp.sum(jnp.tanh(_plain(x, w)))

        def loss_h(x, w, t=t):
            return jnp.sum(jnp.tanh(lane_conv.hybrid_conv3d(x, w, t)))

        gx_r, gw_r = jax.grad(loss_plain, argnums=(0, 1))(x, w)
        gx_h, gw_h = jax.grad(loss_h, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_r),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(gw_h), np.asarray(gw_r),
                                   rtol=5e-4, atol=5e-5)


def test_conv3d_dispatch_bwd_mode():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 32, 32)), jnp.float32)
    old_mode, old_var = lane_conv._MODE, lane_conv._VARIANT
    try:
        lane_conv.set_lane_conv_mode("off")
        ref = conv3d(x, w, 1, 1)
        gr = jax.grad(lambda x: jnp.sum(jnp.tanh(conv3d(x, w, 1, 1))))(x)
        lane_conv.set_lane_conv_mode("bwd")
        assert lane_conv.lane_conv_mode() == "bwd"
        got = conv3d(x, w, 1, 1)
        gh = jax.grad(lambda x: jnp.sum(jnp.tanh(conv3d(x, w, 1, 1))))(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gr),
                                   rtol=5e-4, atol=5e-5)
    finally:
        lane_conv.set_lane_conv_mode(old_mode, old_var)


def test_pick_tile():
    assert lane_conv.pick_tile(32, 64) == 4
    assert lane_conv.pick_tile(64, 64) == 2
    assert lane_conv.pick_tile(128, 64) is None   # already full-lane
    assert lane_conv.pick_tile(16, 64) == 8
    assert lane_conv.pick_tile(32, 6) == 2        # divisibility cap
    assert lane_conv.pick_tile(32, 7) is None
    assert lane_conv.pick_tile(32, 4) == 4        # T == W allowed
    assert lane_conv.pick_tile(96, 64) is None    # 2*96 > 128


def test_eligibility_gating():
    # strided / k!=3 / grouped / dilated convs must never be rewritten
    assert lane_conv.eligible((1, 8, 8, 8, 32), (3, 3, 3, 32, 32),
                              (1, 1, 1), (1, 1, 1), (1, 1, 1), 1) == 4
    assert lane_conv.eligible((1, 8, 8, 8, 32), (3, 3, 3, 32, 32),
                              (2, 2, 2), (1, 1, 1), (1, 1, 1), 1) is None
    assert lane_conv.eligible((1, 8, 8, 8, 32), (1, 1, 1, 32, 32),
                              (1, 1, 1), (1, 1, 1), (1, 1, 1), 1) is None
    assert lane_conv.eligible((1, 8, 8, 8, 32), (3, 3, 3, 32, 32),
                              (1, 1, 1), (0, 0, 0), (1, 1, 1), 1) is None
    assert lane_conv.eligible((1, 8, 8, 8, 32), (3, 3, 3, 16, 32),
                              (1, 1, 1), (1, 1, 1), (1, 1, 1), 2) is None


def test_conv3d_dispatch_parity():
    """conv3d with the rewrite forced on matches the default path."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 32, 32)), jnp.float32)
    old_mode, old_var = lane_conv._MODE, lane_conv._VARIANT
    try:
        lane_conv.set_lane_conv_mode("off")
        ref = conv3d(x, w, 1, 1)
        lane_conv.set_lane_conv_mode("on", "k2")
        got = conv3d(x, w, 1, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        # ineligible conv takes the plain path regardless of mode
        ref_s = conv3d(x, w, 2, 1)
        assert ref_s.shape == (2, 4, 4, 4, 32)
    finally:
        lane_conv.set_lane_conv_mode(old_mode, old_var)


def test_expand_weights_density():
    """Structural sanity: the expansion places each tap exactly once per
    output sub-position (27*Cin*Cout nonzeros per tile row group)."""
    w = jnp.ones((3, 3, 3, 4, 4))
    for variant in ("k2", "k3"):
        w2 = lane_conv.expand_weights(w, 4, variant)
        # every output column must receive exactly 27 taps * Cin inputs
        nz_per_col = np.count_nonzero(np.asarray(w2), axis=(0, 1, 2, 3))
        assert (nz_per_col == 27 * 4).all()
