"""Parity for the tap-map Co=1 head conv (ops/tap_conv.py).

The channel-GEMM + 27-tap shift-add must match the k=3 SAME conv (same
multiplies; the only difference is one intermediate rounding of the tap
maps in low precision), including gradients and under the spatial mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from gan3d_tpu.ops.tap_conv import (
    eligible,
    fast_head_enabled,
    head_conv3d_tap,
    set_fast_head_mode,
)

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _ref(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


@pytest.mark.parametrize("shape", [(2, 8, 8, 8), (1, 4, 6, 10),
                                   (2, 16, 8, 12)])
def test_head_tap_matches_conv(shape):
    rng = np.random.default_rng(0)
    n, d, h, w = shape
    x = jnp.asarray(rng.normal(size=(n, d, h, w, 32)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 3, 3, 32, 1)) * 0.1, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jax.jit(head_conv3d_tap)(x, wt)),
        np.asarray(_ref(x, wt)), rtol=2e-4, atol=2e-4)


def test_head_tap_bf16_within_rounding():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 64)), jnp.bfloat16)
    wt = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 1)) * 0.05, jnp.bfloat16)
    a = np.asarray(jax.jit(head_conv3d_tap)(x, wt), np.float32)
    b = np.asarray(jax.jit(_ref)(x, wt), np.float32)
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
    assert rel < 3e-2, rel


def test_head_tap_grads_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 16)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 1)) * 0.1, jnp.float32)

    def mk_loss(f):
        def loss(x_, w_):
            y = f(x_, w_)
            return jnp.sum(y * jnp.cos(
                jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)))
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    gx_a, gw_a = mk_loss(head_conv3d_tap)(x, wt)
    gx_b, gw_b = mk_loss(_ref)(x, wt)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_a), np.asarray(gw_b),
                               rtol=1e-4, atol=1e-4)


def test_eligibility_gates():
    s1, p1, d1 = (1, 1, 1), (1, 1, 1), (1, 1, 1)
    assert eligible((2, 16, 16, 16, 64), (3, 3, 3, 64, 1), s1, p1, d1, 1)
    # multi-channel output is not the head
    assert not eligible((2, 16, 16, 16, 64), (3, 3, 3, 64, 32),
                        s1, p1, d1, 1)
    # too-narrow input channels (GEMM would not beat the conv)
    assert not eligible((2, 16, 16, 16, 4), (3, 3, 3, 4, 1), s1, p1, d1, 1)
    # wrong kernel / stride / padding / groups
    assert not eligible((2, 16, 16, 16, 64), (1, 1, 1, 64, 1), s1, p1, d1, 1)
    assert not eligible((2, 16, 16, 16, 64), (3, 3, 3, 64, 1),
                        (2, 2, 2), p1, d1, 1)
    assert not eligible((2, 16, 16, 16, 64), (3, 3, 3, 64, 1),
                        s1, (0, 0, 0), d1, 1)
    assert not eligible((2, 16, 16, 16, 64), (3, 3, 3, 32, 1), s1, p1, d1, 2)


def test_mode_flag_and_dispatch():
    from gan3d_tpu.ops.conv3d import conv3d

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 16)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 1)) * 0.1, jnp.float32)
    assert not fast_head_enabled()  # auto = off until step-level A/B
    base = np.asarray(conv3d(x, wt, 1, 1))
    set_fast_head_mode("on")
    try:
        assert fast_head_enabled()
        np.testing.assert_allclose(np.asarray(conv3d(x, wt, 1, 1)), base,
                                   rtol=2e-4, atol=2e-4)
    finally:
        set_fast_head_mode("auto")


def test_spatial_mesh_parity():
    """Depth stays unpacked by the tap construction except for the halo
    pad/slices, which GSPMD must resolve into halo exchanges."""
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "space"))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 16)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 1)) * 0.1, jnp.float32)
    ref = np.asarray(jax.jit(head_conv3d_tap)(x, wt))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "space")))
    wr = jax.device_put(wt, NamedSharding(mesh, P()))
    got = np.asarray(jax.device_get(jax.jit(head_conv3d_tap)(xs, wr)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_boundary_autos_resolve_by_resolution():
    from gan3d_tpu.config import Config
    from gan3d_tpu.train.trainer import resolve_boundary_autos

    assert resolve_boundary_autos(Config(resolution=64)) == ("off", "off")
    assert resolve_boundary_autos(Config(resolution=128)) == ("on", "on")
    assert resolve_boundary_autos(Config(resolution=256)) == ("on", "on")
    # explicit settings pass through untouched
    cfg = Config(resolution=128, fast_stem="off", fast_head="on")
    assert resolve_boundary_autos(cfg) == ("off", "on")


def test_through_generator_tail():
    """The dispatcher must route the flagship G's out_conv (SN-wrapped
    kernel -> ops.conv3d with Co=1, k=3, SAME) through the tap map with
    unchanged outputs and parameters."""
    from gan3d_tpu.config import Config
    from gan3d_tpu.models.registry import build_models

    cfg = Config(resolution=32, batch_size=2, filterG=16, filterD=16,
                 z_size=32, compute_dtype="float32")
    G, _ = build_models(cfg)
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (2, cfg.z_size))
    gp = jax.jit(G.init)(k, z)
    base, _ = G.apply(gp, z, mutable=True)
    set_fast_head_mode("on")
    try:
        fast, _ = G.apply(gp, z, mutable=True)
    finally:
        set_fast_head_mode("auto")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=2e-4, atol=2e-4)
