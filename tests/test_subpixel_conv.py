"""fast_pix (ops/subpixel_conv.py): sub-pixel s2d/d2s rewrites of the
DCGAN family's k=4 s=2 single-channel boundary convs (round-3 dcgan
trace: ~30% of the step at 1.5-3.9 TF/s). Parity vs XLA's native
conv/tconv at the op, dispatcher, and model level, gradients included."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from gan3d_tpu.ops import subpixel_conv as SP
from gan3d_tpu.ops.conv3d import conv3d, conv_transpose3d

_DN = ("NDHWC", "DHWIO", "NDHWC")


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    SP.set_fast_pix_mode("auto")


def _ref_conv(x, w):
    return lax.conv_general_dilated(x, w, (2, 2, 2), [(1, 1)] * 3,
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


@pytest.mark.parametrize("co", [8, 16])
@pytest.mark.parametrize("shape", [(2, 10, 12, 16, 1), (1, 8, 8, 32, 1)])
def test_conv_s2d_matches_xla(co, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 1, co)).astype(np.float32))
    ref = _ref_conv(x, w)
    got = SP.conv_s2d_k4(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("co", [1, 2])
def test_tconv_d2s_matches_xla(co):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 9, 10, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 16, co)).astype(np.float32))
    SP.set_fast_pix_mode("off")
    ref = conv_transpose3d(x, w, stride=2, padding=1)
    got = SP.tconv_d2s(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grads_match():
    rng = np.random.default_rng(2)

    def loss(fn):
        return lambda a, b: jnp.sum(fn(a, b) ** 2)

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 16, 1)).astype(np.float32))
    SP.set_fast_pix_mode("off")
    gx_r, gw_r = jax.grad(
        loss(lambda a, b: conv_transpose3d(a, b, stride=2, padding=1)),
        argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss(SP.tconv_d2s), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               rtol=2e-3, atol=2e-3)

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 1, 16)).astype(np.float32))
    gx_r, gw_r = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss(SP.conv_s2d_k4), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               rtol=2e-3, atol=2e-3)


def test_gates():
    assert SP.conv_eligible((2, 64, 64, 64, 1), (4, 4, 4, 1, 64),
                            (2, 2, 2), (1, 1, 1), (1, 1, 1), 1)
    assert not SP.conv_eligible((2, 64, 64, 64, 2), (4, 4, 4, 2, 64),
                                (2, 2, 2), (1, 1, 1), (1, 1, 1), 1)  # ci=2
    assert not SP.conv_eligible((2, 64, 64, 64, 1), (4, 4, 4, 1, 64),
                                (1, 1, 1), (1, 1, 1), (1, 1, 1), 1)  # s=1
    assert not SP.conv_eligible((2, 63, 64, 64, 1), (4, 4, 4, 1, 64),
                                (2, 2, 2), (1, 1, 1), (1, 1, 1), 1)  # odd
    assert SP.tconv_eligible((2, 32, 32, 32, 64), (4, 4, 4, 64, 1),
                             (2, 2, 2), (1, 1, 1), (0, 0, 0))
    assert not SP.tconv_eligible((2, 32, 32, 32, 64), (4, 4, 4, 64, 32),
                                 (2, 2, 2), (1, 1, 1), (0, 0, 0))  # co wide
    assert not SP.tconv_eligible((2, 32, 32, 32, 64), (4, 4, 4, 64, 1),
                                 (2, 2, 2), (1, 1, 1), (1, 1, 1))  # op


def test_dispatchers_route(monkeypatch):
    calls = []
    monkeypatch.setattr(SP, "conv_s2d_k4",
                        lambda x, w, _o=SP.conv_s2d_k4:
                        (calls.append("conv"), _o(x, w))[1])
    monkeypatch.setattr(SP, "tconv_d2s",
                        lambda x, w, _o=SP.tconv_d2s:
                        (calls.append("tconv"), _o(x, w))[1])
    rng = np.random.default_rng(3)
    SP.set_fast_pix_mode("on")
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 1, 16)).astype(np.float32))
    a = conv3d(x, w, stride=2, padding=1)
    xt = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 16)).astype(np.float32))
    wt = jnp.asarray(rng.normal(size=(4, 4, 4, 16, 1)).astype(np.float32))
    b = conv_transpose3d(xt, wt, stride=2, padding=1)
    assert calls == ["conv", "tconv"]
    SP.set_fast_pix_mode("off")
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(conv3d(x, w, stride=2, padding=1)),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(b),
        np.asarray(conv_transpose3d(xt, wt, stride=2, padding=1)),
        rtol=2e-5, atol=2e-5)


def test_through_dcgan_models():
    """32^3 DCGAN (WGAN default): G and D outputs and gradients unchanged
    with fast_pix forced on — the gate must catch G's final tconv and D's
    stem conv, and nothing else may shift."""
    from gan3d_tpu.config import Config
    from gan3d_tpu.models.registry import build_models

    cfg = Config(dcgan=True, resolution=32, batch_size=2, filterG=16,
                 filterD=16, z_size=32, compute_dtype="float32")
    G, D = build_models(cfg)
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (2, cfg.z_size))

    def gfwd(p):
        o = G.apply(p, z, mutable=True)[0]
        return o[0] if isinstance(o, tuple) else o

    SP.set_fast_pix_mode("off")
    gp = G.init({"params": k}, z)
    img = gfwd(gp)
    dp = D.init(k, img)
    y = D.apply(dp, img, mutable=True)[0]
    g_ref = jax.grad(lambda p: jnp.sum(gfwd(p) ** 2))(gp)
    gd_ref = jax.grad(
        lambda p: jnp.sum(D.apply(p, img, mutable=True)[0] ** 2))(dp)

    SP.set_fast_pix_mode("on")
    img2 = gfwd(gp)
    y2 = D.apply(dp, img2, mutable=True)[0]
    g = jax.grad(lambda p: jnp.sum(gfwd(p) ** 2))(gp)
    gd = jax.grad(
        lambda p: jnp.sum(D.apply(p, img2, mutable=True)[0] ** 2))(dp)

    np.testing.assert_allclose(np.asarray(img2), np.asarray(img),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y),
                               rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gd_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_fires_in_dcgan_step(monkeypatch):
    """Both rewrites must execute inside the traced dcgan train program
    (the fast_fir lesson: assert the path fires before trusting an A/B)."""
    from gan3d_tpu.config import Config
    from gan3d_tpu.models.registry import build_models
    from gan3d_tpu.train.step import build_train_step
    from gan3d_tpu.train.state import TrainState, make_optimizer

    calls = []
    monkeypatch.setattr(SP, "conv_s2d_k4",
                        lambda x, w, _o=SP.conv_s2d_k4:
                        (calls.append("conv"), _o(x, w))[1])
    monkeypatch.setattr(SP, "tconv_d2s",
                        lambda x, w, _o=SP.tconv_d2s:
                        (calls.append("tconv"), _o(x, w))[1])
    cfg = Config(dcgan=True, resolution=32, batch_size=2, filterG=16,
                 filterD=16, z_size=16, iterD=1, compute_dtype="float32")
    G, D = build_models(cfg)
    key = jax.random.PRNGKey(0)
    gv = G.init({"params": key}, jnp.zeros((2, 16)))
    dv = D.init({"params": key}, jnp.zeros((2, 32, 32, 32, 1)))
    g_tx = make_optimizer(1e-4, 0.0, 0.9)
    d_tx = make_optimizer(1e-4, 0.0, 0.9)
    state = TrainState(
        step=jnp.int32(0), g_params=gv["params"],
        g_state={k: v for k, v in gv.items() if k != "params"},
        g_opt=g_tx.init(gv["params"]), d_params=dv["params"],
        d_state={k: v for k, v in dv.items() if k != "params"},
        d_opt=d_tx.init(dv["params"]),
        ema_params=jax.tree.map(jnp.copy, gv["params"]))
    SP.set_fast_pix_mode("on")
    step = build_train_step(cfg, G, D, g_tx, d_tx)
    jax.eval_shape(step, state, jnp.zeros((1, 2, 32, 32, 32, 1)),
                   jax.random.key(1))
    assert "conv" in calls and "tconv" in calls, calls


# ---- wide (interior-ladder) mode: any Ci / Co ----------------------------

@pytest.fixture()
def _wide_mode():
    SP.set_fast_pix_wide_mode("on")
    yield
    SP.set_fast_pix_wide_mode("auto")


@pytest.mark.parametrize("ci,co", [(8, 16), (16, 8)])
def test_conv_s2d_wide_channels(ci, co, _wide_mode):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 12, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, ci, co)).astype(np.float32))
    ref = _ref_conv(x, w)
    got = SP.conv_s2d_k4(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert SP.conv_eligible(x.shape, w.shape, (2, 2, 2), (1, 1, 1),
                            (1, 1, 1), 1)


@pytest.mark.parametrize("ci,co", [(16, 8), (8, 16)])
def test_tconv_d2s_wide_channels(ci, co, _wide_mode):
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 10, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, ci, co)).astype(np.float32))
    SP.set_fast_pix_mode("off")
    ref = conv_transpose3d(x, w, stride=2, padding=1)
    SP.set_fast_pix_mode("auto")
    got = SP.tconv_d2s(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert SP.tconv_eligible(x.shape, w.shape, (2, 2, 2), (1, 1, 1),
                             (0, 0, 0))


def test_wide_gate_off_by_default():
    """Interior shapes stay on XLA's native conv unless wide mode is on."""
    assert not SP.conv_eligible((2, 8, 8, 8, 64), (4, 4, 4, 64, 128),
                                (2, 2, 2), (1, 1, 1), (1, 1, 1), 1)
    assert not SP.tconv_eligible((2, 8, 8, 8, 64), (4, 4, 4, 64, 32),
                                 (2, 2, 2), (1, 1, 1), (0, 0, 0))


def test_wide_grads_match(_wide_mode):
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 8, 8)).astype(np.float32))

    def mk(fn):
        return jax.jit(jax.grad(
            lambda x_, w_: jnp.sum(fn(x_, w_) ** 2), argnums=(0, 1)))

    gx_a, gw_a = mk(SP.conv_s2d_k4)(x, w)
    gx_b, gw_b = mk(_ref_conv)(x, w)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_a), np.asarray(gw_b),
                               rtol=2e-4, atol=2e-4)
