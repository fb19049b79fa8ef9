"""fast_c1 (ops/c1_conv.py): banded spatial-matmul lowering for the
tiny-channel k=3 convs that dominate the StyleGAN2 64^3 step (round-3
trace: 68% of device time at 0.1-0.2 TF/s). Parity vs XLA's native conv
at the op, resample-path, and model level, gradients included."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan3d_tpu.ops import c1_conv as C
from gan3d_tpu.models.stylegan import resample as R


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    C.set_fast_c1_mode("auto")


def _xla_conv(x, w, pads):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), list(pads),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


@pytest.mark.parametrize("ci,co", [(1, 1), (2, 2), (1, 2), (2, 1)])
@pytest.mark.parametrize("pads", [((1, 1), (1, 1), (1, 1)),
                                  ((0, 2), (2, 0), (1, 1)),
                                  ((0, 0), (0, 0), (0, 0))],
                         ids=["same", "asym", "valid"])
def test_small_conv3d_matches_xla(ci, co, pads):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 5, 32, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32))
    ref = _xla_conv(x, w, pads)
    got = C.small_conv3d(x, w, pads)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_small_conv3d_grads_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 32, 1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 1)).astype(np.float32))
    pads = ((1, 1), (1, 1), (1, 1))

    def loss(fn):
        return lambda xx, ww: jnp.sum(fn(xx, ww) ** 2)

    gx_ref, gw_ref = jax.grad(loss(lambda a, b: _xla_conv(a, b, pads)),
                              argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss(lambda a, b: C.small_conv3d(a, b, pads)),
                      argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=2e-4, atol=2e-4)


def test_gate():
    # wide channels, small W, k!=3, groups: all must fall through
    assert C.small_conv3d_applicable((2, 64, 64, 64, 1), (3, 3, 3, 1, 1), 1)
    assert C.small_conv3d_applicable((2, 32, 32, 32, 2), (3, 3, 3, 2, 2), 1)
    assert not C.small_conv3d_applicable((2, 64, 64, 64, 4),
                                         (3, 3, 3, 4, 4), 1)
    assert not C.small_conv3d_applicable((2, 16, 16, 16, 1),
                                         (3, 3, 3, 1, 1), 1)
    assert not C.small_conv3d_applicable((2, 64, 64, 64, 1),
                                         (1, 1, 1, 1, 1), 1)
    assert not C.small_conv3d_applicable((2, 64, 64, 64, 2),
                                         (3, 3, 3, 1, 2), 2)


@pytest.mark.parametrize("flip", [True, False])
def test_conv3d_resample_c1_path(flip):
    """conv3d_resample with fast_c1 on == off for the plain-conv case the
    sg2 synthesis/discriminator k=3 layers hit (incl. flip_weight)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 32, 1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 1)).astype(np.float32))
    C.set_fast_c1_mode("off")
    ref = R.conv3d_resample(x, w, padding=1, flip_weight=flip)
    C.set_fast_c1_mode("on")
    got = R.conv3d_resample(x, w, padding=1, flip_weight=flip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_through_stylegan2_models():
    """32^3 sg2 with the reference channel table (2 channels at 32^3): G
    and D outputs and gradients unchanged with fast_c1 forced on."""
    from gan3d_tpu.config import Config
    from gan3d_tpu.models.registry import build_models

    cfg = Config(stylegan2=True, resolution=32, batch_size=1, filterG=64,
                 filterD=64, z_size=32, compute_dtype="float32")
    G, D = build_models(cfg)
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (1, cfg.z_size))
    gp = G.init({"params": k, "noise": jax.random.PRNGKey(1),
                 "mixing": jax.random.PRNGKey(2)}, z)

    def gfwd(p):
        o = G.apply(p, z, mutable=True,
                    rngs={"noise": jax.random.PRNGKey(1),
                          "mixing": jax.random.PRNGKey(2)})[0]
        return o[0] if isinstance(o, tuple) else o

    C.set_fast_c1_mode("off")
    img = jax.jit(gfwd)(gp)
    dp = D.init(k, img)
    y = D.apply(dp, img, mutable=True)[0]
    g_ref = jax.jit(jax.grad(
        lambda p: jnp.sum(gfwd(p).astype(jnp.float32) ** 2)))(gp)
    gd_ref = jax.jit(jax.grad(
        lambda p: jnp.sum(D.apply(p, img, mutable=True)[0] ** 2)))(dp)

    C.set_fast_c1_mode("on")
    img2 = jax.jit(gfwd)(gp)
    y2 = D.apply(dp, img2, mutable=True)[0]
    g = jax.jit(jax.grad(
        lambda p: jnp.sum(gfwd(p).astype(jnp.float32) ** 2)))(gp)
    gd = jax.jit(jax.grad(
        lambda p: jnp.sum(D.apply(p, img2, mutable=True)[0] ** 2)))(dp)

    np.testing.assert_allclose(np.asarray(img2), np.asarray(img),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gd_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def _xla_conv_ud(x, w, pads, up, down):
    return jax.lax.conv_general_dilated(
        x, w, down, list(pads), lhs_dilation=up,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


@pytest.mark.parametrize("ci,co,up,down,pads,shape", [
    (2, 1, 2, 1, ((2, 2), (2, 2), (2, 2)), (2, 5, 6, 32, 2)),  # G b64 up
    (1, 2, 1, 2, ((0, 0), (0, 0), (0, 0)), (2, 7, 9, 33, 1)),  # D b64 down
    (1, 1, 2, 1, ((1, 2), (2, 1), (2, 2)), (2, 4, 5, 32, 1)),
    (2, 2, 1, 2, ((0, 0), (0, 0), (0, 0)), (2, 8, 8, 32, 2)),
], ids=["g-up", "d-down", "up-asym", "down-c2"])
def test_small_conv3d_ud_matches_xla(ci, co, up, down, pads, shape):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32))
    u3, d3 = (up,) * 3, (down,) * 3
    ref = _xla_conv_ud(x, w, pads, u3, d3)
    got = C.small_conv3d_ud(x, w, pads, u3, d3)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", ["g-up", "up-asym"])
def test_small_conv3d_ud_wfirst_parity(case):
    """The W-band-first einsum order (c1_wfirst, up-convs only): values
    AND both grads match the default order / XLA."""
    ci, co, pads, shape = {
        "g-up": (2, 1, ((2, 2), (2, 2), (2, 2)), (2, 5, 6, 32, 2)),
        "up-asym": (1, 1, ((1, 2), (2, 1), (2, 2)), (2, 4, 5, 32, 1)),
    }[case]
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32))
    u3, d3 = (2,) * 3, (1,) * 3
    ref = _xla_conv_ud(x, w, pads, u3, d3)

    def loss(fn):
        return lambda xx, ww: jnp.sum(fn(xx, ww) ** 2)

    gx_ref, gw_ref = jax.grad(
        loss(lambda a, b: _xla_conv_ud(a, b, pads, u3, d3)),
        argnums=(0, 1))(x, w)
    C.set_c1_wfirst_mode("on")
    try:
        got = C.small_conv3d_ud(x, w, pads, u3, d3)
        gx, gw = jax.grad(
            loss(lambda a, b: C.small_conv3d_ud(a, b, pads, u3, d3)),
            argnums=(0, 1))(x, w)
    finally:
        C.set_c1_wfirst_mode("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("up,down", [(2, 1), (1, 2)], ids=["up", "down"])
def test_small_conv3d_ud_grads_match(up, down):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 32, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 1)).astype(np.float32))
    pads = ((2, 2), (2, 2), (2, 2)) if up == 2 else ((0, 0), (0, 0), (0, 0))
    u3, d3 = (up,) * 3, (down,) * 3

    def loss(fn):
        return lambda xx, ww: jnp.sum(fn(xx, ww) ** 2)

    gx_ref, gw_ref = jax.grad(
        loss(lambda a, b: _xla_conv_ud(a, b, pads, u3, d3)),
        argnums=(0, 1))(x, w)
    gx, gw = jax.grad(
        loss(lambda a, b: C.small_conv3d_ud(a, b, pads, u3, d3)),
        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=2e-3, atol=2e-3)


def test_ud_gate():
    a = C.small_conv3d_ud_applicable
    assert a((2, 32, 32, 32, 2), (3, 3, 3, 2, 1), 1, 2, 1)
    assert a((2, 65, 65, 65, 1), (3, 3, 3, 1, 2), 1, 1, 2)
    assert not a((2, 32, 32, 32, 4), (3, 3, 3, 4, 2), 1, 2, 1)  # wide
    assert not a((2, 16, 16, 16, 2), (3, 3, 3, 2, 1), 1, 2, 1)  # small W
    assert not a((2, 32, 32, 32, 2), (3, 3, 3, 2, 1), 2, 2, 1)  # groups
    assert not a((2, 32, 32, 32, 2), (3, 3, 3, 2, 1), 1, 4, 1)  # up=4
    assert not a((2, 32, 32, 32, 2), (1, 1, 1, 2, 1), 1, 2, 1)  # k=1


@pytest.mark.parametrize("flip", [True, False])
@pytest.mark.parametrize("mode", ["up", "down"])
def test_conv3d_resample_ud_path(mode, flip):
    """conv3d_resample's up=2 / down=2 cases (the sg2 G/D resampled conv
    layers) with fast_c1 on == off, incl. flip_weight and the FIR."""
    rng = np.random.default_rng(5)
    f = R.setup_filter()
    if mode == "up":
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 32, 2))
                        .astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 1)).astype(np.float32))
        kw = dict(up=2, padding=1)
    else:
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 64, 1))
                        .astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 2)).astype(np.float32))
        kw = dict(down=2, padding=1)
    C.set_fast_c1_mode("off")
    ref = R.conv3d_resample(x, w, f=f, flip_weight=flip,
                            f1d=(1, 3, 3, 1), **kw)
    C.set_fast_c1_mode("on")
    got = R.conv3d_resample(x, w, f=f, flip_weight=flip,
                            f1d=(1, 3, 3, 1), **kw)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ud_fires_in_sg2_model(monkeypatch):
    """The up/down lowering must execute inside the traced 64^3 sg2 G and
    D (the fast_fir lesson — assert the path fires, don't trust an A/B)."""
    from gan3d_tpu.config import Config
    from gan3d_tpu.models.registry import build_models

    calls = []
    orig = C.small_conv3d_ud

    def spy(x, w, pads, up, down):
        calls.append((tuple(x.shape), up, down))
        return orig(x, w, pads, up, down)

    monkeypatch.setattr(C, "small_conv3d_ud", spy)
    cfg = Config(stylegan2=True, resolution=64, batch_size=1, filterG=64,
                 filterD=64, z_size=16, compute_dtype="float32")
    G, D = build_models(cfg)
    k = jax.random.PRNGKey(0)
    C.set_fast_c1_mode("on")

    def fwd(z):
        o = G.apply(gp, z, mutable=True,
                    rngs={"noise": jax.random.PRNGKey(1),
                          "mixing": jax.random.PRNGKey(2)})[0]
        img = o[0] if isinstance(o, tuple) else o
        return D.apply(dp, img, mutable=True)[0]

    z = jnp.zeros((1, 16))
    gp = G.init({"params": k, "noise": jax.random.PRNGKey(1),
                 "mixing": jax.random.PRNGKey(2)}, z)
    dp = D.init(k, jnp.zeros((1, 64, 64, 64, 1)))
    jax.eval_shape(fwd, z)
    ups = [c for c in calls if c[1] == (2, 2, 2)]
    downs = [c for c in calls if c[2] == (2, 2, 2)]
    assert ups, "up=2 banded lowering never fired in the sg2 G"
    assert downs, "down=2 banded lowering never fired in the sg2 D"


def test_fires_in_sg2_step(monkeypatch):
    """The lowering must actually execute inside the jitted sg2 program
    (the fast_fir lesson: a gated path that never fires measures exactly
    no-change). Count small_conv3d calls during a traced train step."""
    from gan3d_tpu.config import Config
    from gan3d_tpu.models.registry import build_models
    from gan3d_tpu.models.stylegan.loss import build_stylegan_step
    from gan3d_tpu.train.state import TrainState, make_optimizer

    calls = []
    orig = C.small_conv3d

    def spy(*a, **kw):
        calls.append(a[0].shape)
        return orig(*a, **kw)

    monkeypatch.setattr(C, "small_conv3d", spy)
    # resample.py imports inside the function, so patch the source module

    cfg = Config(stylegan2=True, resolution=32, batch_size=2, filterG=64,
                 filterD=64, z_size=16, iterD=1, compute_dtype="float32")
    G, D = build_models(cfg)
    key = jax.random.PRNGKey(0)
    z0 = jnp.zeros((2, 16))
    gv = G.init({"params": key, "noise": key}, z0)
    dv = D.init({"params": key}, jnp.zeros((2, 32, 32, 32, 1)))
    g_tx = make_optimizer(1e-4, 0.0, 0.9)
    d_tx = make_optimizer(1e-4, 0.0, 0.9)
    state = TrainState(
        step=jnp.int32(0), g_params=gv["params"],
        g_state={k: v for k, v in gv.items() if k != "params"},
        g_opt=g_tx.init(gv["params"]), d_params=dv["params"],
        d_state={k: v for k, v in dv.items() if k != "params"},
        d_opt=d_tx.init(dv["params"]),
        ema_params=jax.tree.map(jnp.copy, gv["params"]),
        pl_mean=jnp.float32(0))
    C.set_fast_c1_mode("on")
    step = build_stylegan_step(cfg, G, D, g_tx, d_tx,
                               static_r1=False, static_pl=False)
    jax.eval_shape(step, state,
                   jnp.zeros((1, 2, 32, 32, 32, 1)), jax.random.key(1))
    assert calls, "fast_c1 never fired in the sg2 step trace"
