"""Parity tests for the transposed-layout wide-N conv (ops/wide_conv.py).

Runs in Pallas interpret mode on CPU (tests/conftest.py forces the CPU
backend); the go/no-go numbers live in scripts/bench_wide_conv.py runs on
the chip (docs/PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from gan3d_tpu.ops import wide_conv
from gan3d_tpu.ops.conv3d import conv3d


def _plain(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


@pytest.mark.parametrize(
    "n,spatial,cin,cout",
    [(2, (4, 4, 8), 16, 16),
     (1, (3, 5, 8), 8, 16),      # non-cubic, odd depth
     (1, (8, 4, 4), 16, 32),     # multi-row tiles
     (2, (2, 8, 8), 32, 8)],
)
def test_forward_parity(n, spatial, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, *spatial, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) / np.sqrt(27 * cin),
                    jnp.float32)
    ref = _plain(x, w)
    with pltpu.force_tpu_interpret_mode():
        got = wide_conv.wide_conv3d(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_forward_parity_bf16():
    """The TPU path runs bf16 inputs; kernel accumulates f32."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)) / np.sqrt(27 * 16),
                    jnp.bfloat16)
    ref = _plain(x, w).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = wide_conv.wide_conv3d(x, w).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-2)


def test_grad_parity():
    """dx (wide kernel, swapped weights) + dW (dw_conv kernel) vs autodiff."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 8)) / np.sqrt(27 * 16),
                    jnp.float32)

    def loss_plain(x, w):
        return jnp.sum(jnp.tanh(_plain(x, w)))

    def loss_wide(x, w):
        return jnp.sum(jnp.tanh(wide_conv.wide_conv3d(x, w)))

    gx_r, gw_r = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    with pltpu.force_tpu_interpret_mode():
        gx_p, gw_p = jax.grad(loss_wide, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


def test_conv3d_routes_when_enabled():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)), jnp.float32)
    try:
        wide_conv.set_wide_conv_mode("on")
        with pltpu.force_tpu_interpret_mode():
            y = conv3d(x, w, stride=1, padding=1)
        np.testing.assert_allclose(np.asarray(y), np.asarray(_plain(x, w)),
                                   rtol=1e-4, atol=1e-4)
        # ineligible (stride 2) still takes the plain path (no interpret ctx)
        y2 = conv3d(x, w, stride=2, padding=1)
        assert y2.shape == (1, 2, 2, 4, 8)
    finally:
        wide_conv.set_wide_conv_mode("auto")


def test_under_remat():
    """jax.checkpoint over the fully-Pallas conv (the 128^3 remat path).

    Interpret mode implements pallas_call with ordered io-callbacks, whose
    effects `jax.checkpoint` partial-eval rejects — so this can only run
    against the real Mosaic lowering; on CPU it asserts that exact
    limitation (a behavior change would be worth noticing) and the on-chip
    coverage lives in scripts/bench_wide_conv.py --remat.
    """
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)) / np.sqrt(27 * 8),
                    jnp.float32)

    def f(x, w):
        return jnp.sum(jnp.tanh(wide_conv.wide_conv3d(x, w)) ** 2)

    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            with pytest.raises(NotImplementedError):
                jax.grad(lambda x, w: jax.checkpoint(f)(x, w),
                         argnums=(0, 1))(x, w)
        return
    g_plain = jax.grad(f, argnums=(0, 1))(x, w)
    g_remat = jax.grad(
        lambda x, w: jax.checkpoint(f)(x, w), argnums=(0, 1))(x, w)
    for a, b in zip(g_plain, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_full_train_step_parity(tmp_path):
    """One fused BigGAN step with wide_conv+fast_dw on (interpret) vs off.

    Catches step-machinery interactions the op tests can't: SN-wrapped
    kernels, optimizer/EMA through the custom VJPs, donated buffers.
    filterG/D=32 so the bottleneck convs (hidden = ch/4 >= 8) clear the
    min-channel eligibility gate.
    """
    import os

    from gan3d_tpu.config import Config
    from gan3d_tpu.data.datasets import NpzDataset
    from gan3d_tpu.ops import dw_conv as dwm
    from gan3d_tpu.train import Trainer

    x = np.random.default_rng(0).normal(size=(8, 16, 16, 16)).astype(
        np.float32)
    path = str(tmp_path / "train.npz")
    np.savez(path, X=np.clip(x, -1, 1))

    def run(mode, sub):
        cfg = Config(resolution=16, z_size=16, filterG=32, filterD=32,
                     batch_size=2, niters=1, iterD=1, steps_per_log=1,
                     biggan=True, hinge=True, compute_dtype="float32",
                     wide_conv=mode, fast_dw=mode, num_devices=1,
                     log_dir=str(tmp_path / sub), data_loader_workers=1)
        t = Trainer(NpzDataset(path), cfg)
        reals = jnp.asarray(
            np.stack([x[:2]])[..., None], jnp.float32)  # [iterD,2,16^3,1]
        state, metrics, _ = t._step(t.state, reals, t._base_key, 0)
        out = {k: float(v) for k, v in metrics.items()}
        t.loader.close()
        return out

    m_off = run("off", "off")
    with pltpu.force_tpu_interpret_mode():
        m_on = run("on", "on")
    assert set(m_on) == set(m_off)
    for k in m_off:
        np.testing.assert_allclose(m_on[k], m_off[k], rtol=2e-3, atol=2e-3,
                                   err_msg=k)


def test_eligibility():
    ok = ((2, 8, 8, 8, 16), (3, 3, 3, 16, 16))
    assert wide_conv.eligible(*ok, (1, 1, 1), (1, 1, 1), (1, 1, 1), 1)
    assert not wide_conv.eligible(ok[0], ok[1],
                                  (2, 2, 2), (1, 1, 1), (1, 1, 1), 1)
    assert not wide_conv.eligible(ok[0], (1, 1, 1, 16, 16),
                                  (1, 1, 1), (0, 0, 0), (1, 1, 1), 1)
