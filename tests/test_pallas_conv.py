"""Parity tests for the Pallas direct conv (ops/pallas_conv.py).

Runs in Pallas interpret mode on CPU (tests/conftest.py forces the CPU
backend); the real-MXU numbers live in scripts/bench_lane_conv.py runs on
the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from gan3d_tpu.ops import pallas_conv


def _plain(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


@pytest.mark.parametrize(
    "shape,cin,cout,t",
    [((2, 4, 4, 8), 32, 32, 4),
     ((1, 3, 5, 8), 16, 16, 8),     # non-cubic
     ((1, 4, 4, 8), 8, 64, 2)],
)
def test_value_parity(shape, cin, cout, t):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(*shape, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) / np.sqrt(27 * cin),
                    jnp.float32)
    ref = _plain(x, w)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_conv.pallas_conv3d(x, w, t)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_grad_parity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 32)) / np.sqrt(27 * 16),
                    jnp.float32)

    def loss_plain(x, w):
        return jnp.sum(jnp.tanh(_plain(x, w)))

    def loss_pallas(x, w):
        return jnp.sum(jnp.tanh(pallas_conv.pallas_conv3d(x, w, 4)))

    gx_r, gw_r = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    with pltpu.force_tpu_interpret_mode():
        gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_toeplitz_structure():
    w = jnp.asarray(np.arange(3 * 3 * 3 * 2 * 2, dtype=np.float32)
                    .reshape(3, 3, 3, 2, 2))
    b = pallas_conv.toeplitz_weights(w, 4)
    # rows padded to the Mosaic 128-lane DMA alignment; tail must be zero
    assert b.shape == (9, 128, 4 * 2)
    b = np.asarray(b)
    assert (b[:, 6 * 2:, :] == 0).all()
    w_np = np.asarray(w)
    for ab in range(9):
        a, bb = divmod(ab, 3)
        for u in range(6):
            for t in range(4):
                blk = b[ab, u * 2:(u + 1) * 2, t * 2:(t + 1) * 2]
                if 0 <= u - t <= 2:
                    np.testing.assert_array_equal(blk, w_np[a, bb, u - t])
                else:
                    assert (blk == 0).all()
