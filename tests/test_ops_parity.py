"""Numerical parity of core ops vs torch (CPU) oracles.

Torch is the semantics oracle for the reference's building blocks; our ops
are NDHWC so tests transpose at the boundary. Weight layout mapping:
  conv3d:           torch [O,I,kd,kh,kw] -> ours [kd,kh,kw,I,O] (2,3,4,1,0)
  conv_transpose3d: torch [I,O,kd,kh,kw] -> ours [kd,kh,kw,I,O] (2,3,4,0,1)
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gan3d_tpu.ops.conv3d import (
    avg_pool3d,
    conv3d,
    conv_transpose3d,
    max_pool3d,
    upsample_nearest3d,
    upsample_trilinear3d,
)

RNG = np.random.default_rng(42)


def ncdhw(x_ndhwc):
    return np.moveaxis(x_ndhwc, -1, 1)


def ndhwc(x_ncdhw):
    return np.moveaxis(x_ncdhw, 1, -1)


def rand(*shape):
    return RNG.normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("k,s,p,d", [(3, 1, 1, 1), (4, 2, 1, 1), (1, 1, 0, 1),
                                     (4, 1, 0, 1), (3, 1, 2, 2), (7, 2, 3, 1)])
def test_conv3d_vs_torch(k, s, p, d):
    x = rand(2, 4, 9, 9, 9)  # NCDHW
    w = rand(5, 4, k, k, k)  # OIkkk
    ref = F.conv3d(torch.from_numpy(x), torch.from_numpy(w), stride=s,
                   padding=p, dilation=d).numpy()
    out = conv3d(jnp.asarray(ndhwc(x)), jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
                 stride=s, padding=p, dilation=d)
    np.testing.assert_allclose(ncdhw(np.asarray(out)), ref, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (4, 1, 0), (3, 2, 1), (2, 2, 0),
                                   (5, 3, 2)])
def test_conv_transpose3d_vs_torch(k, s, p):
    x = rand(2, 3, 5, 5, 5)
    w = rand(3, 4, k, k, k)  # torch ConvTranspose: [in, out, k, k, k]
    ref = F.conv_transpose3d(torch.from_numpy(x), torch.from_numpy(w),
                             stride=s, padding=p).numpy()
    out = conv_transpose3d(jnp.asarray(ndhwc(x)),
                           jnp.asarray(w.transpose(2, 3, 4, 0, 1)),
                           stride=s, padding=p)
    np.testing.assert_allclose(ncdhw(np.asarray(out)), ref, atol=2e-4, rtol=1e-4)


def test_avg_and_max_pool_vs_torch():
    x = rand(2, 3, 8, 8, 8)
    ref_a = F.avg_pool3d(torch.from_numpy(x), 2).numpy()
    ref_m = F.max_pool3d(torch.from_numpy(x), [2, 2, 2], stride=2).numpy()
    out_a = avg_pool3d(jnp.asarray(ndhwc(x)), 2)
    out_m = max_pool3d(jnp.asarray(ndhwc(x)), 2)
    np.testing.assert_allclose(ncdhw(np.asarray(out_a)), ref_a, atol=1e-6)
    np.testing.assert_allclose(ncdhw(np.asarray(out_m)), ref_m, atol=1e-6)
    # FID ResNet stem maxpool: k=3, s=2, p=1
    ref_p = F.max_pool3d(torch.from_numpy(x), 3, stride=2, padding=1).numpy()
    out_p = max_pool3d(jnp.asarray(ndhwc(x)), 3, stride=2, padding=1)
    np.testing.assert_allclose(ncdhw(np.asarray(out_p)), ref_p, atol=1e-6)


def test_upsample_nearest_vs_torch():
    x = rand(2, 3, 4, 4, 4)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2).numpy()
    out = upsample_nearest3d(jnp.asarray(ndhwc(x)), 2)
    np.testing.assert_allclose(ncdhw(np.asarray(out)), ref, atol=1e-6)


def test_upsample_trilinear_vs_torch():
    x = rand(2, 3, 4, 4, 4)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2,
                        mode="trilinear").numpy()
    out = upsample_trilinear3d(jnp.asarray(ndhwc(x)), 2)
    np.testing.assert_allclose(ncdhw(np.asarray(out)), ref, atol=1e-5, rtol=1e-5)


def test_upsample_trilinear_matmul_vs_torch():
    """The fast-tri banded-matmul path matches torch trilinear
    (align_corners=False) exactly on the same taps, including clamped
    edge rows, and its autodiff grads match the resize path's."""
    import jax
    from gan3d_tpu.ops.conv3d import set_fast_tri_mode

    x = rand(2, 3, 4, 6, 8)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2,
                        mode="trilinear").numpy()
    set_fast_tri_mode("on")
    try:
        out = upsample_trilinear3d(jnp.asarray(ndhwc(x)), 2)
        np.testing.assert_allclose(ncdhw(np.asarray(out)), ref,
                                   atol=1e-5, rtol=1e-5)
        xj = jnp.asarray(ndhwc(x))
        g_fast = jax.grad(
            lambda v: float(0) + (upsample_trilinear3d(v, 2) ** 2).sum()
        )(xj)
        set_fast_tri_mode("off")
        g_ref = jax.grad(
            lambda v: (upsample_trilinear3d(v, 2) ** 2).sum())(xj)
    finally:
        # restore inside finally so a raise above can't leak "off"/"on"
        # into later tests in the same process (ADVICE r3)
        set_fast_tri_mode("auto")
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_upsample_trilinear_matmul_scale4():
    from gan3d_tpu.ops.conv3d import set_fast_tri_mode

    x = rand(1, 2, 4, 4, 4)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=4,
                        mode="trilinear").numpy()
    set_fast_tri_mode("on")
    try:
        out = upsample_trilinear3d(jnp.asarray(ndhwc(x)), 4)
    finally:
        set_fast_tri_mode("auto")
    np.testing.assert_allclose(ncdhw(np.asarray(out)), ref,
                               atol=1e-5, rtol=1e-5)
