"""Metric functions: MMD, PSNR, MS-SSIM-3D, Fréchet distance, 3D-FID.

Reference: eval_utils.py:11-52.
- mmd: linear-kernel MMD on flattened volumes (eval_utils.py:11-21) —
  note the reference's estimator includes the diagonal self-similarity
  terms; reproduced verbatim.
- psnr: on [-1, 1] data, peak-to-peak 2 -> 10*log10(4/mse)
  (eval_utils.py:24-31).
- ms_ssim_3d: MS-SSIM with win_size=7 over 3 spatial dims on (x+1)/2 data
  (eval_utils.py:33-39 uses pytorch_msssim.MS_SSIM); implemented here from
  the Wang et al. formulation exactly as pytorch_msssim does: gaussian
  window (sigma=1.5) applied separably, 5 scales with weights
  [0.0448, 0.2856, 0.3001, 0.2363, 0.1333], avg-pool-2 between scales
  (odd trailing dims padded), relu'd cs/ssim, product with weight exponents.
- fid_3d / frechet_distance: Fréchet distance between Gaussian fits of
  pooled MedicalNet features; covariance sqrt on host via scipy
  (eval_utils.py:41-52).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def mmd(real: jax.Array, fake: jax.Array) -> jax.Array:
    """Linear-kernel MMD, reference estimator (eval_utils.py:11-21)."""
    b = real.shape[0]
    y = real.reshape(b, -1).astype(jnp.float32)
    x = fake.reshape(b, -1).astype(jnp.float32)
    beta = 1.0 / (b * b)
    gamma = 2.0 / (b * b)
    xx = jnp.sum(x @ x.T)
    yy = jnp.sum(y @ y.T)
    zz = jnp.sum(x @ y.T)
    return beta * (xx + yy) - gamma * zz


def psnr(real: jax.Array, fake: jax.Array) -> float:
    """PSNR on [-1, 1] volumes (eval_utils.py:24-31; peak^2 = 4)."""
    mse = float(jnp.mean(jnp.square((real + 1) - (fake + 1))))
    if mse == 0:
        return 100.0
    return float(10.0 * np.log10(4.0 / mse))


# ---------------------------------------------------------------------------
# MS-SSIM (3D)
# ---------------------------------------------------------------------------
def _gaussian_window(win_size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(win_size, dtype=jnp.float32) - (win_size - 1) / 2.0
    g = jnp.exp(-jnp.square(coords) / (2 * sigma * sigma))
    return g / jnp.sum(g)


def _filter3d_separable(x: jax.Array, win: jnp.ndarray) -> jax.Array:
    """Valid-mode separable gaussian filtering over D, H, W of [N,D,H,W,C]."""
    c = x.shape[-1]
    k = win.shape[0]
    for axis in range(3):
        kshape = [1, 1, 1]
        kshape[axis] = k
        kern = win.reshape(kshape + [1, 1])           # [kd,kh,kw,1,1]
        kern = jnp.tile(kern, (1, 1, 1, 1, c))        # depthwise over C
        x = jax.lax.conv_general_dilated(
            x, kern.astype(x.dtype), (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c)
    return x


def _ssim_3d(x: jax.Array, y: jax.Array, win: jnp.ndarray,
             data_range: float = 1.0) -> Tuple[jax.Array, jax.Array]:
    """Per-batch mean (ssim, cs) with a separable gaussian window."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    f = partial(_filter3d_separable, win=win)
    mu_x, mu_y = f(x), f(y)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = f(x * x) - mu_xx
    sigma_y = f(y * y) - mu_yy
    sigma_xy = f(x * y) - mu_xy
    cs_map = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    axes = tuple(range(1, x.ndim))
    return jnp.mean(ssim_map, axis=axes), jnp.mean(cs_map, axis=axes)


def _avg_pool2_pad(x: jax.Array) -> jax.Array:
    pads = [(0, 0)] + [(0, s % 2) for s in x.shape[1:4]] + [(0, 0)]
    x = jnp.pad(x, pads)
    n, d, h, w, c = x.shape
    return x.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4, 6))


def ms_ssim_3d(real: jax.Array, fake: jax.Array, win_size: int = 7,
               sigma: float = 1.5, data_range: float = 1.0,
               weights: Sequence[float] = MSSSIM_WEIGHTS,
               rescale_from_minus1: bool = True) -> float:
    """MS-SSIM over 3 spatial dims. With rescale_from_minus1 (the
    reference's (x+1)/2 preprocessing, eval_utils.py:35-36) inputs in
    [-1, 1] map to [0, 1] with data_range 1."""
    x = jnp.asarray(real, jnp.float32)
    y = jnp.asarray(fake, jnp.float32)
    if x.ndim == 4:
        x, y = x[..., None], y[..., None]
    if rescale_from_minus1:
        x, y = (x + 1) / 2, (y + 1) / 2
    # Auto-reduce scales for small volumes (pytorch_msssim asserts
    # size > (win-1)*2^(scales-1)).
    min_side = min(x.shape[1:4])
    levels = len(weights)
    while levels > 1 and (win_size - 1) * (2 ** (levels - 1)) >= min_side:
        levels -= 1
    w = jnp.asarray(weights[:levels], jnp.float32)
    w = w / jnp.sum(w) if levels < len(weights) else w

    win = _gaussian_window(win_size, sigma)
    mcs = []
    for i in range(levels):
        ssim_val, cs = _ssim_3d(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x, y = _avg_pool2_pad(x), _avg_pool2_pad(y)
    ssim_val = jax.nn.relu(ssim_val)
    terms = mcs + [ssim_val]
    out = jnp.prod(jnp.stack([t ** wi for t, wi in zip(terms, w)], 0), axis=0)
    return float(jnp.mean(out))


# ---------------------------------------------------------------------------
# Fréchet distance / 3D-FID
# ---------------------------------------------------------------------------
def frechet_distance(act1: np.ndarray, act2: np.ndarray) -> float:
    """Classic Fréchet distance between Gaussian feature fits; covariance
    sqrt via scipy on host (eval_utils.py:45-51)."""
    from scipy.linalg import sqrtm

    act1 = np.asarray(act1, np.float64)
    act2 = np.asarray(act2, np.float64)
    mu1, sigma1 = act1.mean(axis=0), np.cov(act1, rowvar=False)
    mu2, sigma2 = act2.mean(axis=0), np.cov(act2, rowvar=False)
    ssdiff = np.sum((mu1 - mu2) ** 2.0)
    covmean = sqrtm(sigma1.dot(sigma2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(ssdiff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def fid_3d(feature_fn: Callable[[jax.Array], jax.Array],
           real: jax.Array, fake: jax.Array) -> float:
    """3D-FID with pooled MedicalNet features (eval_utils.py:41-52)."""
    act1 = np.asarray(feature_fn(real))
    act2 = np.asarray(feature_fn(fake))
    return frechet_distance(act1, act2)
