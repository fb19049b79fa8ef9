"""Sub-pixel (space-to-depth / depth-to-space) rewrites for the DCGAN
family's k=4 stride-2 boundary convolutions.

The round-3 DCGAN 64^3 step trace (docs/PERF.md) puts ~15 ms of the
48 ms step in the single-channel boundary ops at 1.5-3.9 TF/s: the G's
final ConvTranspose3d (filters -> 1 channel, reference dcgan.py:66-69)
and the D's first Conv3d (1 channel -> filters, dcgan.py:160-163), plus
their autodiff transposes. With C=1 on one side, XLA picks the
batch-minor T(2,128) layout and the MXU runs ~1% occupied — the same
pathology class fast_c1 closed for StyleGAN2's k=3 convs, here at
k=4/s=2 where the banded-matmul trick would inflate FLOPs by the wide
channel count instead. The right move is parity decomposition:

- D stem (Ci=1, k=4, s=2, p=1): left-pad each spatial axis by 1, then
  space-to-depth by 2. The k=4 window of output o covers padded input
  [2o .. 2o+3] = exactly blocks {o, o+1}, so the op becomes ONE k=2
  VALID conv over the block grid with 8*Ci input channels — zero FLOP
  inflation, contraction depth 8x.
- G head (Co small, k=4, s=2, p=1 tconv): output position m = 2b + r
  (parity r per axis) receives x[i]*w[k] with k = m - 2i + 1, so per
  (r, window elem e): k = 3 - r - 2e. One k=2 VALID conv over the
  1-padded input produces all 8 parity classes as channels
  ([2,2,2, Ci, 8*Co] kernel gathered from the tconv weight), and the
  classes interleave back by slice + stack + reshape (~1.1x FLOPs from
  the one-larger conv grid).

Both are exact reorderings of the same multiplies; autodiff through the
pad/reshape/slice wrappers yields dx/dW as convs over the same healthy
block grids, so the backward escapes the degenerate layout for free.

Go/no-go: parity-gated (tests/test_subpixel_conv.py), measured by
step-level bench.py A/B only (the 4-for-4 method lesson, docs/PERF.md
session 8).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NDHWC", "DHWIO", "NDHWC")

_MODE = os.environ.get("GAN3D_FAST_PIX", "auto")
_WIDE_MODE = os.environ.get("GAN3D_FAST_PIX_WIDE", "auto")


def set_fast_pix_mode(mode: str) -> None:
    global _MODE
    assert mode in ("off", "auto", "on"), mode
    _MODE = mode


def set_fast_pix_wide_mode(mode: str) -> None:
    global _WIDE_MODE
    assert mode in ("off", "auto", "on"), mode
    _WIDE_MODE = mode


def fast_pix_enabled() -> bool:
    if _MODE == "auto":
        # Measured GO (docs/PERF.md round 3 session 4): DCGAN 64^3
        # batch 16 on v5e = 408.6 vol/s vs 324.4 control (1.26x
        # step-level bench.py A/B). CPU (tests) keeps XLA's native conv.
        return jax.default_backend() == "tpu"
    return _MODE == "on"


def fast_pix_wide_enabled() -> bool:
    """Extend the sub-pixel rewrite to the INTERIOR k=4 s=2 convs of the
    ladder (any Ci / Co), not just the C=1 boundaries: the s2d block form
    contracts 8*Ci (full MXU lanes at Ci >= 16) where the strided conv
    runs half-empty at C=64 (71.9 TF/s, round-3 session-5 dcgan trace).

    Measured step-level NO-GO (round-3 session-5): DCGAN 64^3 batch 16 on
    v5e = 246.2 vol/s vs 408.6 control (0.60x) — the s2d/d2s reshape
    traffic on wide activations and the lost strided-conv fusions swamp
    the lane-occupancy win. Kept opt-in as a recorded negative result
    (the 5th confirmation that isolated-op reasoning does not predict
    step outcomes; see docs/PERF.md)."""
    if _WIDE_MODE == "auto":
        return False  # measured LOSS at the step level (0.60x) — see above
    return _WIDE_MODE == "on"


def conv_eligible(x_shape, w_shape, stride, padding, dilation,
                  groups) -> bool:
    """k=4, s=2, p=1, even spatial dims; Ci=1 (the D stem) by default,
    any Ci with the wide mode."""
    kd, kh, kw, ci, co = w_shape
    return (groups == 1 and tuple(stride) == (2, 2, 2)
            and tuple(padding) == (1, 1, 1)
            and tuple(dilation) == (1, 1, 1)
            and kd == kh == kw == 4 and co >= 8
            and (ci == 1 or fast_pix_wide_enabled())
            and all(s % 2 == 0 and s >= 8 for s in x_shape[1:4]))


def tconv_eligible(x_shape, w_shape, stride, padding,
                   output_padding) -> bool:
    """k=4, s=2, p=1, op=0, wide Ci; Co<=2 (the G head) by default, any
    Co with the wide mode."""
    kd, kh, kw, ci, co = w_shape
    return (tuple(stride) == (2, 2, 2) and tuple(padding) == (1, 1, 1)
            and tuple(output_padding) == (0, 0, 0)
            and kd == kh == kw == 4 and ci >= 8
            and (co <= 2 or fast_pix_wide_enabled())
            and all(s >= 8 for s in x_shape[1:4]))


def conv_s2d_k4(x: jax.Array, w: jax.Array) -> jax.Array:
    """Ci=1 k=4 s=2 p=1 conv as one k=2 conv over the s2d block grid.

    x: [N, D, H, W, 1] (D,H,W even); w: [4, 4, 4, 1, Co].
    Matches conv3d(x, w, stride=2, padding=1) exactly.
    """
    n, d, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    bd, bh, bw = (d + 2) // 2, (h + 2) // 2, (wd + 2) // 2
    xb = xp.reshape(n, bd, 2, bh, 2, bw, 2, ci)
    xb = xb.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(n, bd, bh, bw, 8 * ci)
    # tap t = 2a + e -> block-offset a, block element e
    wk = w.reshape(2, 2, 2, 2, 2, 2, ci, co)          # [ad,ed,ah,eh,aw,ew,..]
    wk = wk.transpose(0, 2, 4, 1, 3, 5, 6, 7).reshape(2, 2, 2, 8 * ci, co)
    return lax.conv_general_dilated(
        xb, wk.astype(x.dtype), window_strides=(1, 1, 1),
        padding=[(0, 0)] * 3, dimension_numbers=_DN,
        preferred_element_type=x.dtype)


def _tconv_tap_index() -> np.ndarray:
    """k[r, e] = 3 - r - 2e: the tconv tap feeding output parity r from
    window element e of the 1-padded input."""
    return np.array([[3 - r - 2 * e for e in (0, 1)] for r in (0, 1)])


def _gather_tconv_kernel(w: jax.Array) -> jax.Array:
    """[4,4,4,Ci,Co] tconv weight -> [2,2,2,Ci,8*Co] parity-class kernel
    (class channel order (r_d, r_h, r_w, co), window element order e)."""
    idx = _tconv_tap_index()                           # [r, e]
    # take along each spatial axis: wk[e_d,e_h,e_w, ci, r_d,r_h,r_w, co]
    wk = w[idx]                                        # [rd, ed, 4, 4, ci, co]
    wk = wk[:, :, idx]                                 # [rd, ed, rh, eh, 4, ..]
    wk = wk[:, :, :, :, idx]                           # [rd,ed,rh,eh,rw,ew,..]
    wk = wk.transpose(1, 3, 5, 6, 0, 2, 4, 7)          # [ed,eh,ew,ci,rd,rh,rw,co]
    k2, ci, co = 2, w.shape[3], w.shape[4]
    return wk.reshape(k2, k2, k2, ci, 8 * co)


def tconv_d2s(x: jax.Array, w: jax.Array) -> jax.Array:
    """See :func:`tconv_d2s_k4` docstring (the implementation)."""
    n, d, h, wd, ci = x.shape
    co = w.shape[-1]
    wk = _gather_tconv_kernel(w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    yb = lax.conv_general_dilated(
        xp, wk.astype(x.dtype), window_strides=(1, 1, 1),
        padding=[(0, 0)] * 3, dimension_numbers=_DN,
        preferred_element_type=x.dtype)                # [n, d+1, h+1, w+1, 8co]
    yb = yb.reshape(n, d + 1, h + 1, wd + 1, 2, 2, 2, co)
    # class (rd, rh, rw) at block b reads grid position b + r
    parts = [
        lax.slice(yb, (0, rd, rh, rw, rd, rh, rw, 0),
                  (n, rd + d, rh + h, rw + wd, rd + 1, rh + 1, rw + 1, co))
        for rd in (0, 1) for rh in (0, 1) for rw in (0, 1)
    ]
    y = jnp.stack([p.reshape(n, d, h, wd, co) for p in parts], axis=0)
    y = y.reshape(2, 2, 2, n, d, h, wd, co)
    y = y.transpose(3, 4, 0, 5, 1, 6, 2, 7)            # n, d,rd, h,rh, w,rw, co
    return y.reshape(n, 2 * d, 2 * h, 2 * wd, co)
