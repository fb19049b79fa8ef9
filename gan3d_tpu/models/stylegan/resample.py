"""3D FIR resampling: upfirdn3d and conv3d_resample (NDHWC).

Reference: stylegan.py:126-294. The reference's `_upfirdn3d_ref` materializes
a zero-interleaved upsampled tensor, pads, runs a depthwise conv with the
full separable-outer-product filter, then stride-slices to downsample. On
TPU all four phases collapse into ONE `lax.conv_general_dilated`:

    upfirdn(x, f, up, down, pad)
      = depthwise_conv(x; lhs_dilation=up, window_strides=down, padding=pad)

so the zero-stuffed intermediate never exists in HBM. XLA supports negative
padding, which covers the reference's pad-or-crop semantics. Numerical
parity with the reference formulation is exact (same taps, same order).

Filter setup matches Conv3dLayer (stylegan.py:462-465): the 1D [1,3,3,1]
filter is outer-product expanded to 4x4x4 and normalized to sum 1. NB the
reference builds the 3D filter via `repeat((1,4,1)).reshape(4,4,4)` of the
2D outer product — which TILES the 2D filter along depth rather than taking
a true 3D outer product; `setup_filter` reproduces exactly that.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

IntOr3 = Union[int, Sequence[int]]

# --- fast_fir: separable spatial-matmul lowering ------------------------
#
# The session-8 StyleGAN2 step trace (docs/PERF.md) shows ~80% of the step
# in these depthwise FIR convs at 0.1 TF/s / 2-4 GB/s: the skip
# architecture's 1-channel image pyramid forces XLA's degenerate C=1
# batch-minor layout (16x padded) on every upfirdn. The reference filter
# is rank-1 across axes (setup_filter's tile quirk gives
# f3[i,j,k] = f[i] * f[k] / (4 * sum(f)^2)), so the 3-D FIR factors into
# THREE 1-D resamples — each expressible as one dense banded matmul along
# a spatial axis, where the GEMM dims are spatial lengths and the C=1
# layout problem never arises. Exact same taps; order of accumulation
# differs (one rounding per axis pass instead of one total).
_FIR_MODE = os.environ.get("GAN3D_FAST_FIR", "auto")


def set_fast_fir_mode(mode: str) -> None:
    global _FIR_MODE
    assert mode in ("off", "auto", "on"), mode
    _FIR_MODE = mode


def fast_fir_enabled() -> bool:
    if _FIR_MODE == "auto":
        # Measured step-level GO (docs/PERF.md session 9): StyleGAN2 64^3
        # batch 16 on v5e = 147.0 vol/s vs 63.9 control (2.30x). The win is
        # the C=1 skip-pyramid upfirdns escaping XLA's batch-minor T(2,128)
        # layout; the per-call c<=64 gate below keeps wide-channel FIRs on
        # the already-lane-efficient depthwise conv.
        return True
    return _FIR_MODE == "on"


def _separate_filter(f3: np.ndarray):
    """Rank-1 factorization f3[i,j,k] = a[i] b[j] c[k], or None."""
    if f3.ndim != 3:
        return None
    i0, j0, k0 = np.unravel_index(np.argmax(np.abs(f3)), f3.shape)
    s = f3[i0, j0, k0]
    if s == 0:
        return None
    a = f3[:, j0, k0].astype(np.float64)
    b = (f3[i0, :, k0] / s).astype(np.float64)
    c = (f3[i0, j0, :] / s).astype(np.float64)
    rec = a[:, None, None] * b[None, :, None] * c[None, None, :]
    if not np.allclose(rec, f3, rtol=1e-6, atol=1e-8 * abs(float(s))):
        return None
    return a, b, c


def _fir1d_matrix(kern: np.ndarray, length: int, up: int, down: int,
                  p0: int, p1: int) -> Optional[np.ndarray]:
    """Dense matrix B with y = B @ x equal to the 1-D slice of upfirdn's
    conv: x dilated by ``up``, padded (p0, p1 + up - 1), correlated with
    ``kern``, stride ``down``. B[o, i] = kern[p0 + i*up - o*down]."""
    kl = len(kern)
    l_out = (length * up + p0 + p1 - kl) // down + 1
    if l_out <= 0:
        return None
    b = np.zeros((l_out, length), np.float64)
    for o in range(l_out):
        # valid kernel taps: 0 <= p0 + i*up - o*down < kl
        for i in range(length):
            k = p0 + i * up - o * down
            if 0 <= k < kl:
                b[o, i] = kern[k]
    return b


def _upfirdn3d_matmul(x: jax.Array, fnp: np.ndarray, up3, down3, pads,
                      flip_filter: bool, gain: float) -> Optional[jax.Array]:
    """Separable upfirdn as three spatial-axis matmuls; None if ineligible."""
    fac = _separate_filter(fnp)
    if fac is None:
        return None
    upx, upy, upz = up3
    downx, downy, downz = down3
    px0, px1, py0, py1, pz0, pz1 = pads
    fd, fh, fw = fac
    fd = fd * float(gain)  # gain multiplies the 3-D filter once
    if not flip_filter:  # conv kernel is the flipped filter (correlation)
        fd, fh, fw = fd[::-1], fh[::-1], fw[::-1]
    n, d, h, w, c = x.shape
    bd = _fir1d_matrix(fd, d, upz, downz, pz0, pz1)
    bh = _fir1d_matrix(fh, h, upy, downy, py0, py1)
    bw = _fir1d_matrix(fw, w, upx, downx, px0, px1)
    if bd is None or bh is None or bw is None:
        return None
    dt = x.dtype
    bd, bh, bw = (jnp.asarray(m, dt) for m in (bd, bh, bw))
    f32 = jnp.float32
    if c == 1:
        y = x[..., 0]
        y = jnp.einsum("od,ndhw->nohw", bd, y,
                       preferred_element_type=f32).astype(dt)
        y = jnp.einsum("oh,ndhw->ndow", bh, y,
                       preferred_element_type=f32).astype(dt)
        y = jnp.einsum("ow,ndhw->ndho", bw, y,
                       preferred_element_type=f32).astype(dt)
        return y[..., None]
    y = jnp.einsum("od,ndhwc->nohwc", bd, x,
                   preferred_element_type=f32).astype(dt)
    y = jnp.einsum("oh,ndhwc->ndowc", bh, y,
                   preferred_element_type=f32).astype(dt)
    y = jnp.einsum("ow,ndhwc->ndhoc", bw, y,
                   preferred_element_type=f32).astype(dt)
    return y
# ------------------------------------------------------------------------


def setup_filter_np(f1d=(1, 3, 3, 1)) -> np.ndarray:
    """Reference Conv3dLayer filter construction (stylegan.py:462-465),
    as numpy (used by the fast_fir static-taps path)."""
    f = np.asarray(f1d, np.float32)
    f2 = f[None, :] * f[:, None]                 # [4, 4]
    f3 = np.tile(f2, (1, len(f1d))).reshape(len(f1d), len(f1d), len(f1d))
    return f3 / f3.sum()


def setup_filter(f1d=(1, 3, 3, 1)) -> jnp.ndarray:
    """Reference Conv3dLayer filter construction (stylegan.py:462-465)."""
    return jnp.asarray(setup_filter_np(f1d))


def _parse3(v: IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    assert len(t) == 3
    return t  # type: ignore[return-value]


def _parse_padding(padding) -> Tuple[int, int, int, int, int, int]:
    if isinstance(padding, int):
        padding = [padding] * 3
    padding = list(padding)
    if len(padding) == 3:
        padding = [padding[0], padding[0], padding[1], padding[1],
                   padding[2], padding[2]]
    a0, a1, b0, b1, c0, c1 = padding
    return a0, a1, b0, b1, c0, c1


def upfirdn3d(x: jax.Array, f: Optional[jnp.ndarray], up: IntOr3 = 1,
              down: IntOr3 = 1, padding=0, flip_filter: bool = False,
              gain: float = 1.0,
              f1d: Optional[Sequence[float]] = None) -> jax.Array:
    """Fused upsample-pad-FIR-downsample on [N, D, H, W, C].

    Padding follows the reference's axis convention (x=W, y=H, z=D pairs).
    ``f1d``: the STATIC 1-D taps that built ``f`` via setup_filter. Inside
    a lifted flax transform (remat/vmap/cond) ``f`` is a tracer, so the
    fast_fir path cannot sniff its values; callers that know the taps pass
    them so the separable matmul lowering stays available under jit.
    """
    if f is None:
        f = jnp.ones((1, 1, 1), jnp.float32)
    upx, upy, upz = _parse3(up)
    downx, downy, downz = _parse3(down)
    px0, px1, py0, py1, pz0, pz1 = _parse_padding(padding)

    c = x.shape[-1]

    # Separable spatial-matmul lowering (fast_fir; see module header). The
    # narrow-channel gate keeps the depthwise conv where it is already
    # lane-efficient. Tap values come from the static f1d when provided
    # (f is a tracer under lifted flax transforms), else from a concrete f.
    if fast_fir_enabled() and f.ndim == 3 and c <= 64:
        if f1d is not None:
            fnp = setup_filter_np(tuple(f1d))
        else:
            try:
                fnp = np.asarray(f)
            except Exception:
                fnp = None
        if fnp is not None:
            y = _upfirdn3d_matmul(
                x, fnp * (gain ** (f.ndim / 3)),
                (upx, upy, upz), (downx, downy, downz),
                (px0, px1, py0, py1, pz0, pz1), flip_filter, 1.0)
            if y is not None:
                return y

    f = f * (gain ** (f.ndim / 3))
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    while f.ndim < 3:
        f = f[None]
    # Depthwise kernel [kd, kh, kw, 1, C]; XLA convolution is correlation,
    # and we already flipped above, matching the reference's true-conv path.
    kern = jnp.tile(f[:, :, :, None, None], (1, 1, 1, 1, c)).astype(x.dtype)
    # lhs_dilation produces (n-1)*up+1 samples; the reference's
    # zero-interleave produces n*up (trailing zeros), so fold the missing
    # up-1 trailing zeros into the high-side padding.
    return lax.conv_general_dilated(
        x, kern,
        window_strides=(downz, downy, downx),
        padding=[(pz0, pz1 + upz - 1), (py0, py1 + upy - 1),
                 (px0, px1 + upx - 1)],
        lhs_dilation=(upz, upy, upx),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=c,
        preferred_element_type=x.dtype,
    )


def _conv(x, w, stride=1, padding=0, groups=1, flip_weight=True):
    """Plain conv; flip_weight=True is correlation (torch conv semantics)."""
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1, 2))
    s = _parse3(stride)
    p = padding if isinstance(padding, list) else [(q, q) for q in _parse3(padding)]
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=s, padding=p,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups, preferred_element_type=x.dtype)


def conv3d_resample(x: jax.Array, w: jax.Array, f: Optional[jnp.ndarray] = None,
                    up: int = 1, down: int = 1, padding=0, groups: int = 1,
                    flip_weight: bool = True, flip_filter: bool = False,
                    f1d: Optional[Sequence[float]] = None) -> jax.Array:
    """Conv with optional FIR up/downsampling (reference stylegan.py:202-294).

    w: [kd, kh, kw, in/groups, out]. Single pre-padding, same case analysis
    and padding algebra as the reference; all paths lower to 1-2 fused XLA
    convolutions.
    """
    kd, kh, kw = w.shape[:3]
    if f is None:
        fw = fh = fd = 1
    else:
        fd, fh, fw = f.shape[2], f.shape[1], f.shape[0]
    px0, px1, py0, py1, pz0, pz1 = _parse_padding(padding)

    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
        pz0 += (fd + up - 1) // 2
        pz1 += (fd - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
        pz0 += (fd - down + 1) // 2
        pz1 += (fd - down) // 2

    # 1x1x1 kernel fast paths.
    if kw == kh == kd == 1 and down > 1 and up == 1:
        x = upfirdn3d(x, f, down=down, padding=[px0, px1, py0, py1, pz0, pz1],
                      flip_filter=flip_filter, f1d=f1d)
        return _conv(x, w, groups=groups, flip_weight=flip_weight)
    if kw == kh == kd == 1 and up > 1 and down == 1:
        x = _conv(x, w, groups=groups, flip_weight=flip_weight)
        return upfirdn3d(x, f, up=up, padding=[px0, px1, py0, py1, pz0, pz1],
                         gain=up ** 2, flip_filter=flip_filter, f1d=f1d)

    # Downsample-only: FIR then strided conv.
    if down > 1 and up == 1:
        x = upfirdn3d(x, f, padding=[px0, px1, py0, py1, pz0, pz1],
                      flip_filter=flip_filter, f1d=f1d)
        # fast_c1: the sg2 D's tiny-channel strided convs (and, via
        # autodiff of the band einsums, their lhs-dilated dx) lower to
        # banded matmuls (ops/c1_conv.py; round-3 session-3 trace).
        from gan3d_tpu.ops.c1_conv import (fast_c1_enabled, small_conv3d_ud,
                                           small_conv3d_ud_applicable)

        if fast_c1_enabled() and small_conv3d_ud_applicable(
                x.shape, w.shape, groups, 1, down):
            wk = w if flip_weight else jnp.flip(w, axis=(0, 1, 2))
            return small_conv3d_ud(x, wk.astype(x.dtype),
                                   ((0, 0), (0, 0), (0, 0)),
                                   (1, 1, 1), (down, down, down))
        return _conv(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # Upsample: fractionally-strided conv then FIR (reference
    # stylegan.py:262-282 builds this from torch conv_transpose3d; here it
    # is one lhs-dilated convolution with the same effective taps).
    if up > 1:
        assert groups == 1, "grouped up-conv only serves fused modconv, " \
                            "which the TPU path does not use"
        px0 -= kw - 1
        px1 -= kw - up
        py0 -= kh - 1
        py1 -= kh - up
        pz0 -= kd - 1
        pz1 -= kd - up
        pxt = max(min(-px0, -px1), 0)
        pyt = max(min(-py0, -py1), 0)
        pzt = max(min(-pz0, -pz1), 0)
        # Correlation when flip_weight (torch conv semantics), convolution
        # otherwise; conv_transpose's internal flip folds into this choice.
        wk = w if flip_weight else jnp.flip(w, axis=(0, 1, 2))
        # fast_c1: the sg2 G's tiny-channel up=2 convs ran at 0.5 TF/s /
        # 8 GB/s as XLA lhs-dilated convs — 28.8% of the post-fast_c1
        # step (round-3 session-3 trace); banded matmuls instead.
        from gan3d_tpu.ops.c1_conv import (fast_c1_enabled, small_conv3d_ud,
                                           small_conv3d_ud_applicable)

        pud = ((kd - 1 - pzt, kd - 1 - pzt), (kh - 1 - pyt, kh - 1 - pyt),
               (kw - 1 - pxt, kw - 1 - pxt))
        if (fast_c1_enabled() and min(min(p) for p in pud) >= 0
                and small_conv3d_ud_applicable(x.shape, w.shape, groups,
                                               up, 1)):
            x = small_conv3d_ud(x, wk.astype(x.dtype), pud,
                                (up, up, up), (1, 1, 1))
        else:
            x = lax.conv_general_dilated(
                x, wk.astype(x.dtype), window_strides=(1, 1, 1),
                padding=list(pud),
                lhs_dilation=(up, up, up),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=x.dtype)
        x = upfirdn3d(x, f, padding=[px0 + pxt, px1 + pxt, py0 + pyt,
                                     py1 + pyt, pz0 + pzt, pz1 + pzt],
                      gain=up ** 2, flip_filter=flip_filter, f1d=f1d)
        if down > 1:
            x = upfirdn3d(x, f, down=down, flip_filter=flip_filter, f1d=f1d)
        return x

    # Plain conv path.
    if up == 1 and down == 1:
        if min(px0, px1, py0, py1, pz0, pz1) >= 0:
            # fast_c1: tiny-channel k=3 stencils (the 1-2-channel blocks
            # of the sg2 top resolutions) lower to one banded-matmul
            # einsum on the MXU instead of a degenerate-layout XLA conv
            # (ops/c1_conv.py; round-3 trace: 68% of the sg2 64^3 step).
            from gan3d_tpu.ops.c1_conv import (fast_c1_enabled,
                                               small_conv3d,
                                               small_conv3d_applicable)

            if fast_c1_enabled() and small_conv3d_applicable(
                    x.shape, w.shape, groups):
                wk = w if flip_weight else jnp.flip(w, axis=(0, 1, 2))
                return small_conv3d(x, wk.astype(x.dtype),
                                    ((pz0, pz1), (py0, py1), (px0, px1)))
        if px0 == px1 and py0 == py1 and pz0 == pz1 \
                and px0 >= 0 and py0 >= 0 and pz0 >= 0:
            return _conv(x, w, padding=[(pz0, pz0), (py0, py0), (px0, px0)],
                         groups=groups, flip_weight=flip_weight)

    # Generic fallback.
    x = upfirdn3d(x, f if up > 1 else None, up=up,
                  padding=[px0, px1, py0, py1, pz0, pz1], gain=up ** 2,
                  flip_filter=flip_filter, f1d=f1d if up > 1 else None)
    x = _conv(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn3d(x, f, down=down, flip_filter=flip_filter, f1d=f1d)
    return x
