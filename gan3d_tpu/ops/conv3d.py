"""Core 3D convolution / pooling / resampling ops (NDHWC).

Semantics intentionally match torch's NCDHW ops (the reference's building
blocks — nn.Conv3d / nn.ConvTranspose3d / F.avg_pool3d / F.max_pool3d /
F.interpolate) so that model topologies transfer verbatim; layouts are
TPU-native channels-last and weights are DHWIO.

Weight layout conventions:
- conv3d:            w[kd, kh, kw, in/groups, out]
- conv_transpose3d:  w[kd, kh, kw, in, out]
  (torch stores ConvTranspose3d weights as [in, out, kd, kh, kw]; converters
  permute (2, 3, 4, 0, 1).)
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from gan3d_tpu.ops import (dw_conv, lane_conv, s2d_conv, subpixel_conv,
                           tap_conv, wide_conv)

IntOr3 = Union[int, Sequence[int]]

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _triple(v: IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    assert len(t) == 3
    return t  # type: ignore[return-value]


def conv3d(
    x: jax.Array,
    w: jax.Array,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
    dilation: IntOr3 = 1,
    groups: int = 1,
) -> jax.Array:
    """3D convolution, torch nn.Conv3d semantics (cross-correlation).

    x: [N, D, H, W, Cin]; w: [kd, kh, kw, Cin//groups, Cout].

    Narrow-channel k=3 stride-1 convs (the BigGAN-deep bottleneck hot path)
    are rewritten to the lane-packed formulation when enabled — see
    ops/lane_conv.py and docs/PERF.md.
    """
    s, p, d = _triple(stride), _triple(padding), _triple(dilation)
    if lane_conv.lane_conv_enabled():
        t = lane_conv.eligible(x.shape, w.shape, s, p, d, groups)
        if t is not None:
            if lane_conv.lane_conv_mode() == "bwd":
                return lane_conv.hybrid_conv3d(x, w, t)
            return lane_conv.lane_conv3d(x, w, t, lane_conv.lane_conv_variant())
    if (wide_conv.wide_conv_enabled()
            and wide_conv.eligible(x.shape, w.shape, s, p, d, groups)):
        return wide_conv.wide_conv3d(x, w)
    if (dw_conv.fast_dw_enabled()
            and dw_conv.eligible(x.shape, w.shape, s, p, d, groups)):
        return dw_conv.conv3d_k3_dw(x, w)
    if (s2d_conv.fast_stem_enabled()
            and s2d_conv.eligible(x.shape, w.shape, s, p, d, groups)):
        return s2d_conv.stem_conv3d_s2d(x, w)
    # head_conv3d_tap carries a jax.custom_vjp: first-order grads only —
    # no jvp, no grad-of-grad. Safe for every current loss (R1 is D-side,
    # sg2 PL differentiates k=1 modconv heads, never this dispatch), but a
    # future PL-style regularizer routed through a G tail head conv must
    # set fast_head="off" or it fails at trace time (ADVICE r3).
    if (tap_conv.fast_head_enabled()
            and tap_conv.eligible(x.shape, w.shape, s, p, d, groups)):
        return tap_conv.head_conv3d_tap(x, w)
    if (subpixel_conv.fast_pix_enabled()
            and subpixel_conv.conv_eligible(x.shape, w.shape, s, p, d,
                                            groups)):
        return subpixel_conv.conv_s2d_k4(x, w)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1]), (p[2], p[2])],
        rhs_dilation=d,
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )


def conv_transpose3d(
    x: jax.Array,
    w: jax.Array,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
    output_padding: IntOr3 = 0,
) -> jax.Array:
    """3D transposed convolution, torch nn.ConvTranspose3d semantics.

    Implemented as a fractionally-strided convolution: the input is
    lhs-dilated by `stride`, the kernel is spatially flipped, and each side
    is padded with (k - 1 - p). Output size = (in-1)*s - 2p + k + op,
    matching torch (reference DCGAN G uses k=4, s=2, p=1 stages —
    reference: dcgan.py:17-70).

    x: [N, D, H, W, Cin]; w: [kd, kh, kw, Cin, Cout].
    """
    s, p, op = _triple(stride), _triple(padding), _triple(output_padding)
    if (subpixel_conv.fast_pix_enabled()
            and subpixel_conv.tconv_eligible(x.shape, w.shape, s, p, op)):
        return subpixel_conv.tconv_d2s(x, w)
    k = w.shape[:3]
    wf = jnp.flip(w, axis=(0, 1, 2))
    pads = [
        (k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(3)
    ]
    return lax.conv_general_dilated(
        x,
        wf,
        window_strides=(1, 1, 1),
        padding=pads,
        lhs_dilation=s,
        dimension_numbers=_DN,
        preferred_element_type=x.dtype,
    )


def _pool_reshape(x: jax.Array, k: Tuple[int, int, int], reducer) -> jax.Array:
    """Window==stride pooling as reshape+reduce — differentiable and fusable."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d // k[0], k[0], h // k[1], k[1], w // k[2], k[2], c)
    return reducer(x, axis=(2, 4, 6))


def avg_pool3d(x: jax.Array, window: IntOr3 = 2, stride: IntOr3 = None) -> jax.Array:
    """torch F.avg_pool3d (count_include_pad irrelevant: no padding)."""
    k = _triple(window)
    s = _triple(stride) if stride is not None else k
    if k == s and all(x.shape[1 + i] % k[i] == 0 for i in range(3)):
        return _pool_reshape(x, k, jnp.mean)
    out = lax.reduce_window(
        x, jnp.zeros((), x.dtype), lax.add,
        (1, *k, 1), (1, *s, 1), "VALID",
    )
    return out / jnp.asarray(k[0] * k[1] * k[2], x.dtype)


def max_pool3d(x: jax.Array, window: IntOr3 = 2, stride: IntOr3 = None,
               padding: IntOr3 = 0) -> jax.Array:
    """torch F.max_pool3d with symmetric integer padding (-inf padded)."""
    k = _triple(window)
    s = _triple(stride) if stride is not None else k
    p = _triple(padding)
    if k == s and not any(p) and all(
            x.shape[1 + i] % k[i] == 0 for i in range(3)):
        return _pool_reshape(x, k, jnp.max)
    if any(p):
        neg = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                          else jnp.iinfo(x.dtype).min, x.dtype)
        x = jnp.pad(x, ((0, 0), (p[0], p[0]), (p[1], p[1]), (p[2], p[2]), (0, 0)),
                    constant_values=neg)
    return lax.reduce_window(
        x, jnp.asarray(-jnp.inf, x.dtype), lax.max,
        (1, *k, 1), (1, *s, 1), "VALID",
    )


def global_sum_pool(x: jax.Array) -> jax.Array:
    """Sum over D, H, W → [N, C] (reference: biggan.py:118 torch.sum [2,3,4])."""
    return jnp.sum(x, axis=(1, 2, 3))


def upsample_nearest3d(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor 2x/4x upsample (torch F.interpolate default mode).

    Pure reshape+broadcast — no gather, fuses into the following conv.
    """
    n, d, h, w, c = x.shape
    x = x[:, :, None, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, d, scale, h, scale, w, scale, c))
    return x.reshape(n, d * scale, h * scale, w * scale, c)


_TRI_MODE = os.environ.get("GAN3D_FAST_TRI", "auto")


def set_fast_tri_mode(mode: str) -> None:
    global _TRI_MODE
    assert mode in ("off", "auto", "on"), mode
    _TRI_MODE = mode


def fast_tri_enabled() -> bool:
    if _TRI_MODE == "auto":
        # Measured step-level GO, replicated twice on each side (round-3
        # session-5): StyleGAN-1 64^3 batch 16 on v5e = 62.07/62.07 vol/s
        # vs 61.43/61.45 control (+1.0%; resize's dot_general lowering
        # pays ~3 layout copies/step the band einsums avoid).
        return True
    return _TRI_MODE == "on"


@functools.lru_cache(maxsize=None)
def _tri1d_matrix(length: int, scale: int) -> "np.ndarray":
    """Dense [length*scale, length] half-pixel linear-interp matrix,
    torch align_corners=False semantics (edge taps clamp-accumulate)."""
    import numpy as np
    out = length * scale
    b = np.zeros((out, length), np.float64)
    for o in range(out):
        coord = (o + 0.5) / scale - 0.5
        i0 = int(np.floor(coord))
        frac = coord - i0
        b[o, min(max(i0, 0), length - 1)] += 1.0 - frac
        b[o, min(max(i0 + 1, 0), length - 1)] += frac
    return b


def upsample_trilinear3d(x: jax.Array, scale: int = 2) -> jax.Array:
    """Trilinear upsample, torch F.interpolate(mode='trilinear',
    align_corners=False) semantics (half-pixel centers), used by the
    StyleGAN-1 generator (reference: stylegan.py:1081 etc.).

    Fast path: the separable interp as three banded spatial-axis matmuls
    (same machinery as fast_fir, resample.py:_upfirdn3d_matmul) — exact
    same taps as jax.image.resize's per-axis contraction, but in einsum
    form whose TPU lowering avoids resize's layout copies."""
    n, d, h, w, c = x.shape
    if fast_tri_enabled():
        dt = x.dtype
        f32 = jnp.float32
        bd = jnp.asarray(_tri1d_matrix(d, scale), dt)
        bh = jnp.asarray(_tri1d_matrix(h, scale), dt)
        bw = jnp.asarray(_tri1d_matrix(w, scale), dt)
        y = jnp.einsum("od,ndhwc->nohwc", bd, x,
                       preferred_element_type=f32).astype(dt)
        y = jnp.einsum("oh,ndhwc->ndowc", bh, y,
                       preferred_element_type=f32).astype(dt)
        y = jnp.einsum("ow,ndhwc->ndhoc", bw, y,
                       preferred_element_type=f32).astype(dt)
        return y
    return jax.image.resize(
        x, (n, d * scale, h * scale, w * scale, c), method="trilinear"
    )
