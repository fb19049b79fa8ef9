"""Lane-packed 3D convolution: widening narrow-channel k=3 convs for the MXU.

Why this exists (docs/PERF.md): the reference model's hot convs are the
BigGAN-deep bottleneck 3^3 convs with 16-64 channels (reference:
utils.py:101-106).  The TPU MXU is a 128x128 systolic array; a conv with
Cout=32 uses 32 of 128 output lanes and measures ~12.6 TFLOP/s on a v5e,
while the same conv at 128 channels measures ~132 TFLOP/s.  XLA's conv
already reaches ~84% of the narrow-N GEMM ceiling, so the fix is not a
better narrow kernel — it is a reformulation with wide N.

The trick: one-dimensional space-to-depth along W.  Pack T = 128 // Cout
adjacent W positions into the channel dimension, so the conv computes
T*Cout = 128 output lanes per position.  A k=3 conv along original W
becomes a small-window conv over W-tiles whose expanded weight matrix is
block-Toeplitz (mostly structural zeros).  The MXU does the zero FLOPs
dense, but at full lane utilization the trade wins:

- ``k3`` variant: conv window (3,3,3) over tiles, dense-FLOP ratio = T
  (reads 3 whole neighbor tiles along W per output tile).
- ``k2`` variant (default): the input tiling is SHIFTED one voxel left, so
  the T+2 input positions an output tile needs span exactly TWO input
  tiles; conv window (3,3,2), dense-FLOP ratio = 2T/3 (2.67x at T=4
  against a 4-10x lane-utilization win).

Everything is expressed in plain XLA ops (pad / reshape / einsum / conv),
so autodiff works and BOTH backward GEMMs (d/dx transposed conv and
d/dW2 -> dw contraction) also run at 128 lanes.

Numerics: identical math modulo summation order and exact-zero taps;
parity vs ``conv3d`` is tested to f32 tolerance in tests/test_lane_conv.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NDHWC", "DHWIO", "NDHWC")

# Global mode, read at TRACE time by ops.conv3d.conv3d:
#   "off"  — never rewrite
#   "auto" — the measured end-to-end winner. Currently OFF everywhere:
#            despite 23-45% isolated-conv wins, every real block variant of
#            the flagship model regresses with the rewrite (the pad/reshape
#            boundary breaks XLA's producer/consumer fusion), and the full
#            train step measures 13.8 vs 18.0 vol/s. docs/PERF.md has the
#            complete measurement chain (conv -> block -> step).
#   "on"   — lane-pack eligible convs fwd AND bwd (isolated-conv winner)
#   "bwd"  — plain conv forward, lane-packed dx in the backward (hybrid;
#            also loses at block level — mixing packed/plain layouts
#            between fwd and bwd composes worse than either pure mode)
# Set once at startup (gan3d_tpu.config wires cfg.fast_conv here); changing
# it does NOT invalidate already-traced jitted functions.
_MODE = os.environ.get("GAN3D_LANE_CONV", "auto")
_VARIANT = "k2"


def set_lane_conv_mode(mode: str, variant: str = "k2") -> None:
    global _MODE, _VARIANT
    assert mode in ("off", "auto", "on", "bwd"), mode
    assert variant in ("k2", "k3"), variant
    _MODE, _VARIANT = mode, variant


def lane_conv_mode() -> str:
    """Resolved mode: "off" | "on" | "bwd"."""
    if _MODE == "auto":
        return "off"
    return _MODE


def lane_conv_enabled() -> bool:
    return lane_conv_mode() != "off"


def lane_conv_variant() -> str:
    return _VARIANT


def pick_tile(c_out: int, width: int) -> Optional[int]:
    """Largest power-of-two T with T*c_out <= 128, T | width, T >= 2."""
    t = 1
    while 2 * t * c_out <= 128 and width % (2 * t) == 0 and 2 * t <= width:
        t *= 2
    return t if t >= 2 else None


def eligible(x_shape: Tuple[int, ...], w_shape: Tuple[int, ...],
             stride, padding, dilation, groups: int) -> Optional[int]:
    """Return the pack factor T if this conv can be lane-packed, else None."""
    if groups != 1:
        return None
    if tuple(w_shape[:3]) != (3, 3, 3):
        return None
    if tuple(stride) != (1, 1, 1) or tuple(dilation) != (1, 1, 1):
        return None
    if tuple(padding) != (1, 1, 1):
        return None
    c_out = w_shape[4]
    return pick_tile(c_out, x_shape[3])


@functools.lru_cache(maxsize=None)
def _onehot_k2(t: int) -> np.ndarray:
    """E[g, u, dw, t] = 1 iff input slot u of tile (m+g) supplies kernel tap
    dw for output sub-position t: tiles start at real position j*T - 1, so
    dw = g*T + u - t."""
    e = np.zeros((2, t, 3, t), np.float32)
    for g in range(2):
        for u in range(t):
            for tt in range(t):
                dw = g * t + u - tt
                if 0 <= dw <= 2:
                    e[g, u, dw, tt] = 1.0
    return e


@functools.lru_cache(maxsize=None)
def _onehot_k3(t: int) -> np.ndarray:
    """Aligned tiling (tiles start at j*T): dw = (g-1)*T + u - t + 1."""
    e = np.zeros((3, t, 3, t), np.float32)
    for g in range(3):
        for u in range(t):
            for tt in range(t):
                dw = (g - 1) * t + u - tt + 1
                if 0 <= dw <= 2:
                    e[g, u, dw, tt] = 1.0
    return e


def expand_weights(w: jax.Array, t: int, variant: str = "k2") -> jax.Array:
    """[3,3,3,Cin,Cout] -> [3,3,G, T*Cin, T*Cout] block-Toeplitz expansion."""
    onehot = _onehot_k2(t) if variant == "k2" else _onehot_k3(t)
    e = jnp.asarray(onehot, w.dtype)
    c_in, c_out = w.shape[3], w.shape[4]
    # [a,b,dw,i,o] x [g,u,dw,t] -> [a,b,g,u,i,t,o]
    w2 = jnp.einsum("abdio,gudt->abguito", w, e)
    g = e.shape[0]
    return w2.reshape(3, 3, g, t * c_in, t * c_out)


def lane_conv3d(x: jax.Array, w: jax.Array, t: int,
                variant: str = "k2") -> jax.Array:
    """k=3, stride=1, padding=1 conv via W-axis lane packing.

    x: [N, D, H, W, Cin]; w: [3, 3, 3, Cin, Cout]; W % t == 0.
    """
    n, d, h, wd, c_in = x.shape
    c_out = w.shape[4]
    w2 = expand_weights(w, t, variant)
    if variant == "k2":
        # Shifted tiling: pad W by (1, t-1); tile j covers [j*t-1, j*t+t-2].
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, t - 1), (0, 0)))
        xp = xp.reshape(n, d + 2, h + 2, wd // t + 1, t * c_in)
        pads = [(0, 0), (0, 0), (0, 0)]
    else:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        xp = xp.reshape(n, d + 2, h + 2, wd // t, t * c_in)
        pads = [(0, 0), (0, 0), (1, 1)]
    y = lax.conv_general_dilated(
        xp, w2,
        window_strides=(1, 1, 1),
        padding=pads,
        dimension_numbers=_DN,
        preferred_element_type=x.dtype,
    )
    return y.reshape(n, d, h, wd, c_out)


def _plain_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=_DN,
        preferred_element_type=x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hybrid_conv3d(x: jax.Array, w: jax.Array, t: int) -> jax.Array:
    """k=3 s=1 p=1 conv: plain XLA forward, lane-packed backward.

    Why: measured at block level (scripts/bench_block_conv.py), the
    lane-packed forward LOSES despite winning in isolation — the
    pad/reshape boundary stops XLA from fusing the preceding BN/ReLU into
    the conv.  The backward dx is a transposed conv with no such producer
    fusion to lose, and it is exactly as narrow as the forward — there the
    lane packing keeps its measured win.  dw uses the standard XLA
    batch<->feature-swap contraction (identical to autodiff's).
    """
    return _plain_conv(x, w)


def _hybrid_fwd(x, w, t):
    return _plain_conv(x, w), (x, w)


def _hybrid_bwd(t, res, g):
    x, w = res
    # dx: conv of g with spatially-flipped, in/out-transposed weights.
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    t_dx = pick_tile(w.shape[3], g.shape[3])
    if t_dx is not None:
        dx = lane_conv3d(g, w_flip, t_dx, _VARIANT)
    else:
        dx = _plain_conv(g, w_flip)
    # dw: batch<->feature swap trick.
    x_t = jnp.transpose(x, (4, 1, 2, 3, 0))   # [Cin, D, H, W, N]
    g_t = jnp.transpose(g, (1, 2, 3, 0, 4))   # [D, H, W, N, Cout]
    dw = lax.conv_general_dilated(
        x_t, g_t, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=_DN, preferred_element_type=w.dtype)
    dw = jnp.transpose(dw, (1, 2, 3, 0, 4)).astype(w.dtype)
    return dx.astype(x.dtype), dw


hybrid_conv3d.defvjp(_hybrid_fwd, _hybrid_bwd)
