"""Fused avgpool(2) + 1x1 conv for the DBlockDeep downsample tail.

The reference D block (utils.py:108-117) downsamples with AvgPool3d(2) and
then applies 1x1 convs — conv4 (the bottleneck expand) on the main path and
conv_sc (the extra-channel shortcut) feeding a concat.  Both ops are
linear, so each pair collapses algebraically into ONE stride-2 k=2 conv
whose kernel is the 1x1 weight tiled over the 2^3 window and divided by 8:

    conv1x1(W)(avgpool2(x)) == conv_{k=2,s=2}(tile(W)/8)(x)

Measured on the v5e (scripts/bench_down_conv.py, docs/PERF.md): the fused
form wins 1.05-2.84x at every flagship pair shape — the avgpool's separate
reduce-window pass over a narrow-channel tensor costs far more than the 8x
extra MACs of the small conv.

For the shortcut, the avgpool output itself is ALSO the first half of the
concat (`cat([avgpool(x), conv_sc(avgpool(x))])`), so fusing conv_sc alone
would leave the pooling pass alive.  `avgpool_concat_conv3d` therefore
produces the ENTIRE concatenated shortcut in one conv, by stacking an
identity/8 block (the average itself) with the tiled conv_sc kernel along
the output-channel dim.  Gradients flow through the conv_sc weight only —
the identity block is constant — matching the composed formulation.

Numerics: identical modulo f32 summation order (w/8 is exact in binary
floating point; the fused conv sums 8*Cin products where the composed form
sums Cin products of 8-term averages).  Parity-tested in
tests/test_downsample_conv.py.

Backward pass (custom VJP): the step-HLO audit (scripts/dump_step_hlo.py)
showed XLA's autodiff of these convs — lhs_dilate=2 k=2 convs — carrying
~26% of the flagship step's nominal conv FLOPs.  But the fused kernel is
UNIFORM over its 2^3 window (tile(w)/8), so the exact cotangents collapse:

    dx = nearest_upsample_2x(dout @ (w/8)^T)      — all 8 output parities
         of the transposed conv read the same tap value, so one [M,Co]@
         [Co,Ci] GEMM + broadcast replaces the dilated conv (64x fewer
         nominal MACs, 8x fewer than the best parity decomposition);
    dw = avgpool2(x)^T @ dout                      — one [Ci,M]@[M,Co] GEMM.

For the concat variant the identity block contributes dout[..., :Ci]/8
directly into the pre-broadcast dx.  Gradient parity vs autodiff of the
composed form is tested to ~1e-6 (f32) in tests/test_downsample_conv.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NDHWC", "DHWIO", "NDHWC")

# Global mode, read at TRACE time by nn.blocks.DBlockDeep:
#   "off"  — compose avg_pool3d + 1x1 conv (reference formulation)
#   "on"   — single k=2/s=2 conv (+ fused concat shortcut)
#   "auto" — measured end-to-end winner per backend (docs/PERF.md)
_MODE = os.environ.get("GAN3D_FAST_DOWNCONV", "auto")


def set_fast_downconv_mode(mode: str) -> None:
    global _MODE
    assert mode in ("off", "auto", "on"), mode
    _MODE = mode


def fast_downconv_enabled() -> bool:
    """auto -> on for TPU (measured 1.05-2.84x per pair, step-level win in
    docs/PERF.md); off elsewhere."""
    if _MODE == "auto":
        return jax.default_backend() == "tpu"
    return _MODE == "on"


def _avgpool2(x: jax.Array) -> jax.Array:
    """Exact 2x average pool via reshape (sum then a power-of-two scale)."""
    n, d, h, wd, c = x.shape
    xr = x.reshape(n, d // 2, 2, h // 2, 2, wd // 2, 2, c)
    return xr.sum(axis=(2, 4, 6)) / 8


def _upsample2(g: jax.Array) -> jax.Array:
    """Nearest 2x upsample (the adjoint of a uniform 2^3 window read)."""
    n, d, h, wd, c = g.shape
    g = jnp.broadcast_to(g[:, :, None, :, None, :, None, :],
                         (n, d, 2, h, 2, wd, 2, c))
    return g.reshape(n, 2 * d, 2 * h, 2 * wd, c)


# The collapsed backward is exact but sits behind a custom_vjp boundary,
# which stops XLA from fusing the cotangent math with neighboring ops —
# the same isolated-win/step-loss hazard lane packing hit.  The knob lets
# the step-level A/B (bench.py --downconv_vjp) decide; read at TRACE time.
_VJP_MODE = os.environ.get("GAN3D_DOWNCONV_VJP", "auto")


def set_downconv_vjp_mode(mode: str) -> None:
    global _VJP_MODE
    assert mode in ("custom", "autodiff", "auto"), mode
    _VJP_MODE = mode


def downconv_vjp_custom() -> bool:
    if _VJP_MODE == "auto":
        # Measured step-level A/B (docs/PERF.md): the collapsed VJP LOSES
        # at 64^3 (19.14 vs 20.10 vol/s — the custom_vjp fusion boundary
        # costs more than the saved FLOPs) but WINS at 128^3 split mode
        # (0.962 vs 0.874 — recompute-dominated, fusion matters less).
        # The Trainer resolves "auto" by cfg.resolution before tracing
        # (trainer.py); bare-module auto defaults to the flagship winner.
        return False
    return _VJP_MODE == "custom"


def _avgpool_conv3d_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    ci, co = w.shape[3], w.shape[4]
    w2 = jnp.broadcast_to(w[0, 0, 0] / 8, (2, 2, 2, ci, co))
    return lax.conv_general_dilated(x, w2, (2, 2, 2), [(0, 0)] * 3,
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


_avgpool_conv3d_cv = jax.custom_vjp(_avgpool_conv3d_impl)


def _ap_fwd(x, w):
    return _avgpool_conv3d_impl(x, w), (x, w)


def _ap_bwd(res, g):
    x, w = res
    ci, co = w.shape[3], w.shape[4]
    n, d, h, wd, _ = g.shape
    gm = g.reshape(-1, co)
    # dx: one GEMM against w/8, then broadcast to the 2^3 window (uniform
    # kernel => all parities of the transposed conv are equal).
    dxl = lax.dot_general(gm, w[0, 0, 0] / 8, (((1,), (1,)), ((), ())),
                          preferred_element_type=g.dtype)
    dx = _upsample2(dxl.reshape(n, d, h, wd, ci))
    # dw: pooled input against the cotangent, f32 accumulation.
    xp = _avgpool2(x).reshape(-1, ci)
    dw0 = lax.dot_general(xp, gm, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    return dx.astype(x.dtype), dw0[None, None, None].astype(w.dtype)


_avgpool_conv3d_cv.defvjp(_ap_fwd, _ap_bwd)


def avgpool_conv3d(x: jax.Array, w: jax.Array) -> jax.Array:
    """avg_pool3d(x, 2) then 1x1 conv, fused as one k=2/s=2 conv.

    x: [N, D, H, W, Cin]; w: [1, 1, 1, Cin, Cout] (torch Conv3d semantics).
    Returns [N, D/2, H/2, W/2, Cout].  Backward is the collapsed custom VJP
    or plain autodiff per ``downconv_vjp_custom()``.
    """
    if downconv_vjp_custom():
        return _avgpool_conv3d_cv(x, w)
    return _avgpool_conv3d_impl(x, w)


def _avgpool_concat_conv3d_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    ci, extra = w.shape[3], w.shape[4]
    eye = jnp.eye(ci, dtype=x.dtype) / 8
    ident = jnp.broadcast_to(eye, (2, 2, 2, ci, ci))
    tiled = jnp.broadcast_to(w[0, 0, 0].astype(x.dtype) / 8,
                             (2, 2, 2, ci, extra))
    w2 = jnp.concatenate([ident, tiled], axis=-1)
    return lax.conv_general_dilated(x, w2, (2, 2, 2), [(0, 0)] * 3,
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


_avgpool_concat_conv3d_cv = jax.custom_vjp(_avgpool_concat_conv3d_impl)


def _apc_fwd(x, w):
    return _avgpool_concat_conv3d_impl(x, w), (x, w)


def _apc_bwd(res, g):
    x, w = res
    ci, extra = w.shape[3], w.shape[4]
    n, d, h, wd, _ = g.shape
    gpool, gconv = g[..., :ci], g[..., ci:]
    gm = gconv.reshape(-1, extra)
    # dx: identity block routes gpool/8 into every window slot; the conv
    # block adds gconv @ (w/8)^T — combined before the single broadcast.
    dxl = lax.dot_general(gm, w[0, 0, 0].astype(g.dtype) / 8,
                          (((1,), (1,)), ((), ())),
                          preferred_element_type=g.dtype)
    dxl = dxl.reshape(n, d, h, wd, ci) + gpool / 8
    dx = _upsample2(dxl)
    xp = _avgpool2(x).reshape(-1, ci)
    dw0 = lax.dot_general(xp, gm, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    return dx.astype(x.dtype), dw0[None, None, None].astype(w.dtype)


_avgpool_concat_conv3d_cv.defvjp(_apc_fwd, _apc_bwd)


def avgpool_concat_conv3d(x: jax.Array, w: jax.Array) -> jax.Array:
    """`concat([avgpool2(x), conv1x1(w)(avgpool2(x))], -1)` as ONE conv.

    x: [N, D, H, W, Cin]; w: [1, 1, 1, Cin, Extra].
    Returns [N, D/2, H/2, W/2, Cin + Extra]: channels [:Cin] are the pooled
    input (identity/8 kernel block), channels [Cin:] the conv_sc output —
    the DBlockDeep shortcut (reference utils.py:108-117) in a single pass.
    Gradients flow through the conv_sc weight only — the identity block is
    constant — matching the composed formulation.
    """
    if downconv_vjp_custom():
        return _avgpool_concat_conv3d_cv(x, w)
    return _avgpool_concat_conv3d_impl(x, w)
