"""Explicit-conv backward for stride-1 k=3 convs (conv_dx).

The StyleGAN-1 64^3 step trace (round 5, docs/PERF.md) pins ~8% of device
time on a [1,32,4194304] dynamic-update-slice while-loop plus its
4 GB/s while wrapper — XLA's autodiff lowering of the C8 (64ch -> 32ch)
conv's backward reorganizing the cotangent into a feature-major buffer
32 rows at a time. Both halves of that backward have clean closed forms
XLA schedules well when handed to it directly as convolutions:

    dx = conv(g, flip(w) with I/O swapped), padding k-1-p   (stride-1)
    dW = conv(x, g) with batch as the contraction:
         lhs x  viewed [Ci(batch), D, H, W, N(feature)]   spec "CDHWN"
         rhs g  viewed [N(in), Do, Ho, Wo, Co(out)]       spec "IDHWO"
         out    [Ci(batch), kd, kh, kw, Co(feature)]      spec "NDHWC"
         (the canonical dW-as-conv construction; stride 1, padding p)

First-order only (jax.custom_vjp, like ops/tap_conv.py) — so it is wired
ONLY into generator call sites (nn.Conv3d dx_vjp=True), never the
discriminator, whose R1 regularization needs grad-of-grad through its
convs. Parity-gated (tests/test_dx_conv.py); go/no-go by step-level
bench.py A/B only.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_MODE = "auto"


def set_conv_dx_mode(mode: str) -> None:
    global _MODE
    assert mode in ("off", "auto", "on"), mode
    _MODE = mode


def conv_dx_enabled() -> bool:
    if _MODE == "auto":
        # Measured step-level NO-GO, replicated (round 5, bench.py
        # --family=stylegan batch 32 on v5e): 64.066/64.058 vol/s forced
        # on vs 64.071/64.070 control (-0.02%) — with the path PROVEN
        # firing (4 custom_vjp_calls in the grad jaxpr; the session-9
        # "exactly no-change" check). XLA's autodiff lowers this conv's
        # backward to the same machine program as the explicit forms: the
        # [1,32,4194304] DUS-while is the dW conv's cotangent-as-kernel
        # operand preparation, which both formulations pay. Chapter
        # closed as equivalent-by-measurement.
        return False
    return _MODE == "on"


def eligible(x_shape, w_shape, s, p, d, groups: int) -> bool:
    """Stride-1, dilation-1, ungrouped k=3^3 convs with wide-enough
    channels (the degenerate-channel shapes route through their own
    measured lowerings; C=1 heads through tap_conv)."""
    kd, kh, kw, ci, co = w_shape
    return (groups == 1 and kd == kh == kw == 3
            and s == (1, 1, 1) and d == (1, 1, 1)
            and min(ci, co) >= 16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_dx(x: jax.Array, w: jax.Array,
              pads: Tuple[int, int, int]) -> jax.Array:
    """Plain stride-1 correlation [N,D,H,W,Ci] x [3,3,3,Ci,Co] with
    symmetric padding ``pads`` and a custom first-order VJP."""
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=[(pads[0], pads[0]), (pads[1], pads[1]), (pads[2], pads[2])],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


def _fwd(x, w, pads):
    return conv3d_dx(x, w, pads), (x, w)


def _bwd(pads, res, g):
    x, w = res
    k = w.shape[0]
    f32 = jnp.float32
    # dx: correlate the cotangent with the flipped, I/O-swapped kernel.
    w_t = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx_pads = [(k - 1 - p, k - 1 - p) for p in pads]
    dx = lax.conv_general_dilated(
        g, w_t, window_strides=(1, 1, 1), padding=dx_pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=f32).astype(x.dtype)
    # dW: contract batch + spatial via the canonical dW-as-conv form;
    # its output is [Ci, kd, kh, kw, Co] — move Ci back to DHWIO.
    dw = lax.conv_general_dilated(
        x, g, window_strides=(1, 1, 1),
        padding=[(p, p) for p in pads],
        dimension_numbers=("CDHWN", "IDHWO", "NDHWC"),
        preferred_element_type=f32)
    dw = jnp.moveaxis(dw, 0, 3).astype(w.dtype)
    return dx, dw


conv3d_dx.defvjp(_fwd, _bwd)
