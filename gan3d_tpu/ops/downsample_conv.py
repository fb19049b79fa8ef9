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


def avgpool_conv3d(x: jax.Array, w: jax.Array) -> jax.Array:
    """avg_pool3d(x, 2) then 1x1 conv, fused as one k=2/s=2 conv.

    x: [N, D, H, W, Cin]; w: [1, 1, 1, Cin, Cout] (torch Conv3d semantics).
    Returns [N, D/2, H/2, W/2, Cout].
    """
    ci, co = w.shape[3], w.shape[4]
    w2 = jnp.broadcast_to(w[0, 0, 0] / 8, (2, 2, 2, ci, co))
    return lax.conv_general_dilated(x, w2, (2, 2, 2), [(0, 0)] * 3,
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


def avgpool_concat_conv3d(x: jax.Array, w: jax.Array) -> jax.Array:
    """`concat([avgpool2(x), conv1x1(w)(avgpool2(x))], -1)` as ONE conv.

    x: [N, D, H, W, Cin]; w: [1, 1, 1, Cin, Extra].
    Returns [N, D/2, H/2, W/2, Cin + Extra]: channels [:Cin] are the pooled
    input (identity/8 kernel block), channels [Cin:] the conv_sc output —
    the DBlockDeep shortcut (reference utils.py:108-117) in a single pass.
    """
    ci, extra = w.shape[3], w.shape[4]
    eye = jnp.eye(ci, dtype=x.dtype) / 8
    ident = jnp.broadcast_to(eye, (2, 2, 2, ci, ci))
    tiled = jnp.broadcast_to(w[0, 0, 0].astype(x.dtype) / 8,
                             (2, 2, 2, ci, extra))
    w2 = jnp.concatenate([ident, tiled], axis=-1)
    return lax.conv_general_dilated(x, w2, (2, 2, 2), [(0, 0)] * 3,
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)
