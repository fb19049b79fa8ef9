"""Fused nearest-2x-upsample + k=3 conv, computed at the LOW resolution.

The BigGAN-deep G up-block (reference utils.py:78-80: `F.interpolate` 2x
followed by a 3^3 conv) is the heaviest block of the flagship model.  Both
ops are linear, so the pair can be algebraically rewritten to run at the
input resolution:

For output parity (a, b, c) in {0,1}^3, the three k=3 taps along each axis
of the upsampled grid collapse onto TWO input voxels (nearest upsampling
duplicates values), with per-axis combined weights

    parity 0: [w0, w1 + w2]          parity 1: [w0 + w1, w2]

so the whole pair becomes ONE k=2, stride-1 conv at input resolution with
8 parity kernels stacked into the output-channel dim, followed by a
depth-to-space interleave:

- useful FLOPs drop 216/64 = 3.375x  (27 taps at (2s)^3  ->  8 taps x 8
  parities at ~s^3, with the (s+1)^3 halo shared across parities);
- output lanes widen 8x: 8*Cout = 128 at the flagship's Cout=16 — the MXU
  lane fix ops/lane_conv.py attempts, but here paid for by a real FLOP
  reduction instead of structural zeros.

Numerics: identical to upsample_nearest3d + conv3d modulo f32 summation
order (taps are pre-summed in the weights); parity-tested in
tests/test_upsample_conv.py.  Autodiff works through the decomposition
(slice/stack/conv), and both backward GEMMs are 128 lanes wide.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NDHWC", "DHWIO", "NDHWC")

# Global mode, read at TRACE time by nn.blocks.GBlockDeep:
#   "off"   — compose upsample_nearest3d + conv3d (reference formulation)
#   "on"    — parity-decomposed k=2 conv + depth-to-space interleave
#   "tconv" — single stride-2 transposed conv with the k=4 combined kernel
#   "auto"  — measured end-to-end winner per backend (docs/PERF.md)
_MODE = os.environ.get("GAN3D_FAST_UPCONV", "auto")


def set_fast_upconv_mode(mode: str) -> None:
    global _MODE
    assert mode in ("off", "auto", "on", "tconv"), mode
    _MODE = mode


def fast_upconv_variant() -> str:
    """Resolved variant: "off" | "on" | "tconv".

    auto -> "tconv" on TPU: measured +20-25% on every G up-block variant
    (scripts/bench_block_conv.py, docs/PERF.md); the parity-decomposed "on"
    form loses to its own interleave and stays opt-in.
    """
    if _MODE == "auto":
        return "tconv" if jax.default_backend() == "tpu" else "off"
    return _MODE


def fast_upconv_enabled() -> bool:
    return fast_upconv_variant() != "off"

# C[parity][u, k]: weight of original tap k on collapsed 2-window slot u.
_COMBINE = np.array(
    [[[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]],   # parity 0: [w0, w1+w2]
     [[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]]],  # parity 1: [w0+w1, w2]
    np.float32)


def fuse_weights(w: jax.Array) -> jax.Array:
    """[3,3,3,Cin,Cout] -> [2,2,2,Cin,8*Cout] parity-stacked k=2 kernels."""
    # NB: keep the constant in numpy — lru-caching a jnp array leaks tracers
    # across jit traces (jnp.asarray inside a trace yields a trace-local
    # constant).
    c = jnp.asarray(_COMBINE, w.dtype)
    # [a,u,k][b,v,l][c,t,m] x [k,l,m,i,o] -> [u,v,t,i,a,b,c,o]
    w_eff = jnp.einsum("auk,bvl,ctm,klmio->uvtiabco", c, c, c, w)
    k2, _, _, ci, *_ = w_eff.shape
    co = w.shape[4]
    return w_eff.reshape(2, 2, 2, ci, 8 * co)


def upsample_conv3d(x: jax.Array, w: jax.Array) -> jax.Array:
    """nearest-2x upsample then k=3/s=1/p=1 conv, fused at input resolution.

    x: [N, D, H, W, Cin]; w: [3, 3, 3, Cin, Cout] (torch Conv3d semantics,
    matching ops.conv3d.conv3d).  Returns [N, 2D, 2H, 2W, Cout].
    """
    n, d, h, wd, ci = x.shape
    co = w.shape[4]
    w_all = fuse_weights(w)
    z = lax.conv_general_dilated(
        x, w_all, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=_DN,
        preferred_element_type=x.dtype)          # [N, D+2... no: D+1]
    # k=2 pad=1 conv: output length D+1; parity-a output row 2i+a reads z
    # at position i+a (window starting at input i-1+a).
    z = z.reshape(n, d + 1, h + 1, wd + 1, 2, 2, 2, co)
    parts = []
    for a in range(2):
        for b in range(2):
            for c_ in range(2):
                parts.append(z[:, a:a + d, b:b + h, c_:c_ + wd, a, b, c_])
    y = jnp.stack(parts, axis=-2)                # [N, D, H, W, 8, Cout]
    y = y.reshape(n, d, h, wd, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)      # [N, D,2, H,2, W,2, Cout]
    return y.reshape(n, 2 * d, 2 * h, 2 * wd, co)


# C4[u, k]: per-axis collapse of (nearest-up-2x then k=3 tap k) onto the
# equivalent stride-2 transposed-conv tap u.
_COMBINE4 = np.array(
    [[1.0, 0.0, 0.0],    # u=0: w0
     [1.0, 1.0, 0.0],    # u=1: w0+w1
     [0.0, 1.0, 1.0],    # u=2: w1+w2
     [0.0, 0.0, 1.0]],   # u=3: w2
    np.float32)


def fuse_weights_tconv(w: jax.Array) -> jax.Array:
    """[3,3,3,Cin,Cout] -> [4,4,4,Cin,Cout] stride-2 transposed-conv kernel."""
    c = jnp.asarray(_COMBINE4, w.dtype)
    return jnp.einsum("uk,vl,tm,klmio->uvtio", c, c, c, w)


def upsample_conv3d_tconv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Same op as upsample_conv3d, expressed as ONE stride-2 transposed conv.

    nearest-up(2x) + k=3/s=1/p=1 conv == lhs-dilation-2 conv with the k=4
    per-axis-combined kernel and padding (2, 2):

        y[o] = sum_k w[k] * x[floor((o + k - 1) / 2)]
             = sum_j K[2 - (o - 2j)] * x[j],  K = [w0, w0+w1, w1+w2, w2]

    No interleave/reshape at all — XLA picks its native transposed-conv
    lowering (sub-kernel decomposition on TPU).
    """
    w4 = fuse_weights_tconv(w)
    return lax.conv_general_dilated(
        x, w4, (1, 1, 1), [(2, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=_DN, preferred_element_type=x.dtype)
