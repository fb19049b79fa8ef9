"""Banded spatial-matmul lowering for tiny-channel k=3 convs (fast_c1).

The round-3 StyleGAN2 64^3 step trace (docs/PERF.md) shows 68% of device
time in C=1->1 k=3 convolutions at 64^3/65^3 running at 0.1-0.2 TF/s and
~5 GB/s: at the reference's sg2 channel table (channel_base = filterG =
64 -> min(64/res, 512) channels), the top-resolution blocks are 1-2
channels wide, and XLA's T(2,128) tiling puts batch (16) in lanes and
C=1 in sublanes, wasting ~99% of every tile on padding. This is the same
degenerate-layout class the separable fast_fir lowering closed for the
FIR resamples (2.30x end-to-end, PERF.md session 9) — but trained k=3^3
kernels are not separable, so the 1-D-band trick does not apply directly.

Lowering: express the stencil as ONE einsum whose contraction rides the
MXU with the W axis (>= 32) in lanes on both operands:

    y[n,d,h,v,o] = sum_{t=(kd,kh), u, i}  X_t[n,d,h,u,i] * B[t,i,o,u,v]

where X_t are the 9 (D,H)-shifted views of the (D,H)-padded input and
B[t,i,o] are banded [W, W_out] matrices assembled from the kernel taps
via three STATIC shifted identities:  B[t,i,o] = sum_kw w[t,kw,i,o] S_kw.
The band assembly is differentiable (S_kw are constants), so autodiff
produces dx and dW as the transposed GEMMs of the same shape — no custom
VJP needed, and the backward escapes the degenerate layout for free.

FLOPs inflate ~(W/3)-fold (the band is mostly zeros), but the op moves
from ~5 GB/s VPU shuffling to MXU GEMM rates; at W=64, C=1 the einsum is
a [N*D*H, 9W] x [9W, W] GEMM (~4.8 GFLOP vs the stencil's 0.23) that the
MXU finishes in ~0.1 ms where XLA's conv took 3.4 ms.

Go/no-go: parity-gated (tests/test_c1_conv.py), measured end-to-end by
bench.py A/B only (the 4-for-4 method lesson, docs/PERF.md session 8).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MODE = os.environ.get("GAN3D_FAST_C1", "auto")


def set_fast_c1_mode(mode: str) -> None:
    global _MODE
    assert mode in ("off", "auto", "on"), mode
    _MODE = mode


def fast_c1_enabled() -> bool:
    if _MODE == "auto":
        # Measured GO twice (docs/PERF.md round 3 sessions 2-3): the
        # stride-1 form 264.9 vs 144.5 vol/s (1.83x), the up/down form
        # 372.9 vs 264.9 (1.41x) — StyleGAN2 64^3 batch 16 step-level
        # bench.py A/Bs on v5e. CPU (tests) keeps XLA's native conv.
        return jax.default_backend() == "tpu"
    return _MODE == "on"


# Gate floors for the band GEMM to pay off: minimum lane (W-axis) extent
# and maximum channel product. Module-level so the multichip dryrun can
# relax them to exercise the sharded lowering at CPU-mesh-sized shapes
# (16^3, where the sg2 channel table is wider) — validation knobs, not
# perf ones.
MIN_W = 32
MAX_CICO = 4


def small_conv3d_applicable(x_shape: Tuple[int, ...],
                            w_shape: Tuple[int, ...],
                            groups: int) -> bool:
    """Shape gate: stride-1 k=3^3 convs whose channel product is tiny and
    whose W axis is lane-sized. Wider channels (>= 4x4) already pack lanes
    acceptably in XLA's native layout, and small W wastes the band GEMM."""
    kd, kh, kw, ci, co = w_shape
    return (groups == 1 and kd == kh == kw == 3
            and ci * co <= MAX_CICO and x_shape[-2] >= MIN_W)


@lru_cache(maxsize=None)
def _shift_bands(w_in: int, k: int, p0: int, p1: int) -> np.ndarray:
    """S[kw, u, v] with y[v] += x[u] * w[kw]  where u = v - p0 + kw:
    the k static shifted identities that assemble a banded [W_in, W_out]
    matrix from kernel taps along the lane axis."""
    w_out = w_in + p0 + p1 - (k - 1)
    s = np.zeros((k, w_in, w_out), np.float32)
    for t in range(k):
        for v in range(w_out):
            u = v - p0 + t
            if 0 <= u < w_in:
                s[t, u, v] = 1.0
    return s


def small_conv3d_ud_applicable(x_shape: Tuple[int, ...],
                               w_shape: Tuple[int, ...], groups: int,
                               up: int, down: int) -> bool:
    """Shape gate for the resampled variant: the sg2 G up=2 convs
    (32^3 x 2ch -> 64^3 x 1ch) and D down=2 convs (64^3 x 1ch -> 32^3 x
    2ch) run at 0.5 TF/s / 8 GB/s as XLA lhs-dilated / strided convs
    (round-3 session-3 trace: 28.8% of the post-fast_c1 sg2 step)."""
    kd, kh, kw, ci, co = w_shape
    return (groups == 1 and kd == kh == kw == 3
            and ci * co <= MAX_CICO and x_shape[-2] >= MIN_W
            and (up, down) in ((2, 1), (1, 2)))


@lru_cache(maxsize=None)
def _shift_bands_ud(w_in: int, k: int, p0: int, p1: int, up: int,
                    down: int) -> np.ndarray:
    """S[t, u, v] with y[v] += x[u] * w[t] where v*down + t - p0 = u*up:
    the k static shift matrices of a correlation with lhs_dilation ``up``
    and stride ``down`` (lax semantics: dilated length (w_in-1)*up + 1,
    then (p0, p1) padding, then stride-``down`` correlation)."""
    length = (w_in - 1) * up + 1 + p0 + p1
    w_out = (length - k) // down + 1
    s = np.zeros((k, w_in, max(w_out, 0)), np.float32)
    for t in range(k):
        for v in range(w_out):
            m = v * down + t - p0
            if m >= 0 and m % up == 0 and m // up < w_in:
                s[t, m // up, v] = 1.0
    return s


_WFIRST_MODE = os.environ.get("GAN3D_C1_WFIRST", "auto")


def set_c1_wfirst_mode(mode: str) -> None:
    global _WFIRST_MODE
    assert mode in ("off", "auto", "on"), mode
    _WFIRST_MODE = mode


def c1_wfirst_enabled() -> bool:
    """W-band-first einsum order for the UP form of small_conv3d_ud.

    The round-4 sg2 batch-32 trace pins ~3% of the step on 3x0.98 ms
    relayouts of the up-conv's [kd,kh,N,Do,Ho,W,Ci] intermediate (~155 MB
    at 64^3 batch 32): the D/H shift GEMMs expand the spatial extents
    BEFORE the W contraction, so the largest tensor of the chain is also
    the one XLA re-lays-out between producer and consumer. Contracting
    the W band first (on the small pre-upsample input) and expanding
    D/H afterwards makes every intermediate output-sized-or-smaller
    (~40 MB total). auto = per the measured step-level A/B.
    """
    if _WFIRST_MODE == "auto":
        # Measured step-level GO, replicated (round 5, bench.py
        # --family=stylegan2 batch 32 on v5e): 480.07/482.02 vol/s vs
        # 438.30/438.55 control (+9.7%, vs_baseline 1.185 -> 1.30).
        return True
    return _WFIRST_MODE == "on"


def small_conv3d_ud(x: jax.Array, w: jax.Array,
                    pads: Tuple[Tuple[int, int], ...],
                    up: Tuple[int, int, int],
                    down: Tuple[int, int, int]) -> jax.Array:
    """Resampled 3-D correlation on [N, D, H, W, Ci] with kernel
    [kd, kh, kw, Ci, Co], lhs_dilation ``up``, stride ``down`` — as three
    banded-matmul einsums (kernel taps pre-flipped by the caller, as in
    :func:`small_conv3d`).

    Unlike the stride-1 form, the D/H axes cannot be shifted *views* of
    the input (the output extent differs), so each axis gets its own
    static 0/1 shift matrix applied as a GEMM: first expand D per kd tap,
    then H per kh tap, then contract the W axis against the tap-weighted
    band. All three einsums keep a spatial length >= 32 in lanes on both
    operands, and the assembly is differentiable in ``w`` so autodiff
    yields dx/dW as transposed GEMMs of the same shape — in particular
    the dx of an up=2 conv is a down=2 band einsum and vice versa, which
    kills the degenerate-layout backward convs for free.

    Matches lax.conv_general_dilated(x, w, down, pads, lhs_dilation=up,
    NDHWC/DHWIO).
    """
    n, d, h, wi, ci = x.shape
    kd, kh, kw, wci, co = w.shape
    assert wci == ci, (w.shape, x.shape)
    (pz0, pz1), (py0, py1), (px0, px1) = pads
    (uz, uy, ux), (dz, dy, dx) = up, down

    sd = jnp.asarray(_shift_bands_ud(d, kd, pz0, pz1, uz, dz))    # [kd,D,Do]
    sh = jnp.asarray(_shift_bands_ud(h, kh, py0, py1, uy, dy))    # [kh,H,Ho]
    sw = jnp.asarray(_shift_bands_ud(wi, kw, px0, px1, ux, dx))   # [kw,W,Wo]

    # B[kd, kh, i, o, u, v] — differentiable in w (sw is constant)
    b = jnp.einsum("zyxio,xuv->zyiouv", w.astype(jnp.float32),
                   sw).astype(x.dtype)

    f32 = jnp.float32
    if c1_wfirst_enabled() and (uz, uy) == (2, 2):
        # W-band first on the pre-upsample input, THEN the D/H expansion
        # GEMMs — every intermediate stays output-sized-or-smaller (the
        # default order materializes a [kd,kh,N,Do,Ho,W,Ci] tensor that
        # is the largest of the chain and gets relayouted; see
        # c1_wfirst_enabled).
        z1 = jnp.einsum("nzhui,tsiouv->tsnzhvo", x, b,
                        preferred_element_type=f32).astype(x.dtype)
        z2 = jnp.einsum("tsnzhvo,tzD->snDhvo", z1, sd.astype(x.dtype),
                        preferred_element_type=f32).astype(x.dtype)
        y = jnp.einsum("snDhvo,shH->nDHvo", z2, sh.astype(x.dtype),
                       preferred_element_type=f32)
        return y.astype(x.dtype)
    xd = jnp.einsum("nzhui,tzD->tnDhui", x, sd.astype(x.dtype),
                    preferred_element_type=f32).astype(x.dtype)
    xs = jnp.einsum("tnDyui,syH->tsnDHui", xd, sh.astype(x.dtype),
                    preferred_element_type=f32).astype(x.dtype)
    y = jnp.einsum("tsnDHui,tsiouv->nDHvo", xs, b,
                   preferred_element_type=f32)
    return y.astype(x.dtype)


def small_conv3d(x: jax.Array, w: jax.Array,
                 pads: Tuple[Tuple[int, int], ...]) -> jax.Array:
    """Stride-1 3-D correlation on [N, D, H, W, Ci] with kernel
    [kd, kh, kw, Ci, Co] (torch conv semantics — pre-flip the kernel for
    true convolution), lowered to one banded-matmul einsum.

    ``pads``: ((pz0, pz1), (py0, py1), (px0, px1)), all non-negative.
    Matches lax.conv_general_dilated(x, w, (1,1,1), pads, NDHWC/DHWIO).
    """
    n, d, h, wi, ci = x.shape
    kd, kh, kw, wci, co = w.shape
    assert wci == ci, (w.shape, x.shape)
    (pz0, pz1), (py0, py1), (px0, px1) = pads
    do = d + pz0 + pz1 - (kd - 1)
    ho = h + py0 + py1 - (kh - 1)

    s = jnp.asarray(_shift_bands(wi, kw, px0, px1))       # [kw, W, Wo]
    # B[(kd,kh), i, o, u, v] — differentiable in w (S is constant)
    b = jnp.einsum("zyxio,xuv->zyiouv", w.astype(jnp.float32), s)
    b = b.reshape(kd * kh, ci, co, wi, -1).astype(x.dtype)

    xp = jnp.pad(x, ((0, 0), (pz0, pz1), (py0, py1), (0, 0), (0, 0)))
    xs = jnp.stack([
        jax.lax.slice(xp, (0, iz, iy, 0, 0),
                      (n, iz + do, iy + ho, wi, ci))
        for iz in range(kd) for iy in range(kh)
    ])                                                     # [9, N, Do, Ho, W, Ci]
    y = jnp.einsum("tndhui,tiouv->ndhvo", xs, b,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)
