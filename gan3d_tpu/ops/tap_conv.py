"""Tap-map rewrite for the Co=1 output-head conv (G tail, e.g. 64 -> 1).

The flagship G's output conv (reference `biggan.py:55-63` out-head, and the
sagan/dcgan tails) is a k=3 SAME conv Ci -> 1: with one output channel only
1 of 128 MXU lanes is live, and — worse — the C=1 rank-5 result forces XLA
into a batch-minor T(2,128) layout (16x padded), turning the surrounding
tanh fusions into layout transposes (57 GB/s in the session-7 step trace;
the C=1 boundary neighborhood costs ~45 ms/step, docs/PERF.md).

Exact reformulation: contract channels FIRST, then do the spatial kernel as
a 27-tap shift-add of the tap maps:

    u[m, t] = sum_c x[m, c] * w[t, c]     ONE GEMM [M, Ci] @ [Ci, 27]
    y[o]    = sum_t u[o + t - 1, t]       27 shifted slices, f32 accumulate

The GEMM keeps N=27 (vs the conv's N=1) and the shift-add is pure
bandwidth.  Same multiplies as the conv; the one numerics difference is an
intermediate rounding of u to the compute dtype between the GEMM and the
tap sum (the conv accumulates everything in f32 before one cast) — parity
pinned in tests/test_tap_conv.py at bf16-rounding tolerance.

Measured (scripts/bench_boundary_conv.py, batch 16 @ 64^3): isolated op
1.55x fwd / 1.17x grad; the composed boundary chain (head -> tanh -> stem)
with this op PLUS the s2d stem (ops/s2d_conv.py) runs 9.4 vs 16.4 ms fwd
and 27.3 vs 41.1 ms grad — the two-sided rewrite keeps every interior
tensor out of the degenerate C=1 layout.

Step-level verdicts are RESOLUTION-DEPENDENT (docs/PERF.md session 8).
At 64^3 the A/B LOST: --fast_head=on alone 19.06 vs 20.30 control (-6%);
combined with --fast_stem=on, 17.30 (-15%) — the same fusion-neighborhood
non-locality that sank fast_stem, lane_conv, wide_conv and fast_dw.  At
128^3 the combined boundary rewrite WINS: 1.01 vs 0.962 vol/s, and it is
also what keeps the 128^3 program compiling (the control stopped fitting
the remote compile helper).  The Trainer resolves ``fast_head="auto"`` to
ON at resolution >= 128, OFF below; the module-level auto is OFF.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

_MODE = os.environ.get("GAN3D_FAST_HEAD", "auto")


def set_fast_head_mode(mode: str) -> None:
    global _MODE
    assert mode in ("off", "auto", "on"), mode
    _MODE = mode


def fast_head_enabled() -> bool:
    if _MODE == "auto":
        return False  # step-level A/B measured a LOSS (19.1 vs 20.3 vol/s)
    return _MODE == "on"


def eligible(x_shape, w_shape, stride, padding, dilation, groups) -> bool:
    """k=3, stride 1, SAME pad 1, no dilation/groups, Co == 1, Ci wide
    enough that the channel GEMM beats the degenerate conv."""
    if groups != 1:
        return False
    if tuple(w_shape[:3]) != (3, 3, 3):
        return False
    if tuple(stride) != (1, 1, 1) or tuple(padding) != (1, 1, 1):
        return False
    if tuple(dilation) != (1, 1, 1):
        return False
    if w_shape[4] != 1 or x_shape[4] < 8:
        return False
    return min(x_shape[1:4]) >= 4


@jax.custom_vjp
def head_conv3d_tap(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME k=3 conv Ci -> 1 via channel-GEMM + 27-tap shift-add (exact
    algebra; one intermediate rounding of the tap maps in bf16).

    Custom VJP: autodiff's transpose of the tap construction materializes
    a [N, D+2, H+2, W+2, 27] pad-add AND lowers the transposed GEMM
    operands as 27/32-row dynamic-update-slice while-loops (53 GB/s layout
    transposes — ~47 ms/step of the StyleGAN-1 64^3 step, round-3
    session-5 trace).  The hand VJP reuses the forward's trick: du is 27
    cheap slices of the padded cotangent (du[p, t] = g[p - t + 1], the
    mirrored tap map), then dx and dW are two layout-friendly GEMMs
    sharing that one tap map:

        dx[m, c] = sum_t du[m, t] * w[t, c]     [M, 27] @ [27, Ci]
        dW[t, c] = sum_m du[m, t] * x[m, c]     [27, M] @ [M, Ci]
    """
    return _tap_fwd_impl(x, w)


def _tap_fwd_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    n, d, h, wd, ci = x.shape
    wt = jnp.transpose(w.reshape(27, ci, 1)[..., 0])      # [Ci, 27]
    u = jax.lax.dot_general(
        x.reshape(-1, ci), wt.astype(x.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype).reshape(n, d, h, wd, 27)
    up = jnp.pad(u, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    acc = None
    t = 0
    for td in range(3):
        for th in range(3):
            for tw in range(3):
                s = lax.slice(up, (0, td, th, tw, t),
                              (n, td + d, th + h, tw + wd, t + 1))
                s = s.astype(jnp.float32)
                acc = s if acc is None else acc + s
                t += 1
    return acc.astype(x.dtype)


def _mirrored_tap_map(g: jax.Array, taps_first: bool = False) -> jax.Array:
    """du[p, t] = g[p - t + 1] for tap offsets t in {0,1,2}^3: pad the
    [N, D, H, W] cotangent by 1 and take the 27 mirrored slices, stacked
    along a new minor axis -> [N, D, H, W, 27] (or along axis 0 ->
    [27, N, D, H, W] when ``taps_first``, the pre-transposed form the dW
    GEMM wants)."""
    n, d, h, wd = g.shape
    gp = jnp.pad(g, [(0, 0), (1, 1), (1, 1), (1, 1)])
    slabs = []
    for td in range(3):
        for th in range(3):
            for tw in range(3):
                slabs.append(lax.slice(
                    gp, (0, 2 - td, 2 - th, 2 - tw),
                    (n, 2 - td + d, 2 - th + h, 2 - tw + wd)))
    return jnp.stack(slabs, axis=0 if taps_first else -1)


def _tap_vjp_fwd(x, w):
    return _tap_fwd_impl(x, w), (x, w)


def _tap_vjp_bwd(res, g):
    x, w = res
    n, d, h, wd, ci = x.shape
    gt = g[..., 0].astype(x.dtype)
    du = _mirrored_tap_map(gt)                            # [N,D,H,W,27]
    duf = du.reshape(-1, 27)
    w27 = w.reshape(27, ci).astype(x.dtype)               # [27, Ci]
    dx = lax.dot_general(duf, w27, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dx = dx.reshape(x.shape).astype(x.dtype)
    # dW as a canonical NN GEMM [27, M] @ [M, Ci]: contracting dim 0 of
    # BOTH operands (the TN form) makes XLA transpose x [M, Ci] -> [Ci, M]
    # through a 53 GB/s dynamic-update-slice while-loop (~21.5 ms at the
    # sg1 64^3 step); a second cheap stack of the same 27 slices along
    # axis 0 gives du pre-transposed and the dot lowers transpose-free.
    du27 = _mirrored_tap_map(gt, taps_first=True).reshape(27, -1)
    dw = lax.dot_general(du27, x.reshape(-1, ci),
                         (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)  # [27, Ci]
    return dx, dw.reshape(3, 3, 3, ci, 1).astype(w.dtype)


head_conv3d_tap.defvjp(_tap_vjp_fwd, _tap_vjp_bwd)
