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


def head_conv3d_tap(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME k=3 conv Ci -> 1 via channel-GEMM + 27-tap shift-add (exact
    algebra; one intermediate rounding of the tap maps in bf16)."""
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
