"""Pallas transposed-layout ("wide-N") k=3/s=1/p=1 conv for narrow channels.

The flagship model's hot convs have 16-64 output channels; XLA's im2col
form puts spatial in M and channels in N, leaving 96 of 128 MXU lanes idle
(measured 12.6 TF/s at 32ch@64^3 — docs/PERF.md).  This kernel transposes
the GEMM:

    out^T[co, s] = W2[co, 27*Ci] @ X27[27*Ci, s]

so N = spatial (every lane live) and M = Co streams.  X27's 27 tap views
are built in VMEM from a (dD+2)-row channels-first slab (sublane-dim
concat — no lane shuffles), never materialized in HBM; unlike the
lane-packed rewrite (2T/3 dense-FLOP inflation) and the W-Toeplitz direct
kernel ((T+2)/3), this form pays ZERO structural FLOPs.  The theoretical
ceiling is weight-load-bound at M=Co=32 (~25% of MXU peak ~ 45 TF/s bf16)
— still ~3.5x XLA's narrow-N form; scripts/bench_wide_conv.py measures
the go/no-go on-chip (the same composition caveat that sank lane packing
applies: isolated wins must survive the block-level A/B).

Layout contract: x enters/leaves NDHWC; the kernel works on channels-first
[N, C, D+2, H+2, W+2] (one XLA transpose each way per conv).  Tiles are
full H x W planes, dD depth rows, so the [Co, Ks] product block is
contiguous in the flat [N, Co, D*H*W] output — no in-kernel reshape.

Differentiation is fully Pallas: dx is the SAME kernel with spatially
reversed, in/out-swapped weights (a k=3/s=1/p=1 conv again), and dW is
the wide-N weight-gradient kernel (ops/dw_conv.py).  Gated behind
``wide_conv`` ("auto" = measured winner per backend, off until proven).
Parity: tests/test_wide_conv.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gan3d_tpu.ops import dw_conv

_DN = ("NDHWC", "DHWIO", "NDHWC")

_MODE = os.environ.get("GAN3D_WIDE_CONV", "auto")

# VMEM budget for the materialized [27*Ci, Ks] X27 tile (bytes).
_X27_BUDGET = 7 << 20


def set_wide_conv_mode(mode: str) -> None:
    global _MODE
    assert mode in ("off", "auto", "on"), mode
    _MODE = mode


def wide_conv_enabled() -> bool:
    if _MODE == "auto":
        # Off until scripts/bench_wide_conv.py decides on-chip.
        return False
    return _MODE == "on"


def _tile_rows(d: int, h: int, w: int, ci: int,
               itemsize: int) -> Optional[int]:
    """Depth rows dD per step: 27*Ci*dD*H*W*itemsize under the budget."""
    cap = _X27_BUDGET // (27 * ci * itemsize * h * w)
    if cap < 1:
        return None
    dd = min(d, cap)
    while d % dd:
        dd -= 1
    return dd


def eligible(x_shape, w_shape, stride, padding, dilation, groups) -> bool:
    if tuple(stride) != (1, 1, 1) or tuple(padding) != (1, 1, 1):
        return False
    if tuple(dilation) != (1, 1, 1) or groups != 1:
        return False
    if tuple(w_shape[:3]) != (3, 3, 3):
        return False
    n, d, h, w, ci = x_shape
    co = w_shape[4]
    if ci < 8 or co < 8:
        # at ci=1 (the D input conv) K collapses to 27 and the dot is
        # latency-bound; leave such convs to XLA.
        return False
    # both directions of the VJP run the kernel (dx swaps ci<->co);
    # itemsize 4 = widest train dtype, _wide_fwd falls back beyond it
    if _tile_rows(d, h, w, ci, 4) is None:
        return False
    if _tile_rows(d, h, w, co, 4) is None:
        return False
    return dw_conv.eligible(x_shape, w_shape, stride, padding, dilation,
                            groups)


def _wide_kernel(w2_ref, xt_hbm, out_ref, slab, sems, *, dd: int, h: int,
                 w: int, ci: int, co: int, out_dtype):
    n_i = pl.program_id(0)
    d_i = pl.program_id(1)
    n_d = pl.num_programs(1)
    step = n_i * n_d + d_i
    total = pl.num_programs(0) * n_d
    slot = lax.rem(step, 2)

    def copy(dst_slot, s):
        src_n = s // n_d
        src_d = lax.rem(s, n_d)
        return pltpu.make_async_copy(
            xt_hbm.at[src_n, :, pl.ds(src_d * dd, dd + 2)],
            slab.at[dst_slot],
            sems.at[dst_slot],
        )

    @pl.when(step == 0)
    def _():
        copy(0, step).start()

    @pl.when(step + 1 < total)
    def _():
        copy(lax.rem(step + 1, 2), step + 1).start()

    copy(slot, step).wait()

    k = dd * h * w
    sl = slab[slot]  # [ci, dd+2, h+2, w+2]
    views = []
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                v = lax.slice(sl, (0, kd, kh, kw),
                              (ci, kd + dd, kh + h, kw + w))
                views.append(v.reshape(ci, k))
    x27 = jnp.concatenate(views, axis=0)  # [27*Ci, Ks] — sublane concat
    val = lax.dot_general(w2_ref[...], x27, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    out_ref[0] = val.astype(out_dtype)


@functools.partial(jax.jit, static_argnums=(2,))
def _wide_pallas(w2: jax.Array, xt: jax.Array,
                 dims: Tuple[int, ...]) -> jax.Array:
    n, d, h, w, ci, co, dd = dims
    kern = functools.partial(_wide_kernel, dd=dd, h=h, w=w, ci=ci, co=co,
                             out_dtype=xt.dtype)
    ks = dd * h * w
    return pl.pallas_call(
        kern,
        grid=(n, d // dd),
        in_specs=[
            pl.BlockSpec((co, 27 * ci), lambda i, j: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # xt stays in HBM
        ],
        out_specs=pl.BlockSpec((1, co, ks), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((n, co, d * h * w), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ci, dd + 2, h + 2, w + 2), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * h * w * ci * 27 * co,
            bytes_accessed=xt.size * xt.dtype.itemsize * 2,
            transcendentals=0,
        ),
    )(w2, xt)


def _wide_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    """The wide-N conv as NDHWC -> NDHWC (transposes at both ends)."""
    n, d, h, wd, ci = x.shape
    co = w.shape[4]
    dd = _tile_rows(d, h, wd, ci, x.dtype.itemsize)
    if dd is None:
        # X27 tile would overflow VMEM at this dtype — plain XLA conv
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            dimension_numbers=_DN, preferred_element_type=x.dtype)
    xt = jnp.transpose(x, (0, 4, 1, 2, 3))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
    w2 = w.reshape(27 * ci, co).T  # [Co, 27*Ci]; row tap*Ci+c = w[k..., c, :]
    out = _wide_pallas(w2.astype(x.dtype), xt, (n, d, h, wd, ci, co, dd))
    return jnp.transpose(out.reshape(n, co, d, h, wd), (0, 2, 3, 4, 1))


@jax.custom_vjp
def wide_conv3d(x: jax.Array, w: jax.Array) -> jax.Array:
    """k=3/s=1/p=1 conv: Pallas wide-N forward, dx, and dW."""
    return _wide_fwd(x, w)


def _fwd(x, w):
    return _wide_fwd(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # dx of a k=3/s=1/p=1 conv is the same conv with reversed, io-swapped
    # weights — the wide kernel again (ci<->co roles swap).
    wr = w[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)
    dx = _wide_fwd(g, wr)
    dw = dw_conv.conv3d_dw(x, g).astype(w.dtype)
    return dx, dw


wide_conv3d.defvjp(_fwd, _bwd)
