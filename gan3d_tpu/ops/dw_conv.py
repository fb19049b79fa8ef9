"""Pallas weight-gradient (dW) kernel for the hot k=3/s=1/p=1 convs.

The step-HLO audit (scripts/dump_step_hlo.py) puts ~20% of the flagship
step's conv FLOPs in the WEIGHT-GRADIENT convolutions of the 3^3 bottleneck
convs (reference utils.py:101-106): HLO lines like

    bf16[3,3,3,32,32] convolution(...) window=64x64x64

XLA contracts these as a [27*Ci, K] @ [K, Co] GEMM with K = N*D*H*W ~ 4.2M
and N(=Co) = 32 — the same narrow-N regime docs/PERF.md measured at ~15
TFLOP/s (32 of 128 MXU lanes live).  The algebra transposes: with the tap
shifts moved onto the padded OUTPUT gradient,

    dW[k, ci, co] = sum_s x[s, ci] * gpad[s + 2 - k, co]        (per axis)

so dW is ONE wide GEMM  [Ci, K] @ [K, 27*Co]  (N = 864 at Co=32 — every
MXU lane live) whose rhs is 27 shifted views of gpad.  Materializing those
views in HBM would cost 27x the bytes; this kernel builds them in VMEM from
a (dD+2, hH+2)-row slab of gpad instead, so HBM traffic stays one pass over
x and g.  Grid (N, D/dD, H/hH) accumulates the [Ci, 27*Co] product in f32
across steps (TPU grids are sequential); the slab is double-buffered with
manual DMA like ops/pallas_conv.py.

Gated behind ``fast_dw`` ("auto" = measured winner per backend; off until
scripts/bench_bwd_convs.py demonstrates a win on TPU).  The
custom-VJP wrapper keeps the forward and dx EXACTLY what jax.vjp emits for
the plain conv; only dW takes the Pallas path (f32 accumulation — at least
as accurate as XLA's conv-form dW).  Parity: tests/test_dw_conv.py.
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

_DN = ("NDHWC", "DHWIO", "NDHWC")

# Read at TRACE time by ops/conv3d.py:
#   "off"  — plain autodiff (XLA's conv-form dW)
#   "on"   — Pallas wide-N dW for eligible convs
#   "auto" — measured end-to-end winner per backend (docs/PERF.md)
_MODE = os.environ.get("GAN3D_FAST_DW", "auto")

# VMEM budget for the materialized [K, 27*Co] rhs tile; the K tile size is
# chosen so K*27*Co*itemsize stays under this, leaving room for the
# double-buffered gp slab and x block (both lane-padded to 128 by Mosaic).
_RHS_BUDGET = 4 << 20


def set_fast_dw_mode(mode: str) -> None:
    global _MODE
    assert mode in ("off", "auto", "on"), mode
    _MODE = mode


def fast_dw_enabled() -> bool:
    if _MODE == "auto":
        # Off until the queued TPU measurement decides (bench_bwd_convs.py).
        return False
    return _MODE == "on"


def _tiles(d: int, h: int, w: int, co: int,
           itemsize: int) -> Optional[Tuple[int, int]]:
    """(dD, hH) row tiles: dD*hH*W*27*Co*itemsize under the rhs budget."""
    cap_k = _RHS_BUDGET // (27 * co * itemsize)
    if cap_k < w:
        return None
    if h * w <= cap_k:  # whole plane fits: tile d only
        dd = min(d, cap_k // (h * w))
        while d % dd:
            dd -= 1
        return dd, h
    hh = min(h, cap_k // w)
    while h % hh:
        hh -= 1
    return 1, hh


def eligible(x_shape, w_shape, stride, padding, dilation, groups) -> bool:
    """k=3, s=1, p=1, no dilation/groups, and the rhs tile fits VMEM."""
    if tuple(stride) != (1, 1, 1) or tuple(padding) != (1, 1, 1):
        return False
    if tuple(dilation) != (1, 1, 1) or groups != 1:
        return False
    if tuple(w_shape[:3]) != (3, 3, 3):
        return False
    n, d, h, w, ci = x_shape
    co = w_shape[4]
    if ci < 8 or co < 8:
        # ci is the GEMM's M (streamed rows): at ci=1 (the D input conv)
        # the wide form degenerates; XLA's conv-form dW is fine there.
        return False
    # itemsize 4 = the widest dtype the train paths run (f32); the runtime
    # _tiles call uses the actual dtype and conv3d_dw falls back to XLA's
    # form if an exotic dtype still overflows the budget.
    if _tiles(d, h, w, co, 4) is None:
        return False
    return True


def _dw_kernel(x_ref, gp_hbm, out_ref, slab, sems, *, dd: int, hh: int,
               w: int, ci: int, co: int, split: int = 1):
    n_i = pl.program_id(0)
    d_i = pl.program_id(1)
    h_i = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(2)
    step = (n_i * n_d + d_i) * n_h + h_i
    total = pl.num_programs(0) * n_d * n_h
    slot = lax.rem(step, 2)

    def copy(dst_slot, s):
        src_n = s // (n_d * n_h)
        rem = lax.rem(s, n_d * n_h)
        src_d = rem // n_h
        src_h = lax.rem(rem, n_h)
        return pltpu.make_async_copy(
            gp_hbm.at[src_n, pl.ds(src_d * dd, dd + 2),
                      pl.ds(src_h * hh, hh + 2)],
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

    k = dd * hh * w
    lhs = x_ref[0].reshape(k, ci)
    sl = slab[slot]  # [dd+2, hh+2, w+2, co]
    # split=1: ONE [K, 27*Co] dot (widest N, biggest concat).  split=3:
    # one [K, 9*Co] dot per kd (N=9*Co, a third of the concat working set
    # per dot) — which wins on-chip is measured by bench_bwd_convs.py.
    taps_per = 27 // split
    for part_i in range(split):
        views = []
        for t in range(part_i * taps_per, (part_i + 1) * taps_per):
            kd, kh, kw = t // 9, (t // 3) % 3, t % 3
            v = lax.slice(sl, (2 - kd, 2 - kh, 2 - kw, 0),
                          (2 - kd + dd, 2 - kh + hh, 2 - kw + w, co))
            views.append(v.reshape(k, co))
        rhs = jnp.concatenate(views, axis=1)  # [K, taps_per*Co]
        part = lax.dot_general(lhs, rhs, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        lo = part_i * taps_per * co

        @pl.when(step == 0)
        def _(part=part, lo=lo):
            out_ref[:, lo:lo + taps_per * co] = part

        @pl.when(step != 0)
        def _(part=part, lo=lo):
            out_ref[:, lo:lo + taps_per * co] += part


@functools.partial(jax.jit, static_argnums=(2,))
def _dw_pallas(x: jax.Array, gp: jax.Array,
               dims: Tuple[int, ...]) -> jax.Array:
    n, d, h, w, ci, co, dd, hh, split = dims
    kern = functools.partial(_dw_kernel, dd=dd, hh=hh, w=w, ci=ci, co=co,
                             split=split)
    acc = pl.pallas_call(
        kern,
        grid=(n, d // dd, h // hh),
        in_specs=[
            pl.BlockSpec((1, dd, hh, w, ci),
                         lambda i, j, m: (i, j, m, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # gp stays in HBM
        ],
        out_specs=pl.BlockSpec((ci, 27 * co), lambda i, j, m: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((ci, 27 * co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, dd + 2, hh + 2, w + 2, co), gp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * h * w * ci * 27 * co,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + gp.size * gp.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, gp)
    return acc


def conv3d_dw(x: jax.Array, g: jax.Array, split: int = 1) -> jax.Array:
    """dW of a k=3/s=1/p=1 NDHWC conv: [3, 3, 3, Ci, Co] in f32.

    x: [N, D, H, W, Ci] conv input; g: [N, D, H, W, Co] output cotangent.
    split: 1 or 3 — number of dots the 27-tap rhs is built in (see kernel).
    """
    assert 27 % split == 0, split
    n, d, h, w, ci = x.shape
    co = g.shape[-1]
    tiles = _tiles(d, h, w, co, g.dtype.itemsize)
    if tiles is None:
        # rhs tile would overflow VMEM at this dtype — XLA's conv-form dW
        wz = jnp.zeros((3, 3, 3, ci, co), x.dtype)
        _, vjp = jax.vjp(lambda w_: _plain_conv(x, w_), wz)
        return vjp(g.astype(x.dtype))[0].astype(jnp.float32)
    dd, hh = tiles
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = _dw_pallas(x, gp, (n, d, h, w, ci, co, dd, hh, split))
    # [Ci, 27*Co] -> [27, Ci, Co] -> [3, 3, 3, Ci, Co]; tap t = kd*9+kh*3+kw.
    return acc.reshape(ci, 27, co).transpose(1, 0, 2).reshape(3, 3, 3, ci, co)


def _plain_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=_DN, preferred_element_type=x.dtype)


@jax.custom_vjp
def conv3d_k3_dw(x: jax.Array, w: jax.Array) -> jax.Array:
    """k=3/s=1/p=1 conv whose backward computes dW with the Pallas kernel.

    Forward and dx are bit-identical to the plain path (same lax conv /
    the exact conv jax.vjp emits for it); dW accumulates in f32.
    """
    return _plain_conv(x, w)


def _fwd(x, w):
    return _plain_conv(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # dx: the transpose conv autodiff emits for k=3/s=1/p=1 — spatially
    # reversed kernel with in/out swapped, same padding.
    wr = w[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)
    dx = lax.conv_general_dilated(
        g, wr, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=_DN, preferred_element_type=g.dtype)
    dw = conv3d_dw(x, g).astype(w.dtype)
    return dx, dw


conv3d_k3_dw.defvjp(_fwd, _bwd)
