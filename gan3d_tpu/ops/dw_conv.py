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
MXU lane live) whose rhs is 27 shifted views of gpad.

Kernel shape (v2 — no manual DMA): this environment's remote Mosaic
compiler rejects `make_async_copy` whenever the copied view's minor dims
are not tile-aligned ("Slice shape along dimension 4 must be aligned to
tiling (128), but is 32" — scripts/probe_mosaic.py isolates it), which
rules out the original double-buffered halo slab at Co<128.  What it DOES
accept is the compute core: unaligned `lax.slice` on loaded VALUES, the
27-way lane concat, and an f32 accumulator output revisited across grid
steps (probe rungs lane_concat27 / wide_dot_accum).  So the halo is fed
by standard pipelined BlockSpecs instead:

- the D-axis (kd) shifts become THREE XLA-side views of gpad
  (``gp[:, kd:kd+D]``), each a pipelined input — Mosaic's automatic
  double-buffering replaces the hand-rolled DMA;
- the H/W-axis (kh, kw) shifts are in-kernel value slices of the loaded
  block (halo columns ride in with the block: H+2, W+2);
- grid (N, D/dD) with full H,W planes per step accumulates [Ci, 27*Co]
  in f32 (TPU grids are sequential).

HBM cost vs the DMA design: gpad is read 3x instead of 1x — still far
under the MXU-bound arithmetic intensity at these shapes.

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

_DN = ("NDHWC", "DHWIO", "NDHWC")

# Read at TRACE time by ops/conv3d.py:
#   "off"  — plain autodiff (XLA's conv-form dW)
#   "on"   — Pallas wide-N dW for eligible convs
#   "auto" — measured end-to-end winner per backend (docs/PERF.md)
_MODE = os.environ.get("GAN3D_FAST_DW", "auto")

# VMEM budget (bytes) for the per-step working set: the materialized
# [K, 27*Co] rhs (the dominant term), the 27 sliced views feeding its
# concat, the pipelined input blocks (x + 3 gpad views, double-buffered),
# and the f32 [Ci, 27*Co] accumulator.
_VMEM_BUDGET = 10 << 20


def set_fast_dw_mode(mode: str) -> None:
    global _MODE
    assert mode in ("off", "auto", "on"), mode
    _MODE = mode


def fast_dw_enabled() -> bool:
    if _MODE == "auto":
        # Off until the on-chip step measurement decides (docs/PERF.md).
        return False
    return _MODE == "on"


def _vmem_est(dd: int, h: int, w: int, ci: int, co: int,
              itemsize: int) -> int:
    """Working-set estimate (bytes) for a depth tile of dd rows."""
    k = dd * h * w
    rhs = k * 27 * co * itemsize            # concat result
    views = k * 27 * co * itemsize          # sliced views feeding it
    blocks = 2 * (dd * h * w * ci + 3 * dd * (h + 2) * (w + 2) * co)
    out = ci * 27 * co * 4
    return rhs + views + blocks * itemsize + out


def _tiles(d: int, h: int, w: int, ci: int, co: int,
           itemsize: int) -> Optional[int]:
    """Largest depth tile dd (divides d) whose working set fits the budget."""
    best = None
    for dd in range(1, d + 1):
        if d % dd:
            continue
        if _vmem_est(dd, h, w, ci, co, itemsize) <= _VMEM_BUDGET:
            best = dd
        else:
            break
    return best


def eligible(x_shape, w_shape, stride, padding, dilation, groups) -> bool:
    """k=3, s=1, p=1, no dilation/groups, and the working set fits VMEM."""
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
    if _tiles(d, h, w, ci, co, 4) is None:
        return False
    return True


def _dw_kernel(x_ref, gp0_ref, gp1_ref, gp2_ref, out_ref, *, dd: int,
               h: int, w: int, ci: int, co: int, split: int = 1):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    k = dd * h * w
    lhs = x_ref[0].reshape(k, ci)
    gpr = (gp0_ref, gp1_ref, gp2_ref)
    # split=1: ONE [K, 27*Co] dot (widest N, biggest concat working set).
    # split=3: one [K, 9*Co] dot per kd — same math, smaller concats; the
    # parts are re-concatenated for a single full-width out write (lane-
    # offset partial writes are not tile-aligned at 9*Co).
    taps_per = 27 // split
    parts = []
    for part_i in range(split):
        views = []
        for t in range(part_i * taps_per, (part_i + 1) * taps_per):
            kd, kh, kw = t // 9, (t // 3) % 3, t % 3
            # tap k reads gpad at offset (2 - k): dW[k] = sum_u x[u] *
            # gpad[u + 2 - k] (docstring derivation)
            sl = gpr[2 - kd][0]  # [dd, h+2, w+2, co] (this kd's D shift)
            v = lax.slice(sl, (0, 2 - kh, 2 - kw, 0),
                          (dd, 2 - kh + h, 2 - kw + w, co))
            views.append(v.reshape(k, co))
        rhs = jnp.concatenate(views, axis=1)  # [K, taps_per*Co]
        parts.append(lax.dot_general(lhs, rhs, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32))
    part = parts[0] if split == 1 else jnp.concatenate(parts, axis=1)

    @pl.when(step == 0)
    def _():
        out_ref[...] = part

    @pl.when(step != 0)
    def _():
        out_ref[...] += part


@functools.partial(jax.jit, static_argnums=(2,))
def _dw_pallas(x: jax.Array, gp: jax.Array,
               dims: Tuple[int, ...]) -> jax.Array:
    n, d, h, w, ci, co, dd, split = dims
    # Three D-shifted views of the padded cotangent: tap kd reads rows
    # [kd, kd+d) — XLA materializes each once (3x gpad HBM reads total).
    gps = [lax.slice_in_dim(gp, kd, kd + d, axis=1) for kd in range(3)]
    kern = functools.partial(_dw_kernel, dd=dd, h=h, w=w, ci=ci, co=co,
                             split=split)
    gp_spec = pl.BlockSpec((1, dd, h + 2, w + 2, co),
                           lambda i, j: (i, j, 0, 0, 0))
    acc = pl.pallas_call(
        kern,
        grid=(n, d // dd),
        in_specs=[
            pl.BlockSpec((1, dd, h, w, ci), lambda i, j: (i, j, 0, 0, 0)),
            gp_spec, gp_spec, gp_spec,
        ],
        out_specs=pl.BlockSpec((ci, 27 * co), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((ci, 27 * co), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * h * w * ci * 27 * co,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + 3 * gp.size * gp.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, *gps)
    return acc


def conv3d_dw(x: jax.Array, g: jax.Array, split: int = 1) -> jax.Array:
    """dW of a k=3/s=1/p=1 NDHWC conv: [3, 3, 3, Ci, Co] in f32.

    x: [N, D, H, W, Ci] conv input; g: [N, D, H, W, Co] output cotangent.
    split: 1 or 3 — number of dots the 27-tap rhs is built in (see kernel).
    """
    assert 27 % split == 0, split
    n, d, h, w, ci = x.shape
    co = g.shape[-1]
    dd = _tiles(d, h, w, ci, co, g.dtype.itemsize)
    if dd is None:
        # working set would overflow VMEM at this dtype — XLA's conv-form dW
        wz = jnp.zeros((3, 3, 3, ci, co), x.dtype)
        _, vjp = jax.vjp(lambda w_: _plain_conv(x, w_), wz)
        return vjp(g.astype(x.dtype))[0].astype(jnp.float32)
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = _dw_pallas(x, gp, (n, d, h, w, ci, co, dd, split))
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
