"""Pallas direct 3D conv for narrow-channel k=3 bottlenecks (W-Toeplitz).

The lane-packed XLA rewrite (ops/lane_conv.py) pays a dense-FLOP ratio of
2T/3 (k2 variant) because an XLA conv must read whole neighbor tiles.  A
direct kernel can read exactly the T+2 input positions each output tile
needs, cutting the ratio to (T+2)/3 — 2.0 vs 2.67 at T=4.

Design (see docs/PERF.md):

- Outside the kernel, XLA materializes an overlapping-tile view
  ``xt[N, D+2, H+2, nW, (T+2)*Cin]`` (tile j covers W positions
  [jT-1, jT+T]; one extra ~1.5x HBM copy, trivial next to the conv).
  With the W-tile and channel dims last, the lhs of EVERY tap matmul is a
  contiguous view — zero in-kernel data rearrangement.
- The Toeplitz weights ``B[9, (T+2)*Cin, T*Cout]`` put all 128 MXU lanes
  to work: B[3a+b][u*Cin+ci, t*Cout+co] = w[a, b, u-t, ci, co].
- Grid (N, D): each step manually DMAs the 3-row slab
  ``xt[n, d:d+3]`` HBM->VMEM (double-buffered, prefetching step+1 while
  computing step), then accumulates 9 matmuls
  ``[H*nW, (T+2)Cin] @ [(T+2)Cin, T*Cout]`` in f32 and writes the
  [H, W, Cout] output slab.

Backward: custom VJP — dx is the SAME kernel with spatially-flipped,
transposed weights (a k=3 s=1 p=1 conv again); dw falls back to XLA's
standard backward-weights contraction (identical cost to the plain path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _padded_lanes(t: int, c_in: int) -> int:
    """Mosaic requires HBM DMA slices 128-aligned in the minor dim; pad
    (T+2)*Cin up.  NB this erases the direct kernel's FLOP edge over the
    lane-packed XLA path exactly: 128-multiple/(3*Cin) == 2T/3 at T=128/C."""
    lanes = (t + 2) * c_in
    return -(-lanes // 128) * 128


def toeplitz_weights(w: jax.Array, t: int) -> jax.Array:
    """[3,3,3,Cin,Cout] -> [9, pad((T+2)*Cin), T*Cout]; B[3a+b][u,t] = w[a,b,u-t]."""
    c_in, c_out = w.shape[3], w.shape[4]
    e = np.zeros((t + 2, 3, t), np.float32)
    for u in range(t + 2):
        for tt in range(t):
            if 0 <= u - tt <= 2:
                e[u, u - tt, tt] = 1.0
    e = jnp.asarray(e, w.dtype)
    b = jnp.einsum("abdio,udt->abuito", w, e)  # [3,3,T+2,Cin,T,Cout]
    b = b.reshape(9, (t + 2) * c_in, t * c_out)
    pad = _padded_lanes(t, c_in) - (t + 2) * c_in
    return jnp.pad(b, ((0, 0), (0, pad), (0, 0))) if pad else b


def tile_input(x: jax.Array, t: int) -> jax.Array:
    """[N,D,H,W,Cin] -> overlapping W-tiles [N,D+2,H+2,nW,pad((T+2)*Cin)]."""
    n, d, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    tiles = [xp[:, :, :, j * t:j * t + t + 2, :] for j in range(wd // t)]
    xt = jnp.stack(tiles, axis=3)  # [N, D+2, H+2, nW, T+2, Cin]
    xt = xt.reshape(n, d + 2, h + 2, wd // t, (t + 2) * c)
    pad = _padded_lanes(t, c) - (t + 2) * c
    if pad:
        xt = jnp.pad(xt, ((0, 0),) * 4 + ((0, pad),))
    return xt


def _kernel(xt_hbm, b_ref, out_ref, slab, sems, *, h: int, n_w: int,
            t: int, c_out: int, out_dtype):
    n_i = pl.program_id(0)
    d_i = pl.program_id(1)
    n_d = pl.num_programs(1)
    step = n_i * n_d + d_i
    total = pl.num_programs(0) * n_d
    slot = jax.lax.rem(step, 2)

    def copy(dst_slot, src_n, src_d):
        return pltpu.make_async_copy(
            xt_hbm.at[src_n, pl.ds(src_d, 3)],
            slab.at[dst_slot],
            sems.at[dst_slot],
        )

    @pl.when(step == 0)
    def _():
        copy(0, n_i, d_i).start()

    nxt = step + 1

    @pl.when(nxt < total)
    def _():
        copy(jax.lax.rem(nxt, 2), nxt // n_d, jax.lax.rem(nxt, n_d)).start()

    copy(slot, n_i, d_i).wait()

    acc = None
    for a in range(3):
        for bb in range(3):
            lhs = slab[slot, a, pl.ds(bb, h)]          # [H, nW, (T+2)Cin]
            lhs = lhs.reshape(h * n_w, -1)
            part = jnp.dot(lhs, b_ref[a * 3 + bb],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    # Keep the packed [H, nW, T*Cout] layout (lane dim stays 128): Mosaic
    # cannot retile a 128-lane vector down to Cout lanes in-register; the
    # unpack to [H, W, Cout] is a contiguous XLA reshape outside the kernel.
    out_ref[0, 0] = acc.reshape(h, n_w, t * c_out).astype(out_dtype)


@functools.partial(jax.jit, static_argnums=(2,))
def _pallas_conv_fwd(xt: jax.Array, b: jax.Array,
                     dims: Tuple[int, int, int, int, int, int]) -> jax.Array:
    n, d, h, wd, c_out, t = dims
    n_w = wd // t
    kern = functools.partial(_kernel, h=h, n_w=n_w, t=t, c_out=c_out,
                             out_dtype=xt.dtype)
    slab_shape = (2, 3, h + 2, n_w, xt.shape[-1])
    return pl.pallas_call(
        kern,
        grid=(n, d),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # xt stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Toeplitz weights
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, n_w, t * c_out),
            lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, d, h, n_w, t * c_out), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM(slab_shape, xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=18 * n * d * h * n_w * xt.shape[-1] * t * c_out,
            bytes_accessed=xt.size * xt.dtype.itemsize * 3,
            transcendentals=0,
        ),
    )(xt, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_conv3d(x: jax.Array, w: jax.Array, t: int) -> jax.Array:
    """k=3, stride 1, padding 1 direct conv; x [N,D,H,W,Cin], W % t == 0."""
    return _run(x, w, t)


def _run(x, w, t):
    n, d, h, wd, _ = x.shape
    c_out = w.shape[4]
    xt = tile_input(x, t)
    b = toeplitz_weights(w, t)
    y = _pallas_conv_fwd(xt, b, (n, d, h, wd, c_out, t))
    # [N, D, H, nW, T*Cout] -> [N, D, H, W, Cout] (contiguous unpack).
    return y.reshape(n, d, h, wd, c_out)


def _fwd(x, w, t):
    return _run(x, w, t), (x, w)


def _bwd(t, res, g):
    x, w = res
    # dx: conv of g with spatially-flipped, in/out-transposed weights.
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _run(g, w_flip, t)
    # dw: XLA backward-weights contraction (batch<->feature swap trick).
    x_t = jnp.transpose(x, (4, 1, 2, 3, 0))   # [Cin, D, H, W, N]
    g_t = jnp.transpose(g, (1, 2, 3, 0, 4))   # [D, H, W, N, Cout]
    dw = lax.conv_general_dilated(
        x_t, g_t, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=w.dtype,
    )                                          # [Cin, 3, 3, 3, Cout]
    dw = jnp.transpose(dw, (1, 2, 3, 0, 4)).astype(w.dtype)
    return dx.astype(x.dtype), dw


pallas_conv3d.defvjp(_fwd, _bwd)
