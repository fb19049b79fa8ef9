#!/usr/bin/env python
"""Isolate which Pallas construct the axon remote-compile helper rejects.

The dW kernel (ops/dw_conv.py) and the wide-N conv (ops/wide_conv.py) both
fail on the real chip with an opaque `tpu_compile_helper subprocess exit
code 1` (HTTP 500), while the Pallas attention kernel compiles fine.  The
Mosaic diagnostic stays on the far side of the relay, so this script
compiles a ladder of tiny kernels, each adding one construct those kernels
use, and reports OK/FAIL per rung.  Run on the TPU (one process at a time).
"""
import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = jax.jit(fn)()
        jax.block_until_ready(out)
        val = float(np.asarray(jax.device_get(jnp.ravel(out)[0]), dtype=np.float32))
        print(f"{name:28s} OK   ({val:.3f})", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = str(e).replace("\n", " | ")[:300]
        print(f"{name:28s} FAIL {type(e).__name__}: {msg}", flush=True)
        if "--trace" in sys.argv:
            traceback.print_exc()
        return False


X = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 8, 32)),
                dtype=jnp.bfloat16)


# 1. plain pipelined copy (sanity — the attention kernel's pattern)
def k_copy(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def t_copy():
    return pl.pallas_call(
        k_copy, grid=(2,),
        in_specs=[pl.BlockSpec((1, 8, 8, 8, 32), lambda i: (i, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 8, 8, 32), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
    )(X)


# 2. manual DMA from an ANY-space ref into VMEM scratch
def k_dma(x_any, o_ref, slab, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(x_any.at[i], slab, sem)
    cp.start()
    cp.wait()
    o_ref[0] = slab[...]


def t_dma():
    return pl.pallas_call(
        k_dma, grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 8, 8, 32), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
        scratch_shapes=[pltpu.VMEM((8, 8, 8, 32), X.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )(X)


# 3. double-buffered DMA with computed slot + partial (pl.ds) source slices
def k_dma2(x_any, o_ref, slab, sems):
    i = pl.program_id(0)
    slot = lax.rem(i, 2)

    def copy(dst_slot, s):
        return pltpu.make_async_copy(
            x_any.at[s, pl.ds(0, 6), pl.ds(0, 6)], slab.at[dst_slot],
            sems.at[dst_slot])

    @pl.when(i == 0)
    def _():
        copy(0, i).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        copy(lax.rem(i + 1, 2), i + 1).start()

    copy(slot, i).wait()
    o_ref[0] = slab[slot]


def t_dma2():
    return pl.pallas_call(
        k_dma2, grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 6, 6, 8, 32), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 6, 6, 8, 32), X.dtype),
        scratch_shapes=[pltpu.VMEM((2, 6, 6, 8, 32), X.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )(X)


# 4. lane-dim concat of 27 shifted lax.slice views (the rhs build)
def k_concat(x_ref, o_ref):
    sl = x_ref[0]  # [8, 8, 8, 32]
    views = []
    for t in range(27):
        kd, kh, kw = t // 9, (t // 3) % 3, t % 3
        v = lax.slice(sl, (kd, kh, kw, 0), (kd + 6, kh + 6, kw + 6, 32))
        views.append(v.reshape(216, 32))
    o_ref[...] = jnp.concatenate(views, axis=1)


def t_concat():
    return pl.pallas_call(
        k_concat, grid=(2,),
        in_specs=[pl.BlockSpec((1, 8, 8, 8, 32), lambda i: (i, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((216, 27 * 32), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((216, 27 * 32), X.dtype),
    )(X)


# 5. the wide dot: [216, 32]^T-contract -> [32, 864], f32 accum out
def k_dot(x_ref, o_ref):
    sl = x_ref[0]
    views = []
    for t in range(27):
        kd, kh, kw = t // 9, (t // 3) % 3, t % 3
        v = lax.slice(sl, (kd, kh, kw, 0), (kd + 6, kh + 6, kw + 6, 32))
        views.append(v.reshape(216, 32))
    rhs = jnp.concatenate(views, axis=1)
    lhs = views[0]
    part = lax.dot_general(lhs, rhs, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = part

    @pl.when(i != 0)
    def _():
        o_ref[...] += part


def t_dot():
    return pl.pallas_call(
        k_dot, grid=(2,),
        in_specs=[pl.BlockSpec((1, 8, 8, 8, 32), lambda i: (i, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((32, 27 * 32), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((32, 27 * 32), jnp.float32),
    )(X)


# 6. dma2 + concat + dot together (the dW kernel skeleton, no halo math)
def k_full(x_any, o_ref, slab, sems):
    i = pl.program_id(0)
    slot = lax.rem(i, 2)

    def copy(dst_slot, s):
        return pltpu.make_async_copy(x_any.at[s], slab.at[dst_slot],
                                     sems.at[dst_slot])

    @pl.when(i == 0)
    def _():
        copy(0, i).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        copy(lax.rem(i + 1, 2), i + 1).start()

    copy(slot, i).wait()
    sl = slab[slot]
    views = []
    for t in range(27):
        kd, kh, kw = t // 9, (t // 3) % 3, t % 3
        v = lax.slice(sl, (kd, kh, kw, 0), (kd + 6, kh + 6, kw + 6, 32))
        views.append(v.reshape(216, 32))
    rhs = jnp.concatenate(views, axis=1)
    part = lax.dot_general(views[0], rhs, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        o_ref[...] = part

    @pl.when(i != 0)
    def _():
        o_ref[...] += part


def t_full():
    return pl.pallas_call(
        k_full, grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((32, 27 * 32), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((32, 27 * 32), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 8, 8, 8, 32), X.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )(X)


# 3a. static DMA into a dynamic slab slot (destination .at[computed])
def k_dslot(x_any, o_ref, slab, sems):
    i = pl.program_id(0)
    slot = lax.rem(i, 2)
    cp = pltpu.make_async_copy(x_any.at[i], slab.at[slot], sems.at[slot])
    cp.start()
    cp.wait()
    o_ref[0] = slab[slot]


def t_dslot():
    return pl.pallas_call(
        k_dslot, grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 8, 8, 32), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
        scratch_shapes=[pltpu.VMEM((2, 8, 8, 8, 32), X.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )(X)


# 3b. pl.when-guarded start + separate wait (the prefetch shape, one slot)
def k_when(x_any, o_ref, slab, sem):
    i = pl.program_id(0)

    def copy(s):
        return pltpu.make_async_copy(x_any.at[s], slab, sem)

    @pl.when(i >= 0)
    def _():
        copy(i).start()

    copy(i).wait()
    o_ref[0] = slab[...]


def t_when():
    return pl.pallas_call(
        k_when, grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 8, 8, 32), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
        scratch_shapes=[pltpu.VMEM((8, 8, 8, 32), X.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )(X)


# 3c. partial (pl.ds) source slices from HBM, static slot
def k_pds(x_any, o_ref, slab, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(x_any.at[i, pl.ds(0, 6), pl.ds(0, 6)],
                               slab, sem)
    cp.start()
    cp.wait()
    o_ref[0] = slab[...]


def t_pds():
    return pl.pallas_call(
        k_pds, grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 6, 6, 8, 32), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 6, 6, 8, 32), X.dtype),
        scratch_shapes=[pltpu.VMEM((6, 6, 8, 32), X.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )(X)


# 3d. pl.ds source slices at an UNALIGNED offset (the kw-shift copies the
# rewrite plan relies on: HBM source, element-addressed)
def k_pds_off(x_any, o_ref, slab, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        x_any.at[i, pl.ds(1, 6), pl.ds(1, 6), pl.ds(2, 6)], slab, sem)
    cp.start()
    cp.wait()
    o_ref[0] = slab[...]


def t_pds_off():
    return pl.pallas_call(
        k_pds_off, grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 6, 6, 6, 32), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 6, 6, 6, 32), X.dtype),
        scratch_shapes=[pltpu.VMEM((6, 6, 6, 32), X.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )(X)


# 7. cost_estimate attached (the only remaining difference vs ops/dw_conv)
def t_cost():
    return pl.pallas_call(
        k_copy, grid=(2,),
        in_specs=[pl.BlockSpec((1, 8, 8, 8, 32), lambda i: (i, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 8, 8, 32), lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
        cost_estimate=pl.CostEstimate(flops=1000, bytes_accessed=X.size * 2,
                                      transcendentals=0),
    )(X)


if __name__ == "__main__":
    print(f"# backend={jax.default_backend()}")
    results = {}
    for name, fn in [("copy", t_copy), ("cost_estimate", t_cost),
                     ("manual_dma", t_dma), ("dma_dyn_slot", t_dslot),
                     ("dma_when_guard", t_when), ("dma_pds_src", t_pds),
                     ("dma_pds_src_offset", t_pds_off),
                     ("dma_double_buffer", t_dma2),
                     ("lane_concat27", t_concat), ("wide_dot_accum", t_dot),
                     ("dw_skeleton", t_full)]:
        results[name] = run(name, fn)
    sys.exit(0 if all(results.values()) else 1)
