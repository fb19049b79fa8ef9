#!/usr/bin/env python
"""Probe 2: constructs the DMA-free wide-N FORWARD conv kernel needs.

ops/wide_conv.py wants X27 = [27*Ci, K] built by sublane-concat of views
whose kh/kw shifts slice the loaded block's minor dims.  probe_mosaic.py
proved sublane-dim unaligned VALUE slices compile; this ladder checks the
remaining rungs: lane-dim unaligned value slices, reshape of minor-dim
sliced views (relayout), sublane concat, and the full fwd skeleton with
three D-pre-shifted pipelined inputs.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from scripts.probe_mosaic import run

CI, DD, H, W = 16, 2, 8, 8
# channels-first padded sample: [2, ci, dd, h+2, w+2]
XT = jnp.asarray(
    np.random.default_rng(0).normal(size=(2, CI, DD, H + 2, W + 2)),
    dtype=jnp.bfloat16)
W2 = jnp.asarray(np.random.default_rng(1).normal(size=(8, 27 * CI)),
                 dtype=jnp.bfloat16)


# A. lane-dim unaligned value slice (offset 1, size W from W+2 lanes)
def k_lane(x_ref, o_ref):
    sl = x_ref[0]  # [ci, dd, h+2, w+2]
    v = lax.slice(sl, (0, 0, 0, 1), (CI, DD, H + 2, 1 + W))
    o_ref[0] = v


def t_lane():
    return pl.pallas_call(
        k_lane, grid=(2,),
        in_specs=[pl.BlockSpec((1, CI, DD, H + 2, W + 2),
                               lambda i: (i, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, CI, DD, H + 2, W),
                               lambda i: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, CI, DD, H + 2, W), XT.dtype),
    )(XT)


# B. minor-dim sliced view reshaped to [ci, k] (the relayout collapse)
def k_resh(x_ref, o_ref):
    sl = x_ref[0]
    v = lax.slice(sl, (0, 0, 1, 2), (CI, DD, 1 + H, 2 + W))
    o_ref[...] = v.reshape(CI, DD * H * W)


def t_resh():
    return pl.pallas_call(
        k_resh, grid=(2,),
        in_specs=[pl.BlockSpec((1, CI, DD, H + 2, W + 2),
                               lambda i: (i, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((CI, DD * H * W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CI, DD * H * W), XT.dtype),
    )(XT)


# C. the full fwd skeleton: 27 sublane-concat views -> [27ci, k] -> dot
def k_fwd(w2_ref, x0_ref, x1_ref, x2_ref, o_ref):
    xtr = (x0_ref, x1_ref, x2_ref)
    k = DD * H * W
    views = []
    for t in range(27):
        kd, kh, kw = t // 9, (t // 3) % 3, t % 3
        sl = xtr[kd][0]  # [ci, dd, h+2, w+2]
        v = lax.slice(sl, (0, 0, kh, kw), (CI, DD, kh + H, kw + W))
        views.append(v.reshape(CI, k))
    x27 = jnp.concatenate(views, axis=0)  # [27ci, k] sublane concat
    val = lax.dot_general(w2_ref[...], x27, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    o_ref[0] = val.astype(XT.dtype)


def t_fwd():
    spec = pl.BlockSpec((1, CI, DD, H + 2, W + 2), lambda i: (i, 0, 0, 0, 0))
    return pl.pallas_call(
        k_fwd, grid=(2,),
        in_specs=[pl.BlockSpec((8, 27 * CI), lambda i: (0, 0)),
                  spec, spec, spec],
        out_specs=pl.BlockSpec((1, 8, DD * H * W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 8, DD * H * W), XT.dtype),
    )(W2, XT, XT, XT)


if __name__ == "__main__":
    print(f"# backend={jax.default_backend()}")
    ok = True
    for name, fn in [("lane_value_slice", t_lane),
                     ("minor_slice_reshape", t_resh),
                     ("wide_fwd_skeleton", t_fwd)]:
        ok = run(name, fn) and ok
    sys.exit(0 if ok else 1)
