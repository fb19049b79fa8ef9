"""Blockwise Pallas TPU kernel for pooled-KV attention, with custom VJP.

Shapes: Q [N, L, c], K/V [N, M, c] with M = L/8 and small c (ch/8); at the
BigGAN 32^3 placement L=32768, M=4096, c=16..64. K and V for one sample fit
comfortably in VMEM (M*c*4B ≤ 1 MB), so each grid step processes one query
block against the FULL key set — a single softmax pass, no online-softmax
bookkeeping — and the [L, M] score matrix only ever exists one
[BLOCK_Q, M] tile at a time in VMEM.

Forward grid: (N, L / BLOCK_Q). Backward reuses the same tiling; dK/dV are
accumulated across query blocks into a revisited output block (zeroed on the
first grid step along the query axis).

All matmuls accumulate in float32 on the MXU (preferred_element_type);
inputs may be bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]                                   # [BQ, c]
    k = k_ref[0]                                   # [M, c]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [BQ, M]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    # Normalize AFTER the PV matmul: o = (p/denom)@v == (p@v)/denom, and
    # dividing the [BQ, c] output beats dividing the [BQ, M] tile (the
    # kernel is VPU/softmax-bound, not MXU-bound, at c = ch/8).
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _fwd(q, k, v):
    n, L, c = q.shape
    m = k.shape[1]
    bq = min(BLOCK_Q, L)
    grid = (n, L // bq)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    j = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # Matmul-input dtype follows the caller's dtype: bf16 activations keep
    # the MXU on its fast path (f32 MXU inputs run ~8x slower); f32 callers
    # (tests, fp32 runs) keep full precision. Accumulation is always f32.
    mmt = q.dtype

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)                                  # [BQ, M] fp32
    inv_d = 1.0 / jnp.sum(e, axis=-1, keepdims=True)     # [BQ, 1]

    # Softmax algebra with the 1/denom row-scale folded OUT of the [BQ, M]
    # tiles and into the [BQ, c] operands (exact):
    #   p = e*inv_d;  dsum = sum(dp*p) = sum(dp*e)*inv_d
    #   ds = p*(dp - dsum) = inv_d * t,  t := e*(dp - dsum)
    #   dq = ds@k = inv_d*(t@k);  dk = ds^T@q = t^T@(q*inv_d)
    #   dv = p^T@do = e^T@(do*inv_d)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [BQ, M]
    dsum = jnp.sum(dp * e, axis=-1, keepdims=True) * inv_d
    t = (e * (dp - dsum)).astype(mmt)                    # [BQ, M]
    eb = e.astype(mmt)

    dq = jax.lax.dot_general(t, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * inv_d).astype(dq_ref.dtype)

    q_s = (q.astype(jnp.float32) * inv_d).astype(mmt)    # [BQ, c]
    do_s = (do.astype(jnp.float32) * inv_d).astype(mmt)
    dk_blk = jax.lax.dot_general(t, q_s, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [M, c]
    dv_blk = jax.lax.dot_general(eb, do_s, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_blk.astype(dk_ref.dtype)
    dv_ref[0] += dv_blk.astype(dv_ref.dtype)


def _bwd(q, k, v, do):
    n, L, c = q.shape
    m = k.shape[1]
    # The backward keeps three [bq, m] fp32 tiles (p, dp, ds) plus
    # c-dependent matmul scratch in VMEM; shrink bq to stay under the ~16 MB
    # scoped limit. Empirical fit points: (m=4096, c=16, bq=256) OK;
    # (m=4096, c=32, bq=128) over by 0.15 MB -> use 64.
    if m >= 4096:
        bq = 128 if c <= 16 else 64
    elif m >= 2048:
        bq = 256 if c <= 32 else 128
    else:
        bq = BLOCK_Q
    bq = min(bq, L)
    grid = (n, L // bq)
    qspec = pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[qspec, kspec, kspec, qspec],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((n, m, c), jnp.float32),
            jax.ShapeDtypeStruct((n, m, c), jnp.float32),
        ),
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@jax.custom_vjp
def pallas_pooled_attention(q: jax.Array, k: jax.Array, v: jax.Array
                            ) -> jax.Array:
    return _fwd(q, k, v)


def _vjp_fwd(q, k, v):
    return _fwd(q, k, v), (q, k, v)


def _vjp_bwd(res, do):
    q, k, v = res
    return _bwd(q, k, v, do)


pallas_pooled_attention.defvjp(_vjp_fwd, _vjp_bwd)
