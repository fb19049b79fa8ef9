"""Pooled-KV voxel attention op with three lowering strategies.

The SAGAN attention (reference utils.py:34-45) computes
    beta = softmax(Q K^T);  O = beta V
with Q = [N, L, c] voxel queries and K/V = [N, M, c] max-pooled keys/values
(M = L/8). At the 32^3 placement L = 32768, M = 4096 — a dense [L, M] fp32
score matrix is 512 MB per sample, the single largest HBM tensor in
BigGAN-3D training.

Strategies:
- "einsum": dense XLA einsum (small grids; parity baseline)
- "chunked": lax.scan over query blocks — scores never exceed
  [block, M]; differentiable by JAX; works on any backend
- "pallas": blockwise TPU kernel (gan3d_tpu.ops.pallas_attention) with a
  custom VJP; used automatically on TPU for large L

`pooled_attention` picks automatically (overridable via argument).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_CHUNK = 1024
# Pallas wins from the D-block placement up (L=4096, pooled kv=512:
# 4.1 ms fwd+bwd vs einsum 6.2 / chunked 9.3 at batch 16 —
# scripts/bench_attention.py; at the G placement L=32768 it is 3.4-5x).
_PALLAS_MIN_L = 4096

# Global implementation override, read at TRACE time:
#   None  — automatic per-shape choice (Pallas on TPU for large L)
#   "xla" — automatic but never Pallas. Used under spatial (GSPMD) sharding:
#           a Pallas custom call cannot be partitioned by XLA's SPMD
#           partitioner, so spatially-sharded programs must lower attention
#           through plain XLA ops (which GSPMD reshards freely).
#   "einsum" / "chunked" / "pallas" — force that lowering everywhere.
_FORCE_IMPL: Optional[str] = None


def set_attention_impl(impl: Optional[str]) -> None:
    global _FORCE_IMPL
    assert impl in (None, "xla", "einsum", "chunked", "pallas"), impl
    _FORCE_IMPL = impl


def attention_einsum(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    scores = jnp.einsum("nqc,nkc->nqk", q, k,
                        preferred_element_type=jnp.float32)
    beta = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("nqk,nkc->nqc", beta.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@partial(jax.jit, static_argnames=("chunk",))
def attention_chunked(q: jax.Array, k: jax.Array, v: jax.Array,
                      chunk: int = _CHUNK) -> jax.Array:
    """Scan over query blocks; peak scores memory = [N, chunk, M]."""
    n, L, c = q.shape
    if L % chunk:
        return attention_einsum(q, k, v)
    qb = q.reshape(n, L // chunk, chunk, c).transpose(1, 0, 2, 3)

    def body(_, qi):  # qi [N, chunk, c]
        scores = jnp.einsum("nqc,nkc->nqk", qi, k,
                            preferred_element_type=jnp.float32)
        beta = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("nqk,nkc->nqc", beta.astype(q.dtype), v,
                         preferred_element_type=jnp.float32)
        return None, out.astype(q.dtype)

    _, outs = jax.lax.scan(body, None, qb)
    return outs.transpose(1, 0, 2, 3).reshape(n, L, c)


def pooled_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     impl: Optional[str] = None) -> jax.Array:
    """softmax(Q K^T) V over pooled keys/values. q [N,L,c], k/v [N,M,c]."""
    n, L, c = q.shape
    if impl is None and _FORCE_IMPL not in (None, "xla"):
        impl = _FORCE_IMPL
    if impl is None:
        on_tpu = (jax.default_backend() not in ("cpu",)
                  and _FORCE_IMPL != "xla")
        if on_tpu and L >= _PALLAS_MIN_L and L % 256 == 0:
            impl = "pallas"
        elif L > 4 * _CHUNK and L % _CHUNK == 0:
            impl = "chunked"
        else:
            impl = "einsum"
    if impl == "pallas":
        from gan3d_tpu.ops.pallas_attention import pallas_pooled_attention

        return pallas_pooled_attention(q, k, v)
    if impl == "chunked":
        return attention_chunked(q, k, v)
    return attention_einsum(q, k, v)
