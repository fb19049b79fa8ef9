"""Attention op lowering equivalence: einsum vs chunked vs Pallas
(interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gan3d_tpu.ops.attention import (
    attention_chunked,
    attention_einsum,
    pooled_attention,
)

RNG = np.random.default_rng(5)


def _qkv(n=2, L=512, m=64, c=32):
    q = jnp.asarray(RNG.normal(size=(n, L, c)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(n, m, c)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(n, m, c)).astype(np.float32))
    return q, k, v


def test_chunked_matches_einsum():
    q, k, v = _qkv(L=2048)
    ref = attention_einsum(q, k, v)
    out = attention_chunked(q, k, v, chunk=512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-4)


def test_pallas_forward_matches_einsum_interpret():
    from gan3d_tpu.ops.pallas_attention import pallas_pooled_attention

    q, k, v = _qkv(L=512, m=64)
    ref = attention_einsum(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_pooled_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-4)


def test_pallas_grad_matches_einsum_interpret():
    from gan3d_tpu.ops.pallas_attention import pallas_pooled_attention

    q, k, v = _qkv(L=512, m=64, c=16)

    def loss_ref(q, k, v):
        return jnp.sum(attention_einsum(q, k, v) ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(pallas_pooled_attention(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_pal, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3, err_msg=name)


def test_dispatcher_default_cpu():
    q, k, v = _qkv(L=256, m=32)
    out = pooled_attention(q, k, v)
    ref = attention_einsum(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_grad_bf16_matches_f32_einsum_interpret():
    """The backward kernel feeds the MXU matmul inputs in the CALLER's
    dtype (bf16 on the production policy); grads must stay within bf16
    rounding of the f32 einsum reference."""
    from gan3d_tpu.ops.pallas_attention import pallas_pooled_attention

    q = jnp.asarray(RNG.normal(size=(2, 512, 16)), jnp.bfloat16)
    k = jnp.asarray(RNG.normal(size=(2, 64, 16)), jnp.bfloat16)
    v = jnp.asarray(RNG.normal(size=(2, 64, 16)), jnp.bfloat16)

    def loss_pal(q, k, v):
        return jnp.sum(pallas_pooled_attention(q, k, v).astype(jnp.float32)
                       ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_einsum(q.astype(jnp.float32),
                                        k.astype(jnp.float32),
                                        v.astype(jnp.float32)) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_pal, g_ref, "qkv"):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
        assert rel < 2e-2, (name, rel)
