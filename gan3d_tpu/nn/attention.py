"""SAGAN-style 3D self-attention with max-pooled keys/values.

Reference: utils.py:22-45 — 1x1x1 convs f/g/h to ch//8 (g, h max-pooled 2x so
KV length is DHW/8), softmax(f^T g), output conv v back to ch, learnable
scalar gamma initialized to 0, residual add. At its largest placement (32^3
in the BigGAN G) this is a 32,768-query x 4,096-key attention (SURVEY §5.7).

The matmuls are batched einsums that map directly onto the MXU; scores are
accumulated and softmaxed in float32. A Pallas blockwise (flash-style)
variant that never materializes the full score matrix in HBM is available in
`gan3d_tpu.ops.pallas_attention` and used automatically for large grids.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan3d_tpu.nn.layers import SNConv3d
from gan3d_tpu.ops.conv3d import max_pool3d

Dtype = Any


class SelfAttention3d(nn.Module):
    """Non-local block over voxel grids (always spectrally normalized —
    the reference's Attention never passes the sngan flag: utils.py:29-32)."""

    ch: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        ch_ = self.ch // 8
        n, d, h, w, _ = x.shape
        L = d * h * w

        conv = lambda name: SNConv3d(  # noqa: E731
            ch_, kernel_size=1, padding=0, use_bias=False, name=name,
            dtype=self.dtype, param_dtype=self.param_dtype)

        f = conv("f")(x, update_stats)                       # [N,D,H,W,c]
        g = max_pool3d(conv("g")(x, update_stats), 2)        # [N,D/2,H/2,W/2,c]
        v_in = max_pool3d(conv("h")(x, update_stats), 2)

        f = f.reshape(n, L, ch_)
        g = g.reshape(n, L // 8, ch_)
        v_in = v_in.reshape(n, L // 8, ch_)

        # softmax(Q K^T) V — Pallas blockwise kernel on TPU for large grids,
        # chunked/dense XLA otherwise (gan3d_tpu.ops.attention).
        from gan3d_tpu.ops.attention import pooled_attention

        o = pooled_attention(f, g, v_in).astype(f.dtype)

        o = o.reshape(n, d, h, w, ch_)
        o = SNConv3d(self.ch, kernel_size=1, padding=0, use_bias=False,
                     name="v", dtype=self.dtype,
                     param_dtype=self.param_dtype)(o, update_stats)
        gamma = self.param("gamma", nn.initializers.zeros, (), self.param_dtype)
        return gamma.astype(x.dtype) * o + x
