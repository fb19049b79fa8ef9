"""Normalization layers.

- BatchNorm3d: torch nn.BatchNorm3d semantics (biased variance for
  normalization, unbiased for the running-stat update, momentum 0.1) with an
  optional ``axis_name`` for cross-replica statistics under shard_map. Under
  plain jit-SPMD the batch axis is global, so statistics are synchronized by
  construction; the reference's nn.DataParallel computes them per replica
  (SURVEY §5.8) — per-replica behavior is available via shard_map with
  axis_name=None.
- LayerNormVolume: torch nn.LayerNorm over [C, D, H, W] — per-sample
  normalization over every non-batch axis with a full-shape affine, as used
  by the WGAN DCGAN discriminator (reference: dcgan.py:162-178).

Statistics are accumulated in AT LEAST float32 regardless of compute dtype:
bf16/f16 inputs are promoted to f32 (the TPU mixed-precision contract), and
f64 inputs stay f64 (a hard f32 cast here would silently destroy float64
runs — exercised by tests/test_behavioral_parity.py's strict-parity mode).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _stat_dtype(x: jax.Array):
    """The dtype statistics are accumulated in: at least float32."""
    return jnp.promote_types(x.dtype, jnp.float32)


class BatchNorm3d(nn.Module):
    """BatchNorm with three statistics scopes:

    - num_groups=1 (default): statistics over the full (global) batch — under
      jit-SPMD this is synchronized BN by construction;
    - num_groups=G > 1: statistics per contiguous batch group of N/G samples
      with no cross-group reduction — the TPU-native expression of the
      reference's per-replica nn.DataParallel BN (cfg.sync_bn=False sets
      G = number of devices); XLA keeps the reduction local to each shard.
      Running stats update with the group-mean of group statistics. (NB the
      reference under DataParallel ngpu>1 silently never updates running
      stats at all — replica buffer updates are discarded by torch.)
    - axis_name: explicit cross-replica pmean for shard_map contexts.
    """

    features: int
    momentum: float = 0.1          # torch convention: ra += m * (batch - ra)
    eps: float = 1e-5
    use_scale_bias: bool = True
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros
    axis_name: Optional[str] = None
    num_groups: int = 1
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = False
                 ) -> jax.Array:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))

        sdt = _stat_dtype(x)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            y = (x.astype(sdt) - mean) * jax.lax.rsqrt(var + self.eps)
        elif self.num_groups > 1 and x.shape[0] % self.num_groups == 0:
            g = self.num_groups
            n, d, h, w, c = x.shape
            x32 = x.astype(sdt).reshape(g, n // g, d, h, w, c)
            mean = jnp.mean(x32, axis=(1, 2, 3, 4), keepdims=True)  # [g,...]
            mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2, 3, 4),
                               keepdims=True)
            var = mean_sq - jnp.square(mean)
            y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
            y = y.reshape(n, d, h, w, c)
            if not self.is_initializing():
                cnt = (n // g) * d * h * w
                unbiased = var * (cnt / max(cnt - 1, 1))
                m = self.momentum
                ra_mean.value = ((1 - m) * ra_mean.value
                                 + m * jnp.mean(mean, axis=0).reshape(c)
                                 ).astype(ra_mean.value.dtype)
                ra_var.value = ((1 - m) * ra_var.value
                                + m * jnp.mean(unbiased, axis=0).reshape(c)
                                ).astype(ra_var.value.dtype)
        else:
            x32 = x.astype(sdt)
            n = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
            mean = jnp.mean(x32, axis=(0, 1, 2, 3))
            mean_sq = jnp.mean(jnp.square(x32), axis=(0, 1, 2, 3))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = mean_sq - jnp.square(mean)  # biased: used for normalization
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = ((1 - m) * ra_mean.value + m * mean
                                 ).astype(ra_mean.value.dtype)
                ra_var.value = ((1 - m) * ra_var.value + m * unbiased
                                ).astype(ra_var.value.dtype)
            y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)

        if self.use_scale_bias:
            scale = self.param("scale", self.scale_init, (self.features,),
                               self.param_dtype)
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            y = y * scale.astype(sdt) + bias.astype(sdt)
        return y.astype(x.dtype)


class LayerNormVolume(nn.Module):
    """Per-sample LayerNorm over all of (D, H, W, C) with full-shape affine.

    Equivalent to torch nn.LayerNorm([C, D, H, W]) on NCDHW input; here the
    affine parameters have shape (D, H, W, C).
    """

    shape: Tuple[int, int, int, int]  # (D, H, W, C)
    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, self.shape,
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, self.shape,
                          self.param_dtype)
        sdt = _stat_dtype(x)
        x32 = x.astype(sdt)
        mean = jnp.mean(x32, axis=(1, 2, 3, 4), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3, 4), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale.astype(sdt) + bias.astype(sdt)
        return y.astype(x.dtype)
