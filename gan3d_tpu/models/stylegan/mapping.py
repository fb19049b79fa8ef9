"""StyleGAN2 mapping network (reference: stylegan.py:329-392).

8-layer MLP z(512) -> w(512), lrelu, lr_multiplier 0.01; input normalized by
its 2nd moment; `w_avg` moving-average buffer (beta 0.995) lives in the
``moving`` collection. NB the reference's forward defaults
skip_w_avg_update=True and no call site ever unsets it, so w_avg never
actually updates during reference training; we keep that default but the
update path works when requested (pass update_w_avg=True with ``moving``
mutable). Truncation trick supported for sampling.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan3d_tpu.models.stylegan.layers import (
    FullyConnectedLayer,
    normalize_2nd_moment,
)

Dtype = Any


class MappingNetwork(nn.Module):
    z_dim: int = 512
    w_dim: int = 512
    num_ws: Optional[int] = None
    num_layers: int = 8
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.995
    activation: str = "lrelu"
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, truncation_psi: float = 1.0,
                 truncation_cutoff: Optional[int] = None,
                 update_w_avg: bool = False) -> jax.Array:
        x = normalize_2nd_moment(z.reshape(z.shape[0], -1)
                                 .astype(jnp.float32))
        for idx in range(self.num_layers):
            x = FullyConnectedLayer(self.w_dim, activation=self.activation,
                                    lr_multiplier=self.lr_multiplier,
                                    name=f"fc{idx}",
                                    param_dtype=self.param_dtype)(x)

        w_avg = None
        if self.num_ws is not None and self.w_avg_beta is not None:
            w_avg = self.variable("moving", "w_avg",
                                  lambda: jnp.zeros((self.w_dim,), jnp.float32))
            if update_w_avg and not self.is_initializing():
                mean_w = jax.lax.stop_gradient(jnp.mean(x, axis=0))
                # torch lerp(a, b, t) = a + t (b - a) with a=batch mean,
                # b=w_avg, t=beta (reference stylegan.py:377)
                w_avg.value = mean_w + self.w_avg_beta * (w_avg.value - mean_w)

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1.0:
            assert w_avg is not None
            wa = w_avg.value
            truncated = wa + truncation_psi * (x - wa)
            if self.num_ws is None or truncation_cutoff is None:
                x = truncated
            else:
                idx = jnp.arange(self.num_ws)[None, :, None]
                x = jnp.where(idx < truncation_cutoff, truncated, x)
        return x
