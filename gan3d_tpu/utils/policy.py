"""Mixed-precision policy.

Replaces the reference's CUDA AMP (autocast + GradScaler, reference:
trainer.py:80-81, 213, 259). On TPU, bfloat16 shares float32's exponent
range, so no loss scaling is needed — GradScaler intentionally has no
equivalent here (SURVEY §2.2). Params and optimizer state stay float32;
matmul/conv compute runs in bfloat16; losses and normalization statistics
are reduced in float32.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_strings(cls, param: str, compute: str) -> "Policy":
        return cls(param_dtype=jnp.dtype(param), compute_dtype=jnp.dtype(compute))

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.output_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


FP32 = Policy(compute_dtype=jnp.float32)
BF16 = Policy()


def policy_from_config(cfg) -> Policy:
    return Policy.from_strings(cfg.param_dtype, cfg.compute_dtype)
