"""Explicit PRNG threading.

The reference samples ``torch.randn`` ad hoc inside the train loop
(reference: trainer.py:223, 260); JAX requires explicit key threading, which
also makes every run exactly reproducible per (seed, step, stream-name).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_step(key: jax.Array, step: jax.Array | int) -> jax.Array:
    """Derive a per-step key without consuming the base key."""
    return jax.random.fold_in(key, jnp.asarray(step, jnp.uint32))


class PRNG:
    """Stateful convenience wrapper for host-side key management.

    Inside jitted code use `jax.random.split` / `fold_step` directly; this
    class is for the eager training-driver loop (noise for image logging,
    dataset shuffling, etc.).
    """

    def __init__(self, seed: int):
        self._key = jax.random.key(seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def fold(self, data: int) -> jax.Array:
        return jax.random.fold_in(self._key, data)
