"""Train-state pytree: everything the fused step reads and writes.

Single pytree {step, G/D params+state+opt, EMA, pl_mean} — the TPU analog of
the reference's checkpoint dict (trainer.py:153-163). Model variable state
(g_state / d_state) carries the `batch_stats` and `spectral` collections;
like the reference's train-mode forwards, both are updated on *every*
forward of the owning network, including when it is frozen during the other
network's step.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                      # scalar int32
    g_params: Any
    g_state: Any                           # {'batch_stats':…, 'spectral':…}
    g_opt: Any
    d_params: Any
    d_state: Any
    d_opt: Any
    ema_params: Any = None                 # stylegan2 weight_avg
    pl_mean: Optional[jnp.ndarray] = None  # stylegan2 path-length EMA


def make_optimizer(lr: float, b1: float, b2: float) -> optax.GradientTransformation:
    """Adam with the reference betas (trainer.py:77-78: (0., 0.9))."""
    return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=1e-8)
