"""Train-state pytree: everything the fused step reads and writes.

Single pytree {step, G/D params+state+opt, EMA, pl_mean} — the TPU analog of
the reference's checkpoint dict (trainer.py:153-163). Model variable state
(g_state / d_state) carries the `batch_stats` and `spectral` collections;
like the reference's train-mode forwards, both are updated on *every*
forward of the owning network, including when it is frozen during the other
network's step.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.struct
import jax
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


class AdamB1ZeroState(NamedTuple):
    count: jnp.ndarray  # scalar int32
    nu: Any             # second-moment tree


def _scale_by_adam_b1zero(b2: float,
                          eps: float = 1e-8) -> optax.GradientTransformation:
    """optax.scale_by_adam specialized to b1 == 0.

    With b1 = 0 the first moment is the gradient itself (mu = (1-b1)g +
    b1*mu = g, and its bias correction 1 - 0^t = 1), so storing/updating mu
    is pure waste: one param-sized fp32 tree per network of HBM, optimizer
    read/write traffic, and checkpoint bytes. The math below mirrors optax's
    op order exactly (nu update, bias correction, sqrt, eps placement), so
    updates are bit-identical to optax.adam(b1=0) — pinned by
    tests/test_optimizer.py.
    """

    def init(params):
        return AdamB1ZeroState(count=jnp.zeros([], jnp.int32),
                               nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        nu = jax.tree.map(lambda g, n: (1 - b2) * (g * g) + b2 * n,
                          grads, state.nu)
        count = optax.safe_increment(state.count)
        bc2 = 1 - b2 ** count
        updates = jax.tree.map(
            lambda g, n: g / (jnp.sqrt(n / bc2.astype(n.dtype)) + eps),
            grads, nu)
        return updates, AdamB1ZeroState(count=count, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(lr: float, b1: float, b2: float,
                   mu_free: bool = True) -> optax.GradientTransformation:
    """Adam with the reference betas (trainer.py:77-78: (0., 0.9)).

    b1 == 0 (the reference default for every family) takes the mu-free
    specialization above; any other b1 falls back to optax.adam.
    ``mu_free=False`` forces plain optax.adam even at b1 == 0 — bit-
    identical updates, but the optimizer carries the (inert) mu tree.
    Escape hatch for this env's remote compile helper: the mu-free HLO
    pushes the 128^3 plain-conv split program over the helper's memory
    ceiling (bisected in docs/PERF.md session 8; moot on the 128^3
    default path, whose boundary rewrite compiles fine)."""
    if b1 == 0.0 and mu_free:
        return optax.chain(_scale_by_adam_b1zero(b2, eps=1e-8),
                           optax.scale(-lr))
    return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=1e-8)
