"""GAN losses.

Reference:
- hinge D loss: ReLU(1 - D(x)).mean() + ReLU(1 + D(G(z))).mean()
  (trainer.py:228-230); G loss is -D(G(z)).mean() for both hinge and WGAN
  (trainer.py:272).
- WGAN D loss: D(G(z)).mean() - D(x).mean() (trainer.py:240-243); the
  gradient penalty exists but is commented out in the reference
  (trainer.py:242) — here it is an opt-in `gp_weight`.
- StyleGAN2 softplus losses live in gan3d_tpu.models.stylegan.loss.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def d_hinge(d_real: jax.Array, d_fake: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Returns (errD_real, errD_fake) per the reference's bookkeeping."""
    err_real = jnp.mean(jax.nn.relu(1.0 - d_real))
    err_fake = jnp.mean(jax.nn.relu(1.0 + d_fake))
    return err_real, err_fake


def d_wgan(d_real: jax.Array, d_fake: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """WGAN: errD = mean D(fake) - mean D(real); returns the two means
    (reference logs D(x) and D(G(z)) rather than the hinge terms)."""
    return jnp.mean(d_real), jnp.mean(d_fake)


def g_adversarial(d_fake: jax.Array) -> jax.Array:
    """-mean D(G(z)) — used by both WGAN and hinge G steps."""
    return -jnp.mean(d_fake)


def gradient_penalty(d_apply: Callable[[jax.Array], jax.Array],
                     real: jax.Array, fake: jax.Array,
                     key: jax.Array, weight: float = 10.0) -> jax.Array:
    """WGAN-GP: ((||grad_x D(x_interp)|| - 1)^2).mean() * weight
    (reference: trainer.py:177-197, dormant)."""
    alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1, 1), real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake

    def scalar_d(x):
        return jnp.sum(d_apply(x))

    grads = jax.grad(scalar_d)(interp)
    norms = jnp.sqrt(jnp.sum(jnp.square(
        grads.reshape(grads.shape[0], -1).astype(jnp.float32)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0)) * weight
