"""The fused jitted train step: iterD D-updates + 1 G-update per call.

The reference dispatches each op eagerly under CUDA AMP (trainer.py:296-313);
here the whole iteration — including noise sampling, both model forwards,
backwards, optimizer updates, and spectral-norm/BN state updates — is a
single XLA program. Under jit-SPMD with the batch sharded over the `data`
mesh axis, XLA inserts the gradient all-reduce over ICI automatically.

Faithful training-dynamics details (SURVEY §7 hard part 7):
- G's BN/spectral state updates during D-phase forwards and D's spectral
  state updates during the G phase, exactly like torch train-mode forwards
  (trainer.py:208-283).
- D(real) is evaluated before D(fake) within a D step.
- Noise is drawn per D-iteration and once for the G step.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gan3d_tpu.config import Config
from gan3d_tpu.train import losses
from gan3d_tpu.train.state import TrainState
from gan3d_tpu.utils.prng import fold_step
from gan3d_tpu.utils.profiling import scope


def apply_model(model, params, state, *args, rngs=None, **kw):
    """Apply a flax module, threading its mutable collections."""
    variables = {"params": params, **state}
    mut = list(state.keys())
    if mut:
        out, new_state = model.apply(variables, *args, mutable=mut,
                                     rngs=rngs, **kw)
        return out, new_state
    return model.apply(variables, *args, rngs=rngs, **kw), state


def _d_rngs(cfg: Config, key: jax.Array) -> Optional[Dict[str, jax.Array]]:
    return {"crops": key} if cfg.msl else None


def _make_phase_fns(cfg: Config, G, D,
                    g_tx: optax.GradientTransformation,
                    d_tx: optax.GradientTransformation):
    """Shared D-update and G-phase closures used by both the fused step and
    the split (two-program) step — identical key-folding math, so the two
    modes are numerically identical."""
    hinge = cfg.hinge
    gp_weight = getattr(cfg, "gp_weight", 0.0)

    def d_update(state: TrainState, real: jax.Array, key: jax.Array):
        kz, kcrop_f, kcrop_r, kgp = jax.random.split(key, 4)
        noise = jax.random.normal(kz, (real.shape[0], cfg.z_size), jnp.float32)
        # G forward in train mode — no grad, but G state updates.
        with scope("Dgen_forward"):
            fake, g_state = apply_model(G, state.g_params, state.g_state,
                                        noise, train=True, update_stats=True)
        fake = jax.lax.stop_gradient(fake).astype(real.dtype)

        def loss_fn(d_params):
            d_real, d_state = apply_model(D, d_params, state.d_state, real,
                                          rngs=_d_rngs(cfg, kcrop_r))
            d_fake, d_state = apply_model(D, d_params, d_state, fake,
                                          rngs=_d_rngs(cfg, kcrop_f))
            d_real = d_real.astype(jnp.float32)
            d_fake = d_fake.astype(jnp.float32)
            if hinge:
                err_real, err_fake = losses.d_hinge(d_real, d_fake)
                err = err_real + err_fake
            else:
                err_real, err_fake = losses.d_wgan(d_real, d_fake)
                err = err_fake - err_real
                if gp_weight > 0:
                    def d_only(x):
                        out, _ = apply_model(D, d_params, state.d_state, x,
                                             rngs=_d_rngs(cfg, kcrop_r))
                        return out.astype(jnp.float32)
                    err = err + losses.gradient_penalty(d_only, real, fake,
                                                        kgp, gp_weight)
            return err, (d_state, err_real, err_fake)

        with scope("D_backward"):
            grads, (d_state, err_real, err_fake) = jax.grad(
                loss_fn, has_aux=True)(state.d_params)
        updates, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        state = state.replace(g_state=g_state, d_params=d_params,
                              d_state=d_state, d_opt=d_opt)
        return state, (err_real, err_fake)

    def g_phase(state: TrainState, key: jax.Array):
        """One G update; increments the step counter."""
        kz, kcrop = jax.random.split(key)
        noise = jax.random.normal(kz, (cfg.batch_size, cfg.z_size), jnp.float32)

        def loss_fn(g_params):
            fake, g_state = apply_model(G, g_params, state.g_state, noise,
                                        train=True, update_stats=True)
            d_fake, d_state = apply_model(D, state.d_params, state.d_state,
                                          fake, rngs=_d_rngs(cfg, kcrop))
            err = losses.g_adversarial(d_fake.astype(jnp.float32))
            return err, (g_state, d_state, fake)

        with scope("Gmain"):
            (err_g, (g_state, d_state, fake)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.g_params)
        updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        new_state = state.replace(step=state.step + 1, g_params=g_params,
                                  g_state=g_state, d_state=d_state,
                                  g_opt=g_opt)
        return new_state, err_g, jax.lax.stop_gradient(fake)

    return d_update, g_phase


def build_train_step(cfg: Config, G, D,
                     g_tx: optax.GradientTransformation,
                     d_tx: optax.GradientTransformation
                     ) -> Callable[[TrainState, jax.Array, jax.Array],
                                   Tuple[TrainState, Dict[str, jax.Array],
                                         jax.Array]]:
    """Fused step: step_fn(state, reals [iterD, B, R, R, R, 1], base_key)."""
    d_update, g_phase = _make_phase_fns(cfg, G, D, g_tx, d_tx)

    def step_fn(state: TrainState, reals: jax.Array, base_key: jax.Array):
        key = fold_step(base_key, state.step)
        d_metrics = (jnp.float32(0), jnp.float32(0))
        for i in range(cfg.iterD):  # static unroll (iterD is small)
            state, d_metrics = d_update(state, reals[i],
                                        jax.random.fold_in(key, i))
        state, err_g, fake = g_phase(state, jax.random.fold_in(key, 1000))
        metrics = {"d_real": d_metrics[0], "d_fake": d_metrics[1],
                   "g_loss": err_g}
        return state, metrics, fake

    return step_fn


def build_split_steps(cfg: Config, G, D,
                      g_tx: optax.GradientTransformation,
                      d_tx: optax.GradientTransformation):
    """Two smaller programs instead of one fused step (cfg.fused_step=False):
    d_step(state, real [B,...], base_key, i) and g_step(state, base_key).
    Key folding matches the fused step exactly, so results are identical;
    useful when a single fused program overloads the XLA compiler (e.g.
    128^3 with per-block rematerialization)."""
    d_update, g_phase = _make_phase_fns(cfg, G, D, g_tx, d_tx)

    def d_step(state: TrainState, real: jax.Array, base_key: jax.Array,
               i: jax.Array):
        key = fold_step(base_key, state.step)
        state, (err_real, err_fake) = d_update(state, real,
                                               jax.random.fold_in(key, i))
        return state, {"d_real": err_real, "d_fake": err_fake}

    def g_step(state: TrainState, base_key: jax.Array):
        key = fold_step(base_key, state.step)
        state, err_g, fake = g_phase(state, jax.random.fold_in(key, 1000))
        return state, {"g_loss": err_g}, fake

    return d_step, g_step
