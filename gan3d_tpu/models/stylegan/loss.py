"""StyleGAN2 loss + fused train step.

Reference: stylegan.py:6-99 (StyleGAN2Loss) driven by trainer.py:214-220 /
262-269. Semantics reproduced:

- non-saturating softplus losses: D minimizes softplus(D(fake)) +
  softplus(-D(real)); G minimizes softplus(-D(fake));
- style mixing with prob 0.9: a random cutoff in [1, num_ws) swaps the tail
  ws for a second mapping pass (stylegan.py:25-29);
- lazy R1 on real images every 16 D-steps, gamma=10 (stylegan.py:41-64),
  with the reference's axis quirk: the penalty sums grad^2 over the torch
  dims [1,2,3] = (C, D, H) — NOT W — then broadcasts against [N,1] logits
  before the mean (stylegan.py:63-67);
- path-length regularization every 16 G-steps, pl_weight=2, decay 0.01,
  batch shrink 2; pl_noise scaled by 1/sqrt(D*H) (the reference's 2D
  heritage — stylegan.py:86);
- **create_graph=False faithfulness**: the reference computes both R1 and PL
  grads with create_graph=False (stylegan.py:62, 88), so NEITHER regularizer
  contributes parameter gradients — only the logged loss value (the
  `real_logits*0` / `gen_img[...]*0` terms exist to keep backward() legal).
  Default behavior replicates this (penalties are stop_gradient'ed into the
  metrics); set cfg.sg2_reg_grads=True for NVIDIA-original regularization
  that actually regularizes — R1 contributes D-param grads and PL
  contributes G-param grads (second-order, grad-of-grad through the
  synthesis network, the JAX equivalent of create_graph=True);
- after each G step the EMA fold-back: ema = params = (params + ema)/2
  (trainer.py:199-206; generalized by cfg.ema_decay, 0.5 = reference);
- the stylegan(-1) family uses the same loss with R1 every step
  (stylegan.py:41) and no style mixing / PL. (As shipped, the reference's
  stylegan-1 path crashes unpacking `img, ws = G(z)`; here it runs.)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gan3d_tpu.config import Config
from gan3d_tpu.train.state import TrainState
from gan3d_tpu.utils.prng import fold_step
from gan3d_tpu.utils.profiling import scope

STYLE_MIXING_PROB = 0.9
R1_GAMMA = 10.0
PL_BATCH_SHRINK = 2
PL_DECAY = 0.01
PL_WEIGHT = 2.0
LAZY_INTERVAL = 16


def _softplus(x):
    return jax.nn.softplus(x.astype(jnp.float32))


def _build_updates(cfg: Config, G, D,
                   g_tx: optax.GradientTransformation,
                   d_tx: optax.GradientTransformation,
                   static_r1, static_pl):
    """Shared d_update/g_update closures for the fused and split builders."""
    is_v2 = cfg.stylegan2
    reg_grads = getattr(cfg, "sg2_reg_grads", False)

    def g_variables(g_params, g_state):
        return {"params": g_params, **g_state}

    def run_G(g_params, g_state, z, key):
        """G forward with style mixing (v2) — returns (img, ws)."""
        variables = g_variables(g_params, g_state)
        kmix, knoise = jax.random.split(key)
        if not is_v2:
            rngs = {"mixing": kmix}
            img = G.apply(variables, z, train=True, rngs=rngs)
            return img, None
        ws = G.apply(variables, z, method=G.map_ws)
        num_ws = ws.shape[1]
        # style_mixing scope mirrors reference stylegan.py:26
        kcut, kprob, kz2 = jax.random.split(kmix, 3)
        cutoff = jax.random.randint(kcut, (), 1, num_ws)
        cutoff = jnp.where(
            jax.random.uniform(kprob) < STYLE_MIXING_PROB, cutoff, num_ws)
        ws2 = G.apply(variables, jax.random.normal(kz2, z.shape),
                      method=G.map_ws)
        idx = jnp.arange(num_ws)[None, :, None]
        ws = jnp.where(idx >= cutoff, ws2, ws)
        img = G.apply(variables, ws, method=G.synthesize,
                      rngs={"noise": knoise})
        return img, ws

    def d_apply(d_params, x):
        return D.apply({"params": d_params}, x).astype(jnp.float32)

    def r1_penalty_value(d_params, real):
        """Reference r1: grad^2 summed over (C, D, H) then mean with the
        [N, 1] logits broadcast (stylegan.py:63-67)."""
        grads = jax.grad(lambda x: jnp.sum(d_apply(d_params, x)))(real)
        g32 = grads.astype(jnp.float32)
        # NDHWC: torch dims [1,2,3] = (C, D, H) -> our axes (4, 1, 2)
        pen = jnp.sum(jnp.square(g32), axis=(4, 1, 2)) * (R1_GAMMA / 2)
        return pen  # [N, W]

    # v1 runs R1 every step (reference stylegan.py:41); v2 lazily.
    r1_mode = True if not is_v2 else static_r1  # None = dynamic cond

    def d_update(state: TrainState, real: jax.Array, key: jax.Array):
        kG, _ = jax.random.split(key)
        z = jax.random.normal(jax.random.fold_in(key, 7),
                              (real.shape[0], cfg.z_size), jnp.float32)
        gen_img, _ = run_G(state.g_params, state.g_state, z, kG)
        gen_img = jax.lax.stop_gradient(gen_img).astype(real.dtype)

        def loss_fn(d_params):
            gen_logits = d_apply(d_params, gen_img)
            loss_dgen = jnp.mean(_softplus(gen_logits))
            real_logits = d_apply(d_params, real)
            loss_dreal = jnp.mean(_softplus(-real_logits))

            def with_r1():
                pen = r1_penalty_value(d_params, real)  # [N, W]
                if not reg_grads:
                    pen = jax.lax.stop_gradient(pen)
                # broadcast [N,1] + [N,W] then mean (reference quirk)
                return jnp.mean(_softplus(-real_logits) + pen)

            def without_r1():
                return loss_dreal

            if r1_mode is None:
                do_r1 = state.step % LAZY_INTERVAL == 0
                err_real = jax.lax.cond(do_r1, with_r1, without_r1)
            elif r1_mode:
                err_real = with_r1()
            else:
                err_real = without_r1()
            return loss_dgen + err_real, (err_real, loss_dgen)

        with scope("Dgen_Dreal_backward"):
            grads, (err_real, err_fake) = jax.grad(
                loss_fn, has_aux=True)(state.d_params)
        updates, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        state = state.replace(d_params=d_params, d_opt=d_opt)
        return state, (err_real, err_fake)

    pl_mode = False if not is_v2 else static_pl  # None = dynamic cond

    def g_update(state: TrainState, key: jax.Array):
        kG, kpl = jax.random.split(key)
        z = jax.random.normal(jax.random.fold_in(key, 13),
                              (cfg.batch_size, cfg.z_size), jnp.float32)

        def pl_branch(g_params, pl_mean):
            """PL penalty; differentiable wrt g_params (through the inner
            VJP — grad-of-grad) so reg_grads=True regularizes for real."""
            bs = cfg.batch_size // PL_BATCH_SHRINK
            zs = z[:bs]
            variables = g_variables(g_params, state.g_state)
            kmix, knoise, kn2 = jax.random.split(kpl, 3)
            ws = G.apply(variables, zs, method=G.map_ws)

            def synth(ws_):
                return G.apply(variables, ws_, method=G.synthesize,
                               rngs={"noise": knoise})

            img = synth(ws)
            d_, h_ = img.shape[1], img.shape[2]
            pl_noise = jax.random.normal(kn2, img.shape, jnp.float32) \
                / jnp.sqrt(jnp.float32(d_ * h_))

            pl_grads = jax.grad(
                lambda w_: jnp.sum(synth(w_).astype(jnp.float32)
                                   * pl_noise))(ws)
            lengths = jnp.sqrt(jnp.mean(
                jnp.sum(jnp.square(pl_grads.astype(jnp.float32)),
                        axis=2), axis=1))
            new_mean = pl_mean + PL_DECAY * (jnp.mean(lengths) - pl_mean)
            pen = jnp.mean(jnp.square(lengths - new_mean)) * PL_WEIGHT
            return pen, new_mean

        def no_pl(g_params, pl_mean):
            del g_params
            return jnp.float32(0), pl_mean

        def loss_fn(g_params):
            img, _ = run_G(g_params, state.g_state, z, kG)
            gen_logits = d_apply(state.d_params, img)
            loss_gmain = jnp.mean(_softplus(-gen_logits))
            if pl_mode is None:
                do_pl = state.step % LAZY_INTERVAL == 0
                pen, new_mean = jax.lax.cond(do_pl, pl_branch, no_pl,
                                             g_params, state.pl_mean)
            elif pl_mode:
                pen, new_mean = pl_branch(g_params, state.pl_mean)
            else:
                pen, new_mean = no_pl(g_params, state.pl_mean)
            if not reg_grads:
                # create_graph=False faithfulness: value only, no grads.
                pen = jax.lax.stop_gradient(pen)
            return loss_gmain + pen, (img, new_mean)

        with scope("Gmain"):
            (err_g, (fake, new_pl_mean)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.g_params)
        pl_mean = (jax.lax.stop_gradient(new_pl_mean)
                   if state.pl_mean is not None else state.pl_mean)

        updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)

        # EMA fold-back (reference weight_avg, stylegan2 only).
        ema_params = state.ema_params
        if is_v2 and ema_params is not None:
            d = cfg.ema_decay
            ema_params = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                                      ema_params, g_params)
            g_params = ema_params

        state = state.replace(g_params=g_params, g_opt=g_opt,
                              ema_params=ema_params, pl_mean=pl_mean)
        return state, err_g, fake

    return d_update, g_update


def build_stylegan_step(cfg: Config, G, D,
                        g_tx: optax.GradientTransformation,
                        d_tx: optax.GradientTransformation,
                        *, static_r1=None, static_pl=None):
    """Build the fused stylegan train step.

    ``static_r1`` / ``static_pl`` control how the lazy regularizer branches
    are compiled:

    - ``None`` (default): dynamic ``lax.cond`` on ``state.step % 16`` — one
      program, but BOTH branches compile, so the R1 branch (a full extra D
      fwd+bwd) and the PL branch (a full extra synthesis fwd+VJP) double the
      HLO even on steps that skip them.
    - ``True`` / ``False``: the branch is baked statically. The Trainer
      compiles one program per (r1, pl) combination and dispatches by
      ``step % 16`` on the host — each program carries only the code it
      runs, which roughly halves G/D-side HLO at 128^3 (the compiler-limit
      regime that forced split-step mode). Numerically identical to the
      dynamic form; both D-steps and the G-step of one iteration share the
      same ``state.step``, so r1/pl fire together (the reference trainer
      passes the same outer ``i`` to step_D and step_G:
      trainer.py:214-220, 262-269).
    """
    d_update, g_update = _build_updates(cfg, G, D, g_tx, d_tx,
                                        static_r1, static_pl)

    def step_fn(state: TrainState, reals: jax.Array, base_key: jax.Array
                ) -> Tuple[TrainState, Dict[str, jax.Array], jax.Array]:
        key = fold_step(base_key, state.step)
        d_metrics = (jnp.float32(0), jnp.float32(0))
        for i in range(cfg.iterD):
            state, d_metrics = d_update(state, reals[i],
                                        jax.random.fold_in(key, i))
        state, err_g, fake = g_update(state, jax.random.fold_in(key, 1000))
        state = state.replace(step=state.step + 1)
        metrics = {"d_real": d_metrics[0], "d_fake": d_metrics[1],
                   "g_loss": err_g}
        return state, metrics, jax.lax.stop_gradient(fake)

    return step_fn


def build_stylegan_split_steps(cfg: Config, G, D,
                               g_tx: optax.GradientTransformation,
                               d_tx: optax.GradientTransformation,
                               *, static_r1=None, static_pl=None):
    """Split (two-program) stylegan step for cfg.fused_step=False: returns
    (d_step(state, real, base_key, i), g_step(state, base_key)). Key-folding
    matches the fused step exactly, so the modes are numerically identical —
    used when one fused program overloads the XLA compiler (128^3 + remat)."""
    d_update, g_update = _build_updates(cfg, G, D, g_tx, d_tx,
                                        static_r1, static_pl)

    def d_step(state: TrainState, real: jax.Array, base_key: jax.Array,
               i: jax.Array):
        key = fold_step(base_key, state.step)
        state, (err_real, err_fake) = d_update(state, real,
                                               jax.random.fold_in(key, i))
        return state, {"d_real": err_real, "d_fake": err_fake}

    def g_step(state: TrainState, base_key: jax.Array):
        key = fold_step(base_key, state.step)
        state, err_g, fake = g_update(state, jax.random.fold_in(key, 1000))
        state = state.replace(step=state.step + 1)
        return state, {"g_loss": err_g}, jax.lax.stop_gradient(fake)

    return d_step, g_step
