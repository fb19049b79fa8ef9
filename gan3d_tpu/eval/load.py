"""Load trained runs for evaluation/tournament.

Reference equivalents: eval.py:15-29 (load_gen) and tournament.py:14-33
(load_model) — rebuild the architecture from the run dir's persisted params,
then restore weights from its rolling checkpoint. Our runs persist
params.json (or reference params.pkl) + an Orbax checkpoint.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from gan3d_tpu.config import Config
from gan3d_tpu.models import build_models


def _restore_raw(models_dir: str) -> Dict[str, Any]:
    mngr = ocp.CheckpointManager(os.path.abspath(models_dir))
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {models_dir}")
    restored = mngr.restore(step)
    mngr.close()
    return restored


def load_run(path: str, compute_dtype: Optional[str] = None
             ) -> Tuple[Config, Any, Any, Dict, Dict]:
    """Returns (cfg, G, D, g_vars, d_vars) with weights restored."""
    cfg = Config.load(path)
    if compute_dtype:
        cfg = cfg.replace(compute_dtype=compute_dtype)
    G, D = build_models(cfg)
    raw = _restore_raw(os.path.join(path, "models"))
    g_vars = {"params": raw["g_params"], **(raw["g_state"] or {})}
    d_vars = {"params": raw["d_params"], **(raw["d_state"] or {})}
    return cfg, G, D, g_vars, d_vars


def make_sampler(cfg: Config, G, g_vars):
    """Jitted z -> volume sampler in eval-style forward (train-mode BN like
    the reference, which never calls eval(); state updates discarded)."""

    @jax.jit
    def sample(z: jax.Array) -> jax.Array:
        mut = [k for k in g_vars if k != "params"]
        out = G.apply(g_vars, z, train=True, mutable=mut) if mut else (
            G.apply(g_vars, z, train=True), None)
        fake = out[0]
        if isinstance(fake, tuple):  # stylegan2 returns (img, ws)
            fake = fake[0]
        return fake.astype(jnp.float32)

    return sample


def make_discriminator_fn(cfg: Config, D, d_vars):
    @jax.jit
    def score(x: jax.Array) -> jax.Array:
        mut = [k for k in d_vars if k != "params"]
        rngs = {"crops": jax.random.key(0)} if cfg.msl else None
        if mut:
            out, _ = D.apply(d_vars, x, mutable=mut, rngs=rngs)
        else:
            out = D.apply(d_vars, x, rngs=rngs)
        return out.astype(jnp.float32)

    return score
