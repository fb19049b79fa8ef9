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
    """Returns (cfg, G, D, g_vars, d_vars) with weights restored.

    Accepts both our run dirs (params.json + Orbax checkpoint) and REFERENCE
    run dirs (params.pkl + models/checkpoint.pt), converting torch weights
    on the fly (gan3d_tpu.eval.convert)."""
    cfg = Config.load(path)
    if compute_dtype:
        cfg = cfg.replace(compute_dtype=compute_dtype)
    ref_ckpt = os.path.join(path, "models", "checkpoint.pt")
    try:
        raw = _restore_raw(os.path.join(path, "models"))
    except FileNotFoundError:
        if os.path.isfile(ref_ckpt):
            from gan3d_tpu.eval.convert import load_reference_run

            return load_reference_run(path)
        raise
    G, D = build_models(cfg)
    g_vars = {"params": raw["g_params"], **(raw["g_state"] or {})}
    d_vars = {"params": raw["d_params"], **(raw["d_state"] or {})}
    return cfg, G, D, g_vars, d_vars


def _shardings(mesh):
    """(replicated, batch) NamedShardings for an optional eval mesh."""
    if mesh is None:
        return None, None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def make_sampler(cfg: Config, G, g_vars, mesh=None):
    """Jitted z -> volume sampler in eval-style forward (train-mode BN like
    the reference, which never calls eval(); state updates discarded).

    With ``mesh``, generation is data-parallel: z sharded over the mesh's
    `data` axis, weights replicated — the BASELINE config-5 setting
    (tournament at 128^3 across a DP TPU mesh).
    """
    rngs_needed = cfg.family() in ("stylegan2", "stylegan")
    mut = [k for k in g_vars if k != "params"]

    # NB: weights are an ARGUMENT of the jitted fn, not a closure capture —
    # closed-over arrays become HLO constants, and at 128^3 the embedded
    # weights overflow the axon remote-compile request (HTTP 413).
    def sample_impl(gv, z: jax.Array) -> jax.Array:
        rngs = None
        if rngs_needed:
            stream = "noise" if cfg.family() == "stylegan2" else "mixing"
            rngs = {stream: jax.random.key(0)}
        out = G.apply(gv, z, train=True, mutable=mut, rngs=rngs) if mut \
            else (G.apply(gv, z, train=True, rngs=rngs), None)
        fake = out[0]
        if isinstance(fake, tuple):  # stylegan2 returns (img, ws)
            fake = fake[0]
        return fake.astype(jnp.float32)

    rep, batch = _shardings(mesh)
    if mesh is None:
        jitted = jax.jit(sample_impl)
        return lambda z: jitted(g_vars, z)
    jitted = jax.jit(sample_impl, in_shardings=(rep, batch),
                     out_shardings=batch)
    gv_dev = jax.device_put(g_vars, rep)

    def sample(z):
        return jitted(gv_dev, jax.device_put(jnp.asarray(z), batch))

    return sample


def make_discriminator_fn(cfg: Config, D, d_vars, mesh=None):
    mut = [k for k in d_vars if k != "params"]

    def score_impl(dv, x: jax.Array) -> jax.Array:
        rngs = {"crops": jax.random.key(0)} if cfg.msl else None
        if mut:
            out, _ = D.apply(dv, x, mutable=mut, rngs=rngs)
        else:
            out = D.apply(dv, x, rngs=rngs)
        return out.astype(jnp.float32)

    rep, batch = _shardings(mesh)
    if mesh is None:
        jitted = jax.jit(score_impl)
        return lambda x: jitted(d_vars, x)
    jitted = jax.jit(score_impl, in_shardings=(rep, batch),
                     out_shardings=batch)
    dv_dev = jax.device_put(d_vars, rep)

    def score(x):
        return jitted(dv_dev, jax.device_put(jnp.asarray(x), batch))

    return score
