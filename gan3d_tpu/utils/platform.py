"""Platform forcing.

On hosts with the experimental 'axon' TPU plugin, the JAX_PLATFORMS env var
alone is overridden during plugin registration — the config update is also
required. Must be called before any jax backend use.
"""

from __future__ import annotations

import os


def force_platform(name: str) -> None:
    if not name:
        return
    os.environ["JAX_PLATFORMS"] = name
    import jax

    jax.config.update("jax_platforms", name)


def enable_compile_cache(path: str = "") -> None:
    """Persistent XLA compile cache, shared by every CLI and bench.py.

    At 128^3 a single G jit costs minutes over the axon tunnel; eval and
    tournament build a fresh jitted sampler per model seed, so without this
    cache every seed recompiles an identical program (weights are jit
    ARGUMENTS — eval/load.py — so the HLO fingerprint matches across
    seeds and across processes).
    """
    import jax

    cache = path or os.environ.get(
        "GAN3D_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
