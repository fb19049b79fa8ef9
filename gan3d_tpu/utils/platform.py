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
