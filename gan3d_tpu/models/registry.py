"""Model family selection (reference: trainer.py:52-68).

Precedence: hybrid (BigGAN G + DCGAN D) > dcgan > stylegan2 > stylegan >
BigGAN default (covers the sngan/sagan/biggan flag variants).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from gan3d_tpu.config import Config


def _dtype(cfg: Config):
    return jnp.dtype(cfg.compute_dtype)


def _bn_groups(cfg: Config) -> int:
    """cfg.sync_bn=False: per-replica statistics, expressed as batch groups
    of batch/ndev samples (SURVEY §5.8 — the reference's DataParallel BN is
    per replica; sync is the TPU-natural default)."""
    if cfg.sync_bn:
        return 1
    import jax

    return cfg.num_devices or len(jax.devices())


def build_models(cfg: Config, bn_axis_name: Optional[str] = None
                 ) -> Tuple[Any, Any]:
    """Return (generator, discriminator) flax modules for the config."""
    from gan3d_tpu.models import biggan, dcgan

    fam = cfg.family()
    dt = _dtype(cfg)
    groups = _bn_groups(cfg)
    if fam == "hybrid":
        return (biggan.Generator(cfg, dtype=dt, bn_axis_name=bn_axis_name,
                                 bn_groups=groups),
                dcgan.Discriminator(cfg, dtype=dt))
    if fam == "dcgan":
        return (dcgan.Generator(cfg, dtype=dt, bn_groups=groups),
                dcgan.Discriminator(cfg, dtype=dt))
    if fam == "stylegan2":
        from gan3d_tpu.models.stylegan import Discriminator as StyleD
        from gan3d_tpu.models.stylegan import Generator as StyleG

        return (StyleG(cfg, dtype=dt), StyleD(cfg, dtype=dt))
    if fam == "stylegan":
        from gan3d_tpu.models.stylegan import Discriminator as StyleD
        from gan3d_tpu.models.stylegan import StyleGAN1Generator

        return (StyleGAN1Generator(cfg, dtype=dt), StyleD(cfg, dtype=dt))
    return (biggan.Generator(cfg, dtype=dt, bn_axis_name=bn_axis_name,
                             bn_groups=groups),
            biggan.Discriminator(cfg, dtype=dt))
