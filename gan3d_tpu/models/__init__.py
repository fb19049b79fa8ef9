"""Model zoo: 3D-DCGAN/WGAN/SNGAN/SAGAN, BigGAN-Deep-3D, StyleGAN-1/2-3D.

`build_models(cfg)` resolves the family per the reference precedence
(trainer.py:52-68) and returns (generator, discriminator) flax modules.
"""

from gan3d_tpu.models.registry import build_models

__all__ = ["build_models"]
