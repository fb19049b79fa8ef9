"""StyleGAN-1/2-3D family.

Reference: stylegan.py — mapping network (298-392), upfirdn3d/conv3d_resample
resampling core (126-294), modulated conv (396-444), synthesis network
(446-693), discriminator (721-928), StyleGAN2 loss (6-99), StyleGAN-1 AdaIN
generator (931-1148).
"""

from gan3d_tpu.models.stylegan.generator import Generator
from gan3d_tpu.models.stylegan.discriminator import Discriminator
from gan3d_tpu.models.stylegan.stylegan1 import StyleGAN1Generator

__all__ = ["Generator", "Discriminator", "StyleGAN1Generator"]
