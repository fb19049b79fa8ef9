"""3D-DCGAN generator and discriminator family.

Reference: dcgan.py:8-195. Four D variants (msl / sngan / sagan / WGAN
default) and two G variants (plain / sagan). The reference hardcodes 128^3;
here the stage count derives from cfg.resolution (Config.dcgan_*_channels),
reproducing the reference topology exactly at 128.

Reference quirks preserved:
- G: ConvTranspose3d stem from 1^3 -> 4^3 then stride-2 k=4 p=1 stages,
  BatchNorm+ReLU, final Tanh; N(0, 0.02) conv init, N(1, 0.02) BN init
  (dcgan.py:74-81).
- sagan G: SelfAttention at the stage producing resolution/4 (= 32^3 at
  128^3, dcgan.py:34).
- msl D: RandomCrop3D front-end turning the 1-channel volume into n_crops
  half-resolution crop channels (dcgan.py:96-116; msl.py reconstructed).
- WGAN-default D: *LayerNorm over [C, D, H, W]* + LeakyReLU(0.2)
  (dcgan.py:158-182); SN variants use LeakyReLU(0.1).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan3d_tpu.config import Config
from gan3d_tpu.nn.attention import SelfAttention3d
from gan3d_tpu.nn.layers import Conv3d, ConvTranspose3d, SNConv3d, normal_init
from gan3d_tpu.nn.msl import RandomCrop3D
from gan3d_tpu.nn.norm import BatchNorm3d, LayerNormVolume

Dtype = Any

_BN_SCALE_INIT = normal_init(0.02)  # around 1 — shifted below


def _bn_scale_init(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype) + _BN_SCALE_INIT(key, shape, dtype)


class Generator(nn.Module):
    """DCGAN-3D G: z -> stem 4^3 -> stride-2 ConvTranspose stages -> tanh."""

    cfg: Config
    dtype: Optional[Dtype] = None
    bn_groups: int = 1

    @property
    def dim_z(self) -> int:
        return self.cfg.z_size

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True,
                 update_stats: bool = True) -> jax.Array:
        cfg = self.cfg
        chans = cfg.dcgan_g_channels()
        attn_res = cfg.resolution // 4  # 32 at 128^3 (reference dcgan.py:34)
        dtype = self.dtype or z.dtype
        winit = normal_init(0.02)

        x = z.reshape(z.shape[0], 1, 1, 1, z.shape[-1]).astype(dtype)
        # Stem: 1^3 -> 4^3 (reference: ConvTranspose3d(nz, ngf*16, 4, stride=1))
        x = ConvTranspose3d(chans[0], kernel_size=4, stride=1, padding=0,
                            kernel_init=winit, dtype=dtype)(x)
        x = nn.relu(BatchNorm3d(chans[0], scale_init=_bn_scale_init,
                                num_groups=self.bn_groups)(x, not train))
        res = 4
        for i, ch in enumerate(chans[1:], start=1):
            x = ConvTranspose3d(ch, kernel_size=4, stride=2, padding=1,
                                kernel_init=winit, dtype=dtype)(x)
            x = nn.relu(BatchNorm3d(ch, scale_init=_bn_scale_init,
                                    num_groups=self.bn_groups)(x, not train))
            res *= 2
            if cfg.sagan and res == attn_res:
                x = SelfAttention3d(ch, dtype=dtype)(x, update_stats)
        x = ConvTranspose3d(1, kernel_size=4, stride=2, padding=1,
                            kernel_init=winit, dtype=dtype)(x)
        return jnp.tanh(x)


class Discriminator(nn.Module):
    """DCGAN-3D D with msl / sngan / sagan / WGAN-default variants."""

    cfg: Config
    dtype: Optional[Dtype] = None

    @property
    def dim_z(self) -> int:
        return self.cfg.z_size

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        cfg = self.cfg
        chans = cfg.dcgan_d_channels()
        dtype = self.dtype or x.dtype
        winit = normal_init(0.02)
        x = x.astype(dtype)

        if cfg.msl:
            # RandomCrop3D halves resolution and stacks crops as channels,
            # so one fewer stride-2 stage is needed (reference dcgan.py:96-116).
            x = RandomCrop3D(n_crops=128)(x)
            res = cfg.resolution // 2
            stage_chans = chans[: max(1, len(chans) - 1)]
            for ch in stage_chans:
                x = SNConv3d(ch, kernel_size=4, stride=2, padding=1,
                             use_bias=False, kernel_init=winit, dtype=dtype)(
                                 x, update_stats)
                x = nn.leaky_relu(x, 0.1)
                res //= 2
            x = SNConv3d(1, kernel_size=4, stride=1, padding=0, use_bias=False,
                         kernel_init=winit, dtype=dtype)(x, update_stats)
        elif cfg.sngan or cfg.sagan:
            res = cfg.resolution
            for i, ch in enumerate(chans):
                x = SNConv3d(ch, kernel_size=4, stride=2, padding=1,
                             use_bias=False, kernel_init=winit, dtype=dtype)(
                                 x, update_stats)
                x = nn.leaky_relu(x, 0.1)
                res //= 2
                # sagan: attention at 8^3 (reference dcgan.py:151)
                if cfg.sagan and res == 8:
                    x = SelfAttention3d(ch, dtype=dtype)(x, update_stats)
            x = SNConv3d(1, kernel_size=4, stride=1, padding=0, use_bias=False,
                         kernel_init=winit, dtype=dtype)(x, update_stats)
        else:
            # WGAN-style: plain convs + LayerNorm over the full volume shape.
            res = cfg.resolution
            for ch in chans:
                x = Conv3d(ch, kernel_size=4, stride=2, padding=1,
                           use_bias=False, kernel_init=winit, dtype=dtype)(x)
                res //= 2
                x = LayerNormVolume((res, res, res, ch))(x)
                x = nn.leaky_relu(x, 0.2)
            x = Conv3d(1, kernel_size=4, stride=1, padding=0, use_bias=False,
                       kernel_init=winit, dtype=dtype)(x)
        return x.reshape(x.shape[0], -1)  # [N, 1]
