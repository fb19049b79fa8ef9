"""StyleGAN2-3D discriminator.

Reference: stylegan.py:721-928. Resnet-architecture blocks from
img_resolution down to 4^3 with channels min(channel_base // res, 512)
where channel_base = cfg.filterD (stylegan.py:898, 903); fromrgb on the
first block only; conv1 downsamples 2x through the FIR filter; skip conv
(1x1, down 2) with gain sqrt(0.5); epilogue = minibatch-std (group 4) ->
3^3 conv -> FC over the flattened 4^3 volume -> FC -> 1 logit
(stylegan.py:838-880).

Layout note: the epilogue flattens NDHWC, so its first FC weight is a
permutation of the reference's NCDHW flatten — equivalent for training,
handled by weight converters for checkpoint interop.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan3d_tpu.config import Config
from gan3d_tpu.models.stylegan.generator import synthesis_channels
from gan3d_tpu.models.stylegan.layers import Conv3dLayer, FullyConnectedLayer

Dtype = Any


class DiscriminatorBlock(nn.Module):
    in_channels: int          # 0 = first block (has fromrgb)
    tmp_channels: int
    out_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jax.Array], img: Optional[jax.Array]):
        dtype = self.dtype or jnp.float32
        if self.in_channels == 0:
            y = Conv3dLayer(self.tmp_channels, kernel_size=1,
                            activation=self.activation, name="fromrgb",
                            param_dtype=self.param_dtype)(img.astype(dtype))
            x = x + y if x is not None else y
            img = None  # 'skip' D architecture unused (resnet default)

        if self.architecture == "resnet":
            y = Conv3dLayer(self.out_channels, kernel_size=1, use_bias=False,
                            down=2, name="skip",
                            param_dtype=self.param_dtype)(
                                x, gain=float(np.sqrt(0.5)))
            x = Conv3dLayer(self.tmp_channels, kernel_size=3,
                            activation=self.activation, name="conv0",
                            param_dtype=self.param_dtype)(x)
            x = Conv3dLayer(self.out_channels, kernel_size=3,
                            activation=self.activation, down=2, name="conv1",
                            param_dtype=self.param_dtype)(
                                x, gain=float(np.sqrt(0.5)))
            x = y + x
        else:
            x = Conv3dLayer(self.tmp_channels, kernel_size=3,
                            activation=self.activation, name="conv0",
                            param_dtype=self.param_dtype)(x)
            x = Conv3dLayer(self.out_channels, kernel_size=3,
                            activation=self.activation, down=2, name="conv1",
                            param_dtype=self.param_dtype)(x)
        return x, img


class MinibatchStdLayer(nn.Module):
    """Reference stylegan.py:814-835: per-group feature stddev appended as
    extra channels. Under jit-SPMD data parallelism the group spans the
    global batch (groups of `group_size` samples)."""

    group_size: int = 4
    num_channels: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, d, h, w, c = x.shape
        g = min(self.group_size, n)
        f = self.num_channels
        cpf = c // f
        y = x.astype(jnp.float32).reshape(g, n // g, d, h, w, f, cpf)
        y = y - jnp.mean(y, axis=0, keepdims=True)
        y = jnp.mean(jnp.square(y), axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(1, 2, 3, 5))            # [n//g, F]
        y = jnp.repeat(y, g, axis=0).reshape(n, 1, 1, 1, f)
        y = jnp.broadcast_to(y, (n, d, h, w, f)).astype(x.dtype)
        return jnp.concatenate([x, y], axis=-1)


class DiscriminatorEpilogue(nn.Module):
    in_channels: int
    resolution: int = 4
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(jnp.float32)
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(self.mbstd_group_size,
                                  self.mbstd_num_channels, name="mbstd")(x)
        x = Conv3dLayer(self.in_channels, kernel_size=3,
                        activation=self.activation, name="conv",
                        param_dtype=self.param_dtype)(x)
        x = FullyConnectedLayer(self.in_channels, activation=self.activation,
                                name="fc", param_dtype=self.param_dtype)(
                                    x.reshape(x.shape[0], -1))
        return FullyConnectedLayer(1, name="out",
                                   param_dtype=self.param_dtype)(x)


class Discriminator(nn.Module):
    cfg: Config
    dtype: Optional[Dtype] = None

    @property
    def dim_z(self) -> int:
        return self.cfg.z_size

    @nn.compact
    def __call__(self, img: jax.Array, update_stats: bool = True
                 ) -> jax.Array:
        del update_stats  # no spectral norm in the StyleGAN D
        res = self.cfg.resolution
        chans = synthesis_channels(self.cfg.filterD, res)
        block_res = [2 ** i for i in range(int(np.log2(res)), 2, -1)]
        x = None
        # cfg.remat: checkpoint each block in backward (memory at 128^3).
        DB = nn.remat(DiscriminatorBlock) if self.cfg.remat \
            else DiscriminatorBlock
        for r in block_res:
            in_ch = chans[r] if r < res else 0
            x, img = DB(
                in_ch, chans[r], chans[r // 2], dtype=self.dtype,
                name=f"b{r}")(x, img)
        return DiscriminatorEpilogue(chans[4], name="b4")(x)
