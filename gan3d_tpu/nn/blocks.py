"""BigGAN-deep residual blocks and the (reference-dead-code) shallow blocks.

Reference: utils.py:47-132 (GBlockDeep/DBlockDeep) and utils.py:134-205
(GBlock/DBlock — never wired into any reference model, included for
capability completeness).

Faithful quirks (SURVEY §2.3):
- GBlockDeep shortcut drops channels when shrinking: ``x[:, :out_channels]``
  (utils.py:75-76) → here ``x[..., :out]`` in NDHWC.
- DBlockDeep shortcut concatenates a conv of the input for the extra
  channels (utils.py:108-117).
- DBlockDeep's convs never receive the sngan/plain flag — the deep D is
  ALWAYS spectrally normalized (utils.py:101-106); GBlockDeep respects it.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan3d_tpu.nn.layers import SNConv3d
from gan3d_tpu.nn.norm import BatchNorm3d
from gan3d_tpu.ops.conv3d import avg_pool3d, upsample_nearest3d
from gan3d_tpu.ops.downsample_conv import fast_downconv_enabled
from gan3d_tpu.ops.upsample_conv import fast_upconv_enabled

Dtype = Any


class GBlockDeep(nn.Module):
    in_channels: int
    out_channels: int
    upsample: bool = False
    plain: bool = False  # reference sngan flag: True = no spectral norm
    channel_ratio: int = 4
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 update_stats: bool = True) -> jax.Array:
        hid = self.in_channels // self.channel_ratio
        kw = dict(plain=self.plain, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        bn = lambda feats, name: BatchNorm3d(  # noqa: E731
            feats, name=name, axis_name=self.bn_axis_name,
            num_groups=self.bn_groups, param_dtype=self.param_dtype)

        h = nn.relu(bn(self.in_channels, "bn1")(x, not train))
        h = SNConv3d(hid, kernel_size=1, padding=0, name="conv1", **kw)(
            h, update_stats)
        h = nn.relu(bn(hid, "bn2")(h, not train))
        if self.in_channels != self.out_channels:
            x = x[..., : self.out_channels]
        fuse_up = self.upsample and fast_upconv_enabled()
        if self.upsample:
            x = upsample_nearest3d(x, 2)
            if not fuse_up:
                h = upsample_nearest3d(h, 2)
        h = SNConv3d(hid, kernel_size=3, padding=1, name="conv2",
                     fuse_upsample=fuse_up, **kw)(h, update_stats)
        h = nn.relu(bn(hid, "bn3")(h, not train))
        h = SNConv3d(hid, kernel_size=3, padding=1, name="conv3", **kw)(
            h, update_stats)
        h = nn.relu(bn(hid, "bn4")(h, not train))
        h = SNConv3d(self.out_channels, kernel_size=1, padding=0,
                     name="conv4", **kw)(h, update_stats)
        return h + x


class DBlockDeep(nn.Module):
    in_channels: int
    out_channels: int
    downsample: bool = False
    preactivation: bool = True
    channel_ratio: int = 4
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        hid = self.out_channels // self.channel_ratio
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)  # always SN

        h = nn.relu(x) if self.preactivation else x
        h = SNConv3d(hid, kernel_size=1, padding=0, name="conv1", **kw)(
            h, update_stats)
        h = SNConv3d(hid, kernel_size=3, padding=1, name="conv2", **kw)(
            nn.relu(h), update_stats)
        h = SNConv3d(hid, kernel_size=3, padding=1, name="conv3", **kw)(
            nn.relu(h), update_stats)
        # On TPU the avgpool+1x1 pairs below run fused as single k=2/s=2
        # convs (1.05-2.84x per pair, ops/downsample_conv.py) — same params
        # and numerics mod f32 order.
        fuse_down = self.downsample and fast_downconv_enabled()
        h = nn.relu(h)
        if self.downsample and not fuse_down:
            h = avg_pool3d(h, 2)
        h = SNConv3d(self.out_channels, kernel_size=1, padding=0,
                     name="conv4", fuse_avgpool=fuse_down, **kw)(
                         h, update_stats)

        # Shortcut: downsample, then concat extra channels from conv_sc.
        if fuse_down and self.in_channels != self.out_channels:
            # one conv produces concat([avgpool(x), conv_sc(avgpool(x))])
            sc = SNConv3d(self.out_channels - self.in_channels,
                          kernel_size=1, padding=0, name="conv_sc",
                          fuse_avgpool_concat=True, **kw)(x, update_stats)
        else:
            sc = x
            if self.downsample:
                sc = avg_pool3d(sc, 2)
            if self.in_channels != self.out_channels:
                extra = SNConv3d(self.out_channels - self.in_channels,
                                 kernel_size=1, padding=0, name="conv_sc",
                                 **kw)(sc, update_stats)
                sc = jnp.concatenate([sc, extra], axis=-1)
        return h + sc


class GBlock(nn.Module):
    """Classic SN-GAN G resblock (reference: utils.py:134-163, unused)."""

    in_channels: int
    out_channels: int
    upsample: bool = False
    plain: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 update_stats: bool = True) -> jax.Array:
        kw = dict(plain=self.plain, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        h = nn.relu(BatchNorm3d(self.in_channels, name="bn1",
                                axis_name=self.bn_axis_name,
                                param_dtype=self.param_dtype)(x, not train))
        if self.upsample:
            h = upsample_nearest3d(h, 2)
            x = upsample_nearest3d(x, 2)
        h = SNConv3d(self.out_channels, kernel_size=3, padding=1,
                     name="conv1", **kw)(h, update_stats)
        h = nn.relu(BatchNorm3d(self.out_channels, name="bn2",
                                axis_name=self.bn_axis_name,
                                param_dtype=self.param_dtype)(h, not train))
        h = SNConv3d(self.out_channels, kernel_size=3, padding=1,
                     name="conv2", **kw)(h, update_stats)
        if self.in_channels != self.out_channels or self.upsample:
            x = SNConv3d(self.out_channels, kernel_size=1, padding=0,
                         name="conv_sc", **kw)(x, update_stats)
        return h + x


class DBlock(nn.Module):
    """Classic SN-GAN D resblock (reference: utils.py:165-205, unused)."""

    in_channels: int
    out_channels: int
    downsample: bool = False
    preactivation: bool = False
    wide: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        hid = self.out_channels if self.wide else self.in_channels
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.relu(x) if self.preactivation else x
        h = SNConv3d(hid, kernel_size=3, padding=1, name="conv1", **kw)(
            h, update_stats)
        h = SNConv3d(self.out_channels, kernel_size=3, padding=1,
                     name="conv2", **kw)(nn.relu(h), update_stats)
        if self.downsample:
            h = avg_pool3d(h, 2)

        sc = x
        learnable_sc = self.in_channels != self.out_channels or self.downsample
        if self.preactivation:
            if learnable_sc:
                sc = SNConv3d(self.out_channels, kernel_size=1, padding=0,
                              name="conv_sc", **kw)(sc, update_stats)
            if self.downsample:
                sc = avg_pool3d(sc, 2)
        else:
            if self.downsample:
                sc = avg_pool3d(sc, 2)
            if learnable_sc:
                sc = SNConv3d(self.out_channels, kernel_size=1, padding=0,
                              name="conv_sc", **kw)(sc, update_stats)
        return h + sc
