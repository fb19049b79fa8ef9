"""StyleGAN2-3D synthesis network and generator.

Reference: stylegan.py:548-718. SynthesisBlock holds a learned 4^3 const
(first block), conv0 (up 2) + conv1 modulated layers, and the progressive
'skip' image accumulation: the running image is FIR-upsampled 2x and the
block's toRGB output is added (stylegan.py:619-638). SynthesisNetwork places
blocks at 4..resolution with channels min(channel_base // res, 512) where
channel_base = cfg.filterG (stylegan.py:660-662, 711), final Tanh.
Generator = mapping + synthesis, returns (img, ws) (stylegan.py:715-718).
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan3d_tpu.config import Config
from gan3d_tpu.models.stylegan.layers import OutBlock, SynthesisLayer
from gan3d_tpu.models.stylegan.mapping import MappingNetwork
from gan3d_tpu.models.stylegan.resample import setup_filter, upfirdn3d

Dtype = Any


def synthesis_channels(channel_base: int, resolution: int,
                       channel_max: int = 512) -> dict:
    res_log2 = int(np.log2(resolution))
    chans = {2 ** i: min(channel_base // (2 ** i), channel_max)
             for i in range(2, res_log2 + 1)}
    if chans[resolution] < 1:
        # The reference inherits this footgun (stylegan.py:660-662 with
        # channel_base=params.filterG): channel_base // resolution rounds
        # to zero channels and torch crashes deep inside conv3d. Fail
        # loudly with the fix instead.
        raise ValueError(
            f"StyleGAN channel table hits 0 channels at resolution "
            f"{resolution} with filterG/filterD={channel_base}; use "
            f"filter >= resolution (reference default: 128).")
    return chans


class SynthesisBlock(nn.Module):
    in_channels: int           # 0 = first (const) block
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int = 1
    is_last: bool = False
    architecture: str = "skip"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(self, x: Optional[jax.Array], ws: jax.Array,
                 img: Optional[jax.Array], noise_mode: str = "random",
                 fused_modconv: bool = False):
        dtype = self.dtype or jnp.float32
        w_iter = iter([ws[:, i] for i in range(ws.shape[1])])
        kw = dict(w_dim=self.w_dim, resolution=self.resolution,
                  param_dtype=self.param_dtype)

        if self.in_channels == 0:
            const = self.param("const", nn.initializers.normal(1.0),
                               (self.resolution,) * 3 + (self.out_channels,),
                               self.param_dtype)
            x = jnp.broadcast_to(const[None], (ws.shape[0],) + const.shape)
            x = x.astype(dtype)
            x = SynthesisLayer(self.out_channels, name="conv1", **kw)(
                x, next(w_iter), noise_mode, fused_modconv=fused_modconv)
        else:
            x = x.astype(dtype)
            x = SynthesisLayer(self.out_channels, up=2, name="conv0", **kw)(
                x, next(w_iter), noise_mode, fused_modconv=fused_modconv)
            x = SynthesisLayer(self.out_channels, name="conv1", **kw)(
                x, next(w_iter), noise_mode, fused_modconv=fused_modconv)

        if img is not None:
            # FIR-upsample the accumulated image (reference
            # stylegan.py:620-634 inlines the upsample2x padding algebra).
            taps = (1, 3, 3, 1)
            f = setup_filter(taps)
            fw = f.shape[0]
            up = 2
            p = [(fw + up - 1) // 2, (fw - up) // 2] * 3
            img = upfirdn3d(img, f, up=up, padding=p, gain=up ** 3, f1d=taps)
        if self.is_last or self.architecture == "skip":
            y = OutBlock(self.img_channels, w_dim=self.w_dim, name="torgb",
                         param_dtype=self.param_dtype)(
                             x, next(w_iter), fused_modconv=fused_modconv)
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class SynthesisNetwork(nn.Module):
    w_dim: int = 512
    img_resolution: int = 128
    img_channels: int = 1
    channel_base: int = 4096
    channel_max: int = 512
    remat: bool = False        # jax.checkpoint per block (memory at 128^3)
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @property
    def block_resolutions(self) -> List[int]:
        return [2 ** i
                for i in range(2, int(np.log2(self.img_resolution)) + 1)]

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2                    # convs
            n += 1 if res == self.img_resolution else 0  # final torgb
        return n

    @nn.compact
    def __call__(self, ws: jax.Array, noise_mode: str = "random",
                 fused_modconv: bool = False) -> jax.Array:
        chans = synthesis_channels(self.channel_base, self.img_resolution,
                                   self.channel_max)
        ws = ws.astype(jnp.float32)
        x = img = None
        w_idx = 0
        # remat: checkpoint each block in backward (noise_mode /
        # fused_modconv are static; the per-layer noise rng is lifted).
        SB = nn.remat(SynthesisBlock, static_argnums=(4, 5)) if self.remat \
            else SynthesisBlock
        for res in self.block_resolutions:
            in_ch = chans[res // 2] if res > 4 else 0
            block = SB(
                in_ch, chans[res], w_dim=self.w_dim, resolution=res,
                img_channels=self.img_channels,
                is_last=(res == self.img_resolution),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"b{res}")
            # Reference narrows num_conv + num_torgb ws per block but only
            # advances by num_conv (stylegan.py:683-687).
            take = block.num_conv + block.num_torgb
            block_ws = ws[:, w_idx : w_idx + take]
            w_idx += block.num_conv
            # static args (noise_mode, fused_modconv) must be positional for
            # nn.remat's static_argnums to see them.
            x, img = block(x, block_ws, img, noise_mode, fused_modconv)
        return jnp.tanh(img)


class Generator(nn.Module):
    """StyleGAN2 G (reference stylegan.py:697-718). Returns (img, ws).

    setup-style so the loss can call mapping and synthesis separately
    (style mixing, path-length regularization) via apply(..., method=...).
    """

    cfg: Config
    w_dim: int = 512
    dtype: Optional[Dtype] = None

    @property
    def dim_z(self) -> int:
        return self.cfg.z_size

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.cfg.resolution,
            channel_base=self.cfg.filterG, remat=self.cfg.remat,
            dtype=self.dtype)
        self.mapping = MappingNetwork(z_dim=self.cfg.z_size,
                                      w_dim=self.w_dim,
                                      num_ws=self.synthesis.num_ws)

    def __call__(self, z: jax.Array, train: bool = True,
                 update_stats: bool = True, noise_mode: str = "random",
                 truncation_psi: float = 1.0,
                 fused_modconv: Optional[bool] = None):
        del update_stats  # BN-free; kept for a uniform model API
        if fused_modconv is None:
            # reference default (stylegan.py:601): fused when not training
            # AND (full precision or batch 1) — low-precision batched fused
            # forwards drift at bf16 epsilon, so the reference avoids them.
            dt = self.dtype or jnp.float32
            fused_modconv = (not train) and (dt == jnp.float32
                                             or z.shape[0] == 1)
        ws = self.mapping(z, truncation_psi=truncation_psi)
        img = self.synthesis(ws, noise_mode=noise_mode,
                             fused_modconv=fused_modconv)
        return img, ws

    def map_ws(self, z: jax.Array, update_w_avg: bool = False) -> jax.Array:
        """Mapping only (style mixing in the loss)."""
        return self.mapping(z, update_w_avg=update_w_avg)

    def synthesize(self, ws: jax.Array, noise_mode: str = "random",
                   fused_modconv: bool = False) -> jax.Array:
        """Synthesis only (path-length regularization wrt ws)."""
        return self.synthesis(ws, noise_mode=noise_mode,
                              fused_modconv=fused_modconv)
