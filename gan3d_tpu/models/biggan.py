"""BigGAN-Deep-3D / SNGAN-3D / SAGAN-3D generator and discriminator.

Reference: biggan.py:8-119. One architecture covers three flag variants:
- default (resblock G/D, one deep block per resolution),
- --biggan: doubled blocks per stage (BigGAN-deep pattern; upsample on the
  2nd G block, downsample on the 1st D block — biggan.py:23-27, 83-87),
- --sagan / --biggan: SelfAttention at 32^3 in G / 16^3 in D
  (biggan.py:17, 33-34, 74-75, 93-94),
- --sngan: spectral norm disabled in G (the reference's inverted flag,
  SURVEY §2.3); the deep D blocks are always spectrally normalized.

G: snlinear z -> ch0 * 4^3, reshape to a 4^3 grid, deep blocks up to full
resolution, BN+ReLU+snconv3d -> tanh (biggan.py:40-42, 55-63).
D: snconv3d input conv (k=3), deep blocks down to 4^3, ReLU, global *sum*
pool, snlinear -> 1 (biggan.py:110-119). Orthogonal init for conv/linear
weights (biggan.py:46-53, 102-108).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan3d_tpu.config import Config
from gan3d_tpu.nn.attention import SelfAttention3d
from gan3d_tpu.nn.blocks import DBlockDeep, GBlockDeep
from gan3d_tpu.nn.layers import SNConv3d, SNLinear
from gan3d_tpu.nn.norm import BatchNorm3d
from gan3d_tpu.ops.conv3d import global_sum_pool

Dtype = Any

_ORTHO = nn.initializers.orthogonal()


class Generator(nn.Module):
    cfg: Config
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1

    @property
    def dim_z(self) -> int:
        return self.cfg.z_size

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True,
                 update_stats: bool = True) -> jax.Array:
        cfg = self.cfg
        arch = cfg.biggan_g_arch()
        plain = cfg.sngan  # inverted reference flag: sngan => no SN in G
        dtype = self.dtype or z.dtype
        z = z.reshape(z.shape[0], -1).astype(dtype)

        h = SNLinear(arch["in_channels"][0] * 64, plain=plain,
                     kernel_init=_ORTHO, dtype=dtype, name="linear")(
                         z, update_stats)
        # Reference reshapes channel-major (N, C, 4, 4, 4); we are NDHWC.
        h = h.reshape(h.shape[0], arch["in_channels"][0], 4, 4, 4)
        h = jnp.transpose(h, (0, 2, 3, 4, 1))

        # cfg.remat: rematerialize in backward (activation memory at 128^3 —
        # SURVEY §7 hard part 6). Scope "block" checkpoints each deep block;
        # scope "stage" checkpoints each doubled-block stage and folds the
        # out-head (BN+conv+tanh at full resolution — the model's largest
        # activation) into the last stage's group. Both recompute every op
        # exactly once; "stage" saves ~5x less boundary memory. Function-
        # level nn.remat keeps parameter paths identical across scopes.
        stage_scoped = cfg.remat and cfg.remat_scope == "stage"
        GB = nn.remat(GBlockDeep, static_argnums=(2, 3)) \
            if (cfg.remat and not stage_scoped) else GBlockDeep
        block_kw = dict(plain=plain, dtype=dtype, param_dtype=jnp.float32,
                        bn_axis_name=self.bn_axis_name,
                        bn_groups=self.bn_groups,
                        channel_ratio=cfg.channel_ratio)

        def out_head(mdl, hh, train, update_stats):
            hh = nn.relu(BatchNorm3d(arch["out_channels"][-1],
                                     axis_name=mdl.bn_axis_name,
                                     num_groups=mdl.bn_groups,
                                     name="out_bn")(hh, not train))
            hh = SNConv3d(1, kernel_size=3, padding=1, plain=plain,
                          kernel_init=_ORTHO, dtype=dtype, name="out_conv")(
                              hh, update_stats)
            return jnp.tanh(hh)

        n_stages = len(arch["out_channels"])
        for idx in range(n_stages):
            cin, cout = arch["in_channels"][idx], arch["out_channels"][idx]
            has_attn = (cfg.sagan or cfg.biggan) and arch["attention"][
                arch["resolution"][idx]]
            # Fold the out-head into the last stage's remat group unless an
            # attention block sits between them (resolution-32 models).
            fold_head = stage_scoped and idx == n_stages - 1 and not has_attn

            def stage(mdl, hh, train, update_stats, idx=idx, cin=cin,
                      cout=cout, fold_head=fold_head):
                if cfg.biggan:
                    # Deep pattern: block0 keeps channels, block1 changes +
                    # upsamples.
                    hh = GB(cin, cin, upsample=False,
                            name=f"g{idx}_0", **block_kw)(
                                hh, train, update_stats)
                    hh = GB(cin, cout, upsample=True,
                            name=f"g{idx}_1", **block_kw)(
                                hh, train, update_stats)
                else:
                    hh = GB(cin, cout, upsample=True,
                            name=f"g{idx}_0", **block_kw)(
                                hh, train, update_stats)
                if fold_head:
                    hh = out_head(mdl, hh, train, update_stats)
                return hh

            fn = nn.remat(stage, static_argnums=(2, 3)) if stage_scoped \
                else stage
            h = fn(self, h, train, update_stats)
            if has_attn:
                h = SelfAttention3d(cout, dtype=dtype,
                                    name=f"attn{idx}")(h, update_stats)
            if fold_head:
                return h

        head = nn.remat(out_head, static_argnums=(2, 3)) if stage_scoped \
            else out_head
        return head(self, h, train, update_stats)


class Discriminator(nn.Module):
    cfg: Config
    dtype: Optional[Dtype] = None

    @property
    def dim_z(self) -> int:
        return self.cfg.z_size

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        cfg = self.cfg
        arch = cfg.biggan_d_arch()
        dtype = self.dtype or x.dtype

        # remat_scope="stage": checkpoint per doubled-block stage, folding
        # the full-resolution input conv (reference biggan.py:78) into the
        # first stage's group so its 64-ch full-res output is recomputed
        # instead of saved (see Generator above / config.remat_scope).
        stage_scoped = cfg.remat and cfg.remat_scope == "stage"
        DB = nn.remat(DBlockDeep, static_argnums=(2,)) \
            if (cfg.remat and not stage_scoped) else DBlockDeep
        kw = dict(dtype=dtype, param_dtype=jnp.float32,
                  channel_ratio=cfg.channel_ratio)

        def input_conv(mdl, hh, update_stats):
            # Input conv uses the sngan flag (reference biggan.py:78), but
            # deep blocks are always SN (utils.py:101-106).
            return SNConv3d(arch["in_channels"][0], kernel_size=3, padding=1,
                            plain=cfg.sngan, kernel_init=_ORTHO, dtype=dtype,
                            name="input_conv")(hh, update_stats)

        h = x.astype(dtype)
        for idx in range(len(arch["out_channels"])):
            cin, cout = arch["in_channels"][idx], arch["out_channels"][idx]
            down = arch["downsample"][idx]

            def stage(mdl, hh, update_stats, idx=idx, cin=cin, cout=cout,
                      down=down):
                if idx == 0:
                    hh = input_conv(mdl, hh, update_stats)
                if cfg.biggan:
                    hh = DB(cin, cout, downsample=down,
                            name=f"d{idx}_0", **kw)(hh, update_stats)
                    hh = DB(cout, cout, downsample=False,
                            name=f"d{idx}_1", **kw)(hh, update_stats)
                else:
                    hh = DB(cin, cout, downsample=down,
                            name=f"d{idx}_0", **kw)(hh, update_stats)
                return hh

            fn = nn.remat(stage, static_argnums=(2,)) if stage_scoped \
                else stage
            h = fn(self, h, update_stats)
            if (cfg.sagan or cfg.biggan) and arch["attention"][
                    arch["resolution"][idx]]:
                h = SelfAttention3d(cout, dtype=dtype,
                                    name=f"attn{idx}")(h, update_stats)

        h = global_sum_pool(nn.relu(h))  # [N, C]
        out = SNLinear(1, plain=cfg.sngan, kernel_init=_ORTHO, dtype=dtype,
                       name="linear")(h, update_stats)
        return out
