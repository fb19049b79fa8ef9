"""MSL RandomCrop3D — reconstructed from its usage contract.

The reference imports ``msl.RandomCrop3D`` (reference: dcgan.py:4) but ships
no msl.py; from its call site (dcgan.py:96-116) and the --msl help text
(main.py:29) the contract is: a single-channel volume [N, R, R, R, 1] maps to
[N, R/2, R/2, R/2, n_crops] — n_crops random (R/2)^3 crops of the volume
stacked as channels, resampled every forward.

TPU-native formulation: instead of per-crop dynamic_slice (which would issue
n_crops gathers), all crops for a sample are realized as one gather with
precomputed index grids, which XLA vectorizes. Crop offsets come from the
module's ``crops`` RNG stream.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class RandomCrop3D(nn.Module):
    n_crops: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, d, h, w, c = x.shape
        assert c == 1, "RandomCrop3D expects a single-channel volume"
        cd, ch, cw = d // 2, h // 2, w // 2
        key = self.make_rng("crops")
        offs = jax.random.randint(
            key, (n, self.n_crops, 3), 0,
            jnp.array([d - cd + 1, h - ch + 1, w - cw + 1]))

        base_d = jnp.arange(cd)
        base_h = jnp.arange(ch)
        base_w = jnp.arange(cw)

        def crop_one(vol, off):  # vol [D,H,W], off [3]
            return vol[
                off[0] + base_d[:, None, None],
                off[1] + base_h[None, :, None],
                off[2] + base_w[None, None, :],
            ]

        # vmap over crops, then samples → [N, n_crops, cd, ch, cw]
        crops = jax.vmap(lambda vol, o: jax.vmap(crop_one, (None, 0))(vol, o))(
            x[..., 0], offs)
        return jnp.moveaxis(crops, 1, -1)  # [N, cd, ch, cw, n_crops]
