"""Per-axis 2D slice FID.

Reference: eval_utils.py:65-84 — volumes are reshaped to 2D slices along
the three anatomical axes (axial = native; coronal via transpose(2,3);
sagittal via transpose(4,2) in NCDHW terms), each slice expanded to 3
channels, and Inception-V3 FID is computed via pytorch_fid_wrapper.

Here the feature extractor is pluggable:
- `InceptionV3Features` (gan3d_tpu.eval.inception) when the standard
  pt_inception weights file is available (pass `weights_path`);
- otherwise a deterministic frozen random-conv extractor is used as a
  stand-in so the slice-FID pipeline stays runnable end-to-end; distances
  from random features still separate distributions (random-projection FID)
  but are NOT comparable to Inception-FID numbers — a warning is printed.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan3d_tpu.eval.metrics import frechet_distance


class RandomConvFeatures2D(nn.Module):
    """Frozen random CNN: [N, H, W, 3] -> [N, dim] (seeded, deterministic)."""

    dim: int = 256

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for f in (32, 64, 128):
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.dim)(x)


def _volumes_to_slices(v: jax.Array, axis: str) -> jax.Array:
    """[N, D, H, W(, 1)] -> [N*S, side, side, 3] slice stack.

    axial: slices over D; coronal: transpose (D, H); sagittal: swap (W, D)
    — matching the reference's NCDHW transpose(2,3) / transpose(4,2).
    """
    if v.ndim == 5:
        v = v[..., 0]
    if axis == "coronal":
        v = jnp.swapaxes(v, 1, 2)
    elif axis == "sagittal":
        v = jnp.swapaxes(v, 3, 1)
    n, d, h, w = v.shape
    s = v.reshape(n * d, h, w, 1)
    return jnp.broadcast_to(s, (n * d, h, w, 3))


class SliceFID:
    def __init__(self, extractor: Optional[Callable] = None,
                 weights_path: Optional[str] = None,
                 batch_size: int = 128):
        self.batch_size = batch_size
        if extractor is not None:
            self._features = extractor
        elif weights_path:
            from gan3d_tpu.eval.inception import InceptionV3Features

            self._features = InceptionV3Features(weights_path)
        else:
            print("SliceFID: no Inception weights — using a frozen "
                  "random-feature extractor (values not comparable to "
                  "Inception FID)", flush=True)
            model = RandomConvFeatures2D()
            variables = model.init(jax.random.key(0),
                                   jnp.zeros((1, 8, 8, 3)))
            jitted = jax.jit(lambda v, x: model.apply(v, x))
            self._features = lambda x: jitted(variables, x)

    def _acts(self, slices: jax.Array) -> np.ndarray:
        outs = []
        for i in range(0, slices.shape[0], self.batch_size):
            outs.append(np.asarray(
                self._features(slices[i : i + self.batch_size])))
        return np.concatenate(outs)

    def _fid_axis(self, real, fake, axis: str) -> float:
        a1 = self._acts(_volumes_to_slices(jnp.asarray(real), axis))
        a2 = self._acts(_volumes_to_slices(jnp.asarray(fake), axis))
        return frechet_distance(a1, a2)

    def axial(self, fake, real) -> float:
        return self._fid_axis(real, fake, "axial")

    def __call__(self, real, fake) -> Tuple[float, float, float]:
        """Returns (fid_ax, fid_cor, fid_sag) like eval_utils.fid."""
        return (self._fid_axis(real, fake, "axial"),
                self._fid_axis(real, fake, "coronal"),
                self._fid_axis(real, fake, "sagittal"))
