"""Inception-V3 (FID variant) feature extractor in flax.

The reference computes per-axis slice FID through pytorch_fid_wrapper
(reference: eval_utils.py:65-84), whose backbone is the pytorch_fid
Inception-V3: torchvision's inception_v3 graph with the FID-specific
pooling patches (average pooling with count_include_pad=False in the
InceptionA/C/E branch-pool paths, and max pooling in the second InceptionE),
BatchNorm eps 1e-3, and the TF preprocessing (bilinear resize to 299 and
x*2-1 on [0,1] inputs). Features are the 2048-d global average pool.

`load_torch_weights` converts the standard pt_inception-2015-12-05 torch
state_dict (keys like `Mixed_5b.branch1x1.conv.weight`). Without a weights
file the model runs randomly initialized — usable for pipeline tests, NOT
comparable to published FID numbers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

BN_EPS = 1e-3


class ConvBN(nn.Module):
    """conv (no bias) + BN(eps=1e-3, affine scale/bias) + relu."""

    features: int
    kernel: Sequence[int]
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad),) * 2
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=BN_EPS,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool_3x3_nopad_count(x: jax.Array) -> jax.Array:
    """avg_pool 3x3 stride 1 pad 1 with count_include_pad=False (the FID
    patch on the InceptionA/C/E branch-pool paths)."""
    return nn.pooling.avg_pool(x, (3, 3), strides=(1, 1),
                               padding=((1, 1), (1, 1)),
                               count_include_pad=False)


def _max_pool(x, k, s):
    return nn.pooling.max_pool(x, (k, k), strides=(s, s))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_nopad_count(x)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_nopad_count(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FIDInceptionE_2 patch

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.pooling.max_pool(x, (3, 3), strides=(1, 1),
                                     padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3_nopad_count(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns 2048-d pooled FID features for [N, H, W, 3] inputs in [0, 1]."""

    resize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.resize and x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        x = x * 2.0 - 1.0  # TF inception preprocessing
        x = ConvBN(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [N, 2048]


def load_torch_weights(path: str) -> Dict[str, Any]:
    """Convert a pt_inception torch state_dict into flax variables."""
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # np.array copy: torch .numpy() shares the buffer and JAX CPU zero-copies
    # numpy — without it the flax variables would alias live torch tensors.
    sd = {k: np.array(v.numpy()) for k, v in sd.items()
          if not k.startswith("fc.")}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, parts, leaf):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(leaf)

    for k, v in sd.items():
        parts = k.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"],
                np.transpose(v, (2, 3, 1, 0)))
        elif parts[-2] == "bn":
            if parts[-1] == "weight":
                put(params, parts[:-1] + ["scale"], v)
            elif parts[-1] == "bias":
                put(params, parts[:-1] + ["bias"], v)
            elif parts[-1] == "running_mean":
                put(stats, parts[:-1] + ["mean"], v)
            elif parts[-1] == "running_var":
                put(stats, parts[:-1] + ["var"], v)
    return {"params": params, "batch_stats": stats}


class InceptionV3Features:
    """Callable [N, H, W, 3] -> [N, 2048] with jitted apply."""

    def __init__(self, weights_path: Optional[str] = None):
        self.model = InceptionV3()
        if weights_path:
            self.variables = load_torch_weights(weights_path)
        else:
            self.variables = self.model.init(
                jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
        # weights as jit argument, not closure (HLO-constant bloat otherwise)
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    def __call__(self, x: jax.Array) -> jax.Array:
        return self._apply(self.variables, x)
