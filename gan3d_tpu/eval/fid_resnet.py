"""MedicalNet-style 3D ResNet-50 feature extractor for 3D-FID.

Reference: FID_ResNet.py:105-189 — Bottleneck [3, 4, 6, 3]; 7^3 stride-2
stem; maxpool k3 s2 p1; layers of widths 64/128/256/512 where layers 3-4
use dilation 2 and 4 instead of stride; shortcut type 'B' (1x1 conv + BN);
the forward returns the layer4 feature MAP (no pooling or head).

Runs in eval mode (BN running stats) and float32 — FID features must not be
quantized by bf16. Weights come from the reference's `resnet_50.pth`
MedicalNet checkpoint via `load_torch_weights` (eval_utils.py:54-63 strips
the `module.` prefix; our converter handles both).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan3d_tpu.nn.layers import Conv3d
from gan3d_tpu.nn.norm import BatchNorm3d
from gan3d_tpu.ops.conv3d import max_pool3d

LAYERS = (3, 4, 6, 3)          # ResNet-50
WIDTHS = (64, 128, 256, 512)
STRIDES = (1, 2, 1, 1)
DILATIONS = (1, 1, 2, 4)
EXPANSION = 4


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = lambda f, name, **kw: Conv3d(  # noqa: E731
            f, use_bias=False, name=name, **kw)
        bn = lambda f, name: BatchNorm3d(f, name=name)  # noqa: E731

        h = conv(self.planes, "conv1", kernel_size=1, padding=0)(x)
        h = nn.relu(bn(self.planes, "bn1")(h, use_running_average=True))
        h = conv(self.planes, "conv2", kernel_size=3, stride=self.stride,
                 dilation=self.dilation, padding=self.dilation)(h)
        h = nn.relu(bn(self.planes, "bn2")(h, use_running_average=True))
        h = conv(self.planes * EXPANSION, "conv3", kernel_size=1, padding=0)(h)
        h = bn(self.planes * EXPANSION, "bn3")(h, use_running_average=True)

        sc = x
        if self.has_downsample:
            sc = conv(self.planes * EXPANSION, "downsample_conv",
                      kernel_size=1, stride=self.stride, padding=0)(x)
            sc = bn(self.planes * EXPANSION, "downsample_bn")(
                sc, use_running_average=True)
        return nn.relu(h + sc)


class FIDResNet50(nn.Module):
    """Returns the layer4 feature map [N, D', H', W', 2048]."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(jnp.float32)
        x = Conv3d(64, kernel_size=7, stride=2, padding=3, use_bias=False,
                   name="conv1")(x)
        x = nn.relu(BatchNorm3d(64, name="bn1")(x, use_running_average=True))
        x = max_pool3d(x, 3, stride=2, padding=1)

        inplanes = 64
        for li, (blocks, planes, stride, dilation) in enumerate(
                zip(LAYERS, WIDTHS, STRIDES, DILATIONS), start=1):
            for bi in range(blocks):
                need_ds = bi == 0 and (stride != 1
                                       or inplanes != planes * EXPANSION)
                x = Bottleneck(planes,
                               stride=stride if bi == 0 else 1,
                               dilation=dilation,
                               has_downsample=need_ds,
                               name=f"layer{li}_{bi}")(x)
            inplanes = planes * EXPANSION
        return x


def load_torch_weights(path: str) -> Dict[str, Any]:
    """Convert the MedicalNet `resnet_50.pth` torch checkpoint into flax
    variables for FIDResNet50. Accepts keys with or without the `module.`
    DataParallel prefix (reference eval_utils.py:58-61)."""
    import numpy as np
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    # np.array copy: torch .numpy() shares the buffer and JAX CPU zero-copies
    # numpy — without it the flax variables would alias live torch tensors.
    sd = {(k[7:] if k.startswith("module.") else k): np.array(v.numpy())
          for k, v in sd.items()}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path_parts, leaf):
        node = tree
        for p in path_parts[:-1]:
            node = node.setdefault(p, {})
        node[path_parts[-1]] = jnp.asarray(leaf)

    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] in ("conv1", "bn1"):
            mod, rest = parts[0], parts[1:]
            flax_mod = [mod]
        elif parts[0].startswith("layer"):
            li, bi = parts[0], parts[1]
            sub = parts[2]
            rest = parts[3:]
            if sub == "downsample":
                sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
                rest = parts[4:]
            flax_mod = [f"{li[:5]}{li[5:]}_{bi}", sub]
        else:
            continue  # e.g. segmentation head keys not used by FID
        leaf = rest[0] if rest else ""
        if leaf == "weight" and v.ndim == 5:
            put(params, flax_mod + ["kernel"], np.transpose(v, (2, 3, 4, 1, 0)))
        elif leaf == "weight":
            put(params, flax_mod + ["scale"], v)
        elif leaf == "bias":
            put(params, flax_mod + ["bias"], v)
        elif leaf == "running_mean":
            put(stats, flax_mod + ["mean"], v)
        elif leaf == "running_var":
            put(stats, flax_mod + ["var"], v)
    return {"params": params, "batch_stats": stats}


def get_fid_model(path: Optional[str] = None):
    """Returns (module, variables, feature_fn). With path=None the model is
    randomly initialized (for tests / calibration without the checkpoint)."""
    model = FIDResNet50()
    if path:
        variables = load_torch_weights(path)
    else:
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, 32, 32, 32, 1)))

    # Weights as a jit ARGUMENT (a closure capture would embed them as HLO
    # constants and overflow the axon remote-compile request at scale).
    @jax.jit
    def _features(v, x: jax.Array) -> jax.Array:
        fmap = model.apply(v, x)
        return jnp.mean(fmap, axis=(1, 2, 3))

    def features(x: jax.Array) -> jax.Array:
        """Volume [N, D, H, W, 1] -> pooled features [N, 2048]
        (reference eval_utils.py:43-44 mean over spatial dims)."""
        return _features(variables, x)

    return model, variables, features
