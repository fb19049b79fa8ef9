"""StyleGAN-1-3D generator (AdaIN-based).

Reference: stylegan.py:931-1148 — instance-norm AdaIN modulation
(meanAndStd/AdaIN, :931-959), batch-shuffle style mixing at a random layer
< 6 (conditionalSplit, :961-967), 8-layer plain Linear+LeakyReLU latent
mapping (:977-995), constant 4^3 x 512 ONES input (:1069), conv stages with
per-stage AdaIN affines (A1..A11) and trilinear 2x upsampling to the output
resolution, tanh output.

The reference hardcodes the 128^3 channel schedule 512,512 -> 256,256 ->
128,128 -> 64,64 -> 32,32 -> 16 (independent of filterG); for other
power-of-two resolutions the same halving pattern is truncated/extended
with a floor of 16 channels.
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan3d_tpu.config import Config
from gan3d_tpu.nn.layers import Conv3d
from gan3d_tpu.ops.conv3d import upsample_trilinear3d

Dtype = Any


_ADAIN_MODE = "auto"


def set_fast_adain_mode(mode: str) -> None:
    global _ADAIN_MODE
    assert mode in ("off", "auto", "on"), mode
    _ADAIN_MODE = mode


def fast_adain_enabled() -> bool:
    if _ADAIN_MODE == "auto":
        # Measured step-level GO, replicated (round 5, bench.py
        # --family=stylegan batch 32 on v5e): 63.32/64.07 vol/s vs
        # 62.00/62.00 control (+2.1-3.3%) — the one-pass moments fuse
        # into the producer conv's epilogue, removing the var pass's
        # second full read of the activation. CPU (tests/oracles) keeps
        # the reference two-pass form.
        return jax.default_backend() == "tpu"
    return _ADAIN_MODE == "on"


def ada_in(content: jax.Array, style: jax.Array, eps: float = 1e-5
           ) -> jax.Array:
    """Instance-normalize content and re-scale with style (mean ++ std).

    content: [N, D, H, W, C]; style: [N, 2C] (first C = means, last C = stds
    — reference AdaIN, stylegan.py:942-959).

    Two lowerings, identical algebra:
    - reference form: mean pass (fuses into the producing conv), var pass
      (a SECOND full read of x — it depends on mean), normalize+affine;
    - fused form (fast_adain): one-pass moments s1=Σx, s2=Σx² — both
      reductions fuse into the producer's epilogue, eliminating the var
      read — then the apply folded to a single FMA x·A + B with
      A = s_std/σ, B = s_mean − μ·A. Uses E[x²]−μ² (exact algebra; f32
      rounding differs ~1e-6 relative for post-lrelu activations).
    """
    c = content.shape[-1]
    x32 = content.astype(jnp.float32)
    # reference meanAndStd uses torch .var default = UNBIASED variance
    n_el = content.shape[1] * content.shape[2] * content.shape[3]
    s_mean = style[:, :c].reshape(-1, 1, 1, 1, c).astype(jnp.float32)
    s_std = style[:, c:].reshape(-1, 1, 1, 1, c).astype(jnp.float32)
    if fast_adain_enabled():
        s1 = jnp.sum(x32, axis=(1, 2, 3), keepdims=True)
        s2 = jnp.sum(x32 * x32, axis=(1, 2, 3), keepdims=True)
        mean = s1 / n_el
        var = jnp.maximum(s2 / n_el - mean * mean, 0.0) * (n_el / (n_el - 1))
        a = s_std * jax.lax.rsqrt(var + eps)
        b = s_mean - mean * a
        return (x32 * a + b).astype(content.dtype)
    mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x32, axis=(1, 2, 3), keepdims=True) * (n_el / (n_el - 1))
    std = jnp.sqrt(var + eps)
    normed = (x32 - mean) / std
    return (normed * s_std + s_mean).astype(content.dtype)


def _stage_channels(resolution: int) -> List[int]:
    """Per-upsample-stage base channels: 512 halved per stage, floor 16."""
    n_up = 0
    r = resolution
    while r > 4:
        r //= 2
        n_up += 1
    return [max(512 >> i, 16) for i in range(n_up + 1)]


class StyleGAN1Generator(nn.Module):
    cfg: Config
    style_mixing: bool = True
    mapping_net: bool = True
    dtype: Optional[Dtype] = None

    @property
    def dim_z(self) -> int:
        return self.cfg.z_size

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True,
                 update_stats: bool = True, w_passed: bool = False
                 ) -> jax.Array:
        del update_stats
        nz = self.cfg.z_size
        dtype = self.dtype or jnp.float32
        z = z.reshape(z.shape[0], -1)
        n = z.shape[0]

        if self.mapping_net and not w_passed:
            w = z
            for i in range(8):
                w = nn.leaky_relu(nn.Dense(nz, name=f"map{i}")(
                    w.astype(jnp.float32)), 0.2)
        else:
            w = z.astype(jnp.float32)

        mix_key = (self.make_rng("mixing")
                   if self.style_mixing and train else None)
        if mix_key is not None:
            k_point, k_perm = jax.random.split(mix_key)
            swap_point = jax.random.randint(k_point, (), 0, 6)
            perm = jax.random.permutation(k_perm, n)

        mix_ctr = 0

        def maybe_mix(w: jax.Array) -> jax.Array:
            """conditionalSplit: shuffle w along the batch at the randomly
            chosen mixing point (reference stylegan.py:961-967, applied at
            6 fixed sites)."""
            nonlocal mix_ctr
            if mix_key is None:
                return w
            shuffled = w[perm]
            out = jnp.where(swap_point == mix_ctr, shuffled, w)
            mix_ctr += 1
            return out

        chans = _stage_channels(self.cfg.resolution)
        affine_i = 0

        def affine(ch: int) -> jax.Array:
            nonlocal affine_i
            affine_i += 1
            return nn.Dense(2 * ch, name=f"A{affine_i}")(w)

        conv_i = 0

        def conv(x: jax.Array, ch: int) -> jax.Array:
            # our Conv3d (same "kernel" param name/shape as flax nn.Conv,
            # lecun init preserved) so the conv routes through the
            # ops/conv3d dispatcher and its measured fast paths.
            nonlocal conv_i
            conv_i += 1
            y = Conv3d(ch, kernel_size=3, padding=1, use_bias=False,
                       kernel_init=nn.initializers.lecun_normal(),
                       name=f"C{conv_i}", dtype=dtype,
                       dx_vjp=True)(x)  # G-only first-order backward gate
            return nn.leaky_relu(y, 0.2)

        # const 4^3 x z ones input (reference stylegan.py:1069); stage
        # pattern: C1 at 4^3, then (up, halve-conv, AdaIN, same-conv, mix)
        # per middle stage, and a single halve-conv at the final stage
        # before A11 + C_out (reference stylegan.py:1071-1147).
        h = jnp.ones((n, 4, 4, 4, z.shape[-1]), dtype)
        h = ada_in(h, affine(z.shape[-1]))          # A1
        h = conv(h, chans[0])                       # C1
        w = maybe_mix(w)

        for stage in range(1, len(chans) - 1):
            h = ada_in(h, affine(chans[stage - 1]))  # A2/A4/A6/A8
            h = upsample_trilinear3d(h, 2)
            h = conv(h, chans[stage])                # halve (C2/C4/…)
            h = ada_in(h, affine(chans[stage]))      # A3/A5/A7/A9
            h = conv(h, chans[stage])                # same (C3/C5/…)
            w = maybe_mix(w)

        h = ada_in(h, affine(chans[-2]))             # A10
        h = upsample_trilinear3d(h, 2)
        h = conv(h, chans[-1])                       # C10
        w = maybe_mix(w)
        h = ada_in(h, affine(chans[-1]))             # A11
        out = Conv3d(1, kernel_size=3, padding=1, use_bias=False,
                     kernel_init=nn.initializers.lecun_normal(),
                     name="C_out", dtype=dtype)(h)
        return jnp.tanh(out)
