"""StyleGAN2 primitive layers.

Reference: stylegan.py:103-124 (bias_act), 298-327 (FullyConnectedLayer),
396-444 (modulated_conv3d), 446-546 (Conv3dLayer / SynthesisLayer /
OutBlock).

TPU note on modulated conv: the reference's fused path turns the batch into
convolution groups (stylegan.py:437-441), which maps poorly onto XLA/MXU;
training in the reference uses the NON-fused scale-activations formulation
anyway (fused_modconv=False whenever training — stylegan.py:601), and that
is the only path implemented here. It is mathematically identical.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gan3d_tpu.models.stylegan.resample import conv3d_resample, setup_filter

Dtype = Any

ACTIVATIONS: dict[str, Callable] = {
    "linear": lambda x: x,
    "relu": nn.relu,
    "lrelu": lambda x: nn.leaky_relu(x, 0.2),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
}


_C1ACT_MODE = "auto"


def set_c1act_mode(mode: str) -> None:
    global _C1ACT_MODE
    assert mode in ("off", "auto", "on"), mode
    _C1ACT_MODE = mode


def c1act_enabled() -> bool:
    """Apply bias+activation of C=1 tensors on the channel-squeezed 4-D
    view. The StyleGAN D's fromrgb at the reference channel table is a
    1-CHANNEL conv at top resolution, and its leaky_relu compare_selects
    run pinned in the degenerate C=1 T(2,128) layout (14.2 ms = 5% of the
    sg1 64^3 step, round-3 session-5 trace). Squeezing C lets XLA lay the
    elementwise out densely. auto = per the measured step-level A/B."""
    if _C1ACT_MODE == "auto":
        # Measured step-level NO-GO, replicated (round 5, bench.py
        # --family=stylegan batch 32 on v5e): 61.43/61.43 vol/s forced-on
        # vs 62.00/62.00 control (-0.9%) — the squeezed view forces
        # relayout copies around the reshape that cost more than the
        # degenerate-layout elementwise saves. Kept as the recorded
        # negative result (forceable for re-measurement).
        return False
    return _C1ACT_MODE == "on"


def bias_act(x: jax.Array, b: Optional[jax.Array] = None,
             act: str = "linear") -> jax.Array:
    """Add channel bias (last axis in NDHWC) then activate."""
    if (x.ndim == 5 and x.shape[-1] == 1 and act != "linear"
            and c1act_enabled()):
        y = x.reshape(x.shape[:-1])
        if b is not None:
            y = y + b.astype(x.dtype)[0]
        return ACTIVATIONS[act](y).reshape(x.shape)
    if b is not None:
        x = x + b.astype(x.dtype)
    return ACTIVATIONS[act](x)


def normalize_2nd_moment(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1,
                                      keepdims=True) + eps)


class FullyConnectedLayer(nn.Module):
    """FC with runtime weight gain lr_mult/sqrt(fan_in) and the lr-multiplier
    trick (weights stored divided by lr_mult — reference stylegan.py:309-312)."""

    features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        w = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape, self.param_dtype)
            / self.lr_multiplier,
            (in_f, self.features))
        gain = self.lr_multiplier / np.sqrt(in_f)
        y = jnp.dot(x, (w * gain).astype(x.dtype),
                    preferred_element_type=x.dtype)
        b = None
        if self.use_bias:
            b = self.param(
                "bias",
                lambda key, shape: jnp.full(shape, np.float32(self.bias_init),
                                            self.param_dtype),
                (self.features,))
            if self.lr_multiplier != 1:
                b = b * self.lr_multiplier
        return bias_act(y, b, act=self.activation)


def modulated_conv3d(
    x: jax.Array,                 # [N, D, H, W, Cin]
    weight: jax.Array,            # [kd, kh, kw, Cin, Cout]
    styles: jax.Array,            # [N, Cin]
    noise: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[jnp.ndarray] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
    fused: bool = False,
    resample_taps=None,
) -> jax.Array:
    """StyleGAN2 modulated conv.

    ``fused=False`` (reference stylegan.py:426-435, the reference's TRAINING
    path): scale activations by styles, convolve with the shared weight,
    then scale outputs by the demodulation coefficients; optional noise add.

    ``fused=True`` (reference stylegan.py:438-445, chosen when NOT training
    — stylegan.py:601): fold modulation and demodulation into per-sample
    weights and convolve each sample with its own kernel.  The reference
    uses a grouped conv with groups=batch; here a vmap'd conv lowers to the
    same batched contraction without the grouped-conv layout.  Numerically
    this differs from non-fused only in f32 summation order (no fp16
    pre-normalization needed: compute is bf16/f32 on TPU)."""
    n = x.shape[0]
    kd, kh, kw, cin, cout = weight.shape

    if fused:
        w = (weight.astype(jnp.float32)[None]
             * styles.astype(jnp.float32).reshape(n, 1, 1, 1, cin, 1))
        if demodulate:
            d = jax.lax.rsqrt(
                jnp.sum(jnp.square(w), axis=(1, 2, 3, 4)) + 1e-8)  # [N, Cout]
            w = w * d.reshape(n, 1, 1, 1, 1, cout)
        y = jax.vmap(
            lambda xi, wi: conv3d_resample(
                xi[None], wi, f=resample_filter, up=up, down=down,
                padding=padding, flip_weight=flip_weight,
                f1d=resample_taps)[0]
        )(x, w.astype(x.dtype))
        if noise is not None:
            y = y + noise.astype(y.dtype)
        return y

    dcoefs = None
    if demodulate:
        # [N, Cout] = rsqrt(sum over (k, Cin) of (w * style)^2); fp32 for
        # stability regardless of compute dtype.
        w32 = weight.astype(jnp.float32)
        s32 = styles.astype(jnp.float32)
        wsq = jnp.einsum("dhwio,ni->no", jnp.square(w32),
                         jnp.square(s32))
        dcoefs = jax.lax.rsqrt(wsq + 1e-8)

    x = x * styles.astype(x.dtype).reshape(n, 1, 1, 1, cin)
    x = conv3d_resample(x, weight.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=padding, flip_weight=flip_weight,
                        f1d=resample_taps)
    if demodulate and noise is not None:
        x = noise.astype(x.dtype) + x * dcoefs.astype(x.dtype).reshape(
            n, 1, 1, 1, cout)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype).reshape(n, 1, 1, 1, cout)
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x


class Conv3dLayer(nn.Module):
    """Plain conv + resample + bias_act (reference stylegan.py:446-487);
    used by the StyleGAN discriminator."""

    features: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_taps: Sequence[int] = (1, 3, 3, 1)
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, gain: float = 1.0) -> jax.Array:
        k = self.kernel_size
        in_ch = x.shape[-1]
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, k, in_ch, self.features), self.param_dtype)
        weight_gain = 1.0 / np.sqrt(in_ch * k ** 3)
        f = setup_filter(self.resample_taps)
        flip_weight = self.up == 1
        y = conv3d_resample(x, (weight * weight_gain).astype(x.dtype), f=f,
                            up=self.up, down=self.down, padding=k // 2,
                            flip_weight=flip_weight,
                            f1d=tuple(self.resample_taps))
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype) if self.use_bias else None
        y = bias_act(y, b, act=self.activation)
        if gain != 1.0:
            y = y * jnp.asarray(gain, y.dtype)
        return y


class SynthesisLayer(nn.Module):
    """Modulated conv layer with per-layer noise (reference
    stylegan.py:489-532). Noise is drawn from the module's ``noise`` RNG
    stream; noise_mode='const' uses a stored buffer (NB the reference's
    const buffer is 2-D [res, res] — stylegan.py:515, a known quirk; ours is
    a proper [res, res, res] volume)."""

    features: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_taps: Sequence[int] = (1, 3, 3, 1)
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array,
                 noise_mode: str = "random", gain: float = 1.0,
                 fused_modconv: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        styles = FullyConnectedLayer(in_ch, bias_init=1.0, name="affine",
                                     param_dtype=self.param_dtype)(
                                         w.astype(jnp.float32))
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.kernel_size,) * 3 + (in_ch, self.features),
                            self.param_dtype)
        noise = None
        if self.use_noise:
            strength = self.param("noise_strength", nn.initializers.zeros,
                                  (), self.param_dtype)
            r = self.resolution
            if noise_mode == "random":
                key = self.make_rng("noise")
                noise = jax.random.normal(
                    key, (x.shape[0], r, r, r, 1), jnp.float32) * strength
            elif noise_mode == "const":
                const = self.variable(
                    "noise_consts", "noise_const",
                    lambda: jax.random.normal(self.make_rng("params"),
                                              (r, r, r, 1), jnp.float32))
                noise = const.value * strength

        y = modulated_conv3d(
            x, weight, styles, noise=noise, up=self.up,
            padding=self.kernel_size // 2,
            resample_filter=setup_filter(self.resample_taps),
            flip_weight=(self.up == 1), fused=fused_modconv,
            resample_taps=tuple(self.resample_taps))
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        y = bias_act(y, b, act=self.activation)
        if gain != 1.0:
            y = y * jnp.asarray(gain, y.dtype)
        return y


class OutBlock(nn.Module):
    """toRGB: modulated 1x1x1 conv without demodulation (reference
    stylegan.py:534-546)."""

    features: int
    w_dim: int
    kernel_size: int = 1
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array,
                 fused_modconv: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        weight_gain = 1.0 / np.sqrt(in_ch * self.kernel_size ** 3)
        styles = FullyConnectedLayer(in_ch, bias_init=1.0, name="affine",
                                     param_dtype=self.param_dtype)(
                                         w.astype(jnp.float32)) * weight_gain
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.kernel_size,) * 3 + (in_ch, self.features),
                            self.param_dtype)
        y = modulated_conv3d(x, weight, styles, demodulate=False,
                             fused=fused_modconv)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        return bias_act(y, b)
