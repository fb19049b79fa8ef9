"""Conv / Linear layers with optional spectral normalization.

Spectral norm follows torch.nn.utils.parametrizations.spectral_norm
semantics (the reference wraps every BigGAN conv/linear in it —
reference: utils.py:8-20):

- the weight is viewed as a matrix [out, in*kd*kh*kw] (dim 0 first),
- one power-method step per *training* forward:
      u <- normalize(W v);  v <- normalize(W^T u)
  with the updated vectors stored as non-trainable state,
- sigma = u . (W v) with gradients flowing through W only,
- at init, 15 power-method steps warm-start (u, v).

The power-iteration vectors live in the ``spectral`` variable collection and
are updated whenever the module is applied with ``update_stats=True`` and
``spectral`` is mutable — mirroring torch's "update every forward while in
train mode" behavior, which notably includes G forwards during D steps and
vice versa (reference: trainer.py:208-283).

The reference's inverted flag quirk — ``sngan=True`` returns a PLAIN layer
(reference: utils.py:9-11) — is expressed here as an explicit ``plain``
attribute on SNConv3d/SNLinear.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan3d_tpu.ops.conv3d import _triple, conv3d, conv_transpose3d
from gan3d_tpu.ops.downsample_conv import (
    avgpool_concat_conv3d,
    avgpool_conv3d,
)
from gan3d_tpu.ops.upsample_conv import (
    fast_upconv_variant,
    upsample_conv3d,
    upsample_conv3d_tconv,
)

Dtype = Any
IntOr3 = Union[int, Sequence[int]]

SN_EPS = 1e-12
SN_INIT_ITERS = 15


def _l2_normalize(x: jax.Array, eps: float = SN_EPS) -> jax.Array:
    # torch F.normalize: x / max(||x||, eps)
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def _power_iter(w_mat: jax.Array, u: jax.Array, v: jax.Array,
                n: int) -> Tuple[jax.Array, jax.Array]:
    for _ in range(n):
        u = _l2_normalize(w_mat @ v)
        v = _l2_normalize(w_mat.T @ u)
    return u, v


def spectral_sigma(w_mat: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """sigma = u . (W v); gradients flow through W only."""
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    return u @ (w_mat @ v)


class _SpectralState:
    """Mixin: create/update (u, v) for a weight matrix inside a linen module."""

    def _sn_vectors(self, w_mat: jax.Array):
        h, w = w_mat.shape

        def init_uv():
            key = self.make_rng("params")
            ku, kv = jax.random.split(key)
            u0 = _l2_normalize(jax.random.normal(ku, (h,), jnp.float32))
            v0 = _l2_normalize(jax.random.normal(kv, (w,), jnp.float32))
            return _power_iter(jax.lax.stop_gradient(w_mat.astype(jnp.float32)),
                               u0, v0, SN_INIT_ITERS)

        if self.has_variable("spectral", "u"):
            u_var = self.variable("spectral", "u", None)
            v_var = self.variable("spectral", "v", None)
        else:
            u0, v0 = init_uv()
            u_var = self.variable("spectral", "u", lambda: u0)
            v_var = self.variable("spectral", "v", lambda: v0)
        return u_var, v_var

    def _sn_weight(self, kernel: jax.Array, w_mat: jax.Array,
                   update_stats: bool) -> jax.Array:
        """Return kernel / sigma, updating (u, v) if training."""
        u_var, v_var = self._sn_vectors(w_mat)
        u, v = u_var.value, v_var.value
        if update_stats:
            w32 = jax.lax.stop_gradient(w_mat).astype(jnp.float32)
            u, v = _power_iter(w32, u, v, 1)
            if not self.is_initializing():
                u_var.value = u
                v_var.value = v
        sigma = spectral_sigma(w_mat.astype(jnp.float32), u, v)
        return (kernel.astype(jnp.float32) / sigma).astype(kernel.dtype)


def normal_init(std: float = 0.02) -> Callable:
    return nn.initializers.normal(stddev=std)


def torch_conv_default_init(fan_in: int) -> Callable:
    """torch Conv default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)
    return nn.initializers.uniform(scale=2 * bound, offset=-bound)  # type: ignore[call-arg]


def _uniform(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv3d(nn.Module):
    """Plain 3D conv, NDHWC, kernel [kd, kh, kw, in/groups, out]."""

    features: int
    kernel_size: IntOr3 = 3
    stride: IntOr3 = 1
    padding: IntOr3 = 0
    dilation: IntOr3 = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    # dx_vjp: route through the first-order explicit-conv backward
    # (ops/dx_conv.py) when its gate matches. Generator-only — custom_vjp
    # breaks grad-of-grad, so never set on discriminator convs (R1).
    dx_vjp: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = (self.kernel_size,) * 3 if isinstance(self.kernel_size, int) \
            else tuple(self.kernel_size)
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * k[0] * k[1] * k[2]
        kinit = self.kernel_init or _uniform(1.0 / fan_in ** 0.5)
        kernel = self.param("kernel", kinit,
                            (*k, in_ch // self.groups, self.features),
                            self.param_dtype)
        dtype = self.dtype or x.dtype
        from gan3d_tpu.ops import dx_conv

        s3 = (self.stride,) * 3 if isinstance(self.stride, int) \
            else tuple(self.stride)
        d3 = (self.dilation,) * 3 if isinstance(self.dilation, int) \
            else tuple(self.dilation)
        p3 = (self.padding,) * 3 if isinstance(self.padding, int) \
            else tuple(self.padding)
        if (self.dx_vjp and dx_conv.conv_dx_enabled()
                and dx_conv.eligible(x.shape, kernel.shape, s3, p3, d3,
                                     self.groups)):
            y = dx_conv.conv3d_dx(x.astype(dtype), kernel.astype(dtype), p3)
        else:
            y = conv3d(x.astype(dtype), kernel.astype(dtype), self.stride,
                       self.padding, self.dilation, self.groups)
        if self.use_bias:
            binit = self.bias_init or _uniform(1.0 / fan_in ** 0.5)
            bias = self.param("bias", binit, (self.features,), self.param_dtype)
            y = y + bias.astype(dtype)
        return y


class ConvTranspose3d(nn.Module):
    """Transposed 3D conv, torch semantics, kernel [kd, kh, kw, in, out]."""

    features: int
    kernel_size: IntOr3 = 4
    stride: IntOr3 = 2
    padding: IntOr3 = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = (self.kernel_size,) * 3 if isinstance(self.kernel_size, int) \
            else tuple(self.kernel_size)
        in_ch = x.shape[-1]
        # torch fan_in for ConvTranspose: out_ch * prod(k) / groups; bias bound
        # uses the same. Default init rarely matters (models override).
        fan_in = self.features * k[0] * k[1] * k[2]
        kinit = self.kernel_init or _uniform(1.0 / fan_in ** 0.5)
        kernel = self.param("kernel", kinit, (*k, in_ch, self.features),
                            self.param_dtype)
        dtype = self.dtype or x.dtype
        y = conv_transpose3d(x.astype(dtype), kernel.astype(dtype),
                             self.stride, self.padding)
        if self.use_bias:
            binit = self.bias_init or _uniform(1.0 / fan_in ** 0.5)
            bias = self.param("bias", binit, (self.features,), self.param_dtype)
            y = y + bias.astype(dtype)
        return y


class Linear(nn.Module):
    """Dense layer, kernel [in, out]."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        kinit = self.kernel_init or _uniform(1.0 / in_f ** 0.5)
        kernel = self.param("kernel", kinit, (in_f, self.features),
                            self.param_dtype)
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                    preferred_element_type=dtype)
        if self.use_bias:
            binit = self.bias_init or _uniform(1.0 / in_f ** 0.5)
            bias = self.param("bias", binit, (self.features,), self.param_dtype)
            y = y + bias.astype(dtype)
        return y


class SNConv3d(nn.Module, _SpectralState):
    """Spectrally-normalized 3D conv (reference: utils.py snconv3d).

    ``plain=True`` disables SN entirely — the reference's inverted
    ``sngan=True`` case (utils.py:9-11).
    """

    features: int
    kernel_size: IntOr3 = 3
    stride: IntOr3 = 1
    padding: IntOr3 = 1
    dilation: IntOr3 = 1
    use_bias: bool = True
    plain: bool = False
    fuse_upsample: bool = False  # fused nearest-2x-up + conv (k=3/s=1/p=1
    #                              only); params identical to the unfused
    #                              layer — see ops/upsample_conv.py
    fuse_avgpool: bool = False   # conv consumes avg_pool3d(x, 2), fused as
    #                              one k=2/s=2 conv (k=1/s=1/p=0 only);
    #                              params identical — ops/downsample_conv.py
    fuse_avgpool_concat: bool = False  # output = concat([avgpool(x),
    #                              conv(avgpool(x))]) in one conv — the
    #                              DBlockDeep shortcut; bias covers the conv
    #                              half only (as in the composed form)
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        k = (self.kernel_size,) * 3 if isinstance(self.kernel_size, int) \
            else tuple(self.kernel_size)
        in_ch = x.shape[-1]
        fan_in = in_ch * k[0] * k[1] * k[2]
        kinit = self.kernel_init or _uniform(1.0 / fan_in ** 0.5)
        kernel = self.param("kernel", kinit, (*k, in_ch, self.features),
                            self.param_dtype)
        if not self.plain:
            # Match torch's matrix view: [out, in*kd*kh*kw] with torch's
            # (O, I, kd, kh, kw) element order, so converted (u, v) states
            # line up exactly.
            w_mat = jnp.transpose(kernel, (4, 3, 0, 1, 2)).reshape(
                self.features, -1)
            kernel = self._sn_weight(kernel, w_mat, update_stats)
        dtype = self.dtype or x.dtype
        if self.fuse_upsample:
            assert k == (3, 3, 3) and _triple(self.stride) == (1, 1, 1) \
                and _triple(self.padding) == (1, 1, 1), \
                "fuse_upsample requires k=3, stride 1, padding 1"
            fused = (upsample_conv3d_tconv if fast_upconv_variant() == "tconv"
                     else upsample_conv3d)
            y = fused(x.astype(dtype), kernel.astype(dtype))
        elif self.fuse_avgpool or self.fuse_avgpool_concat:
            assert k == (1, 1, 1) and _triple(self.stride) == (1, 1, 1) \
                and _triple(self.padding) == (0, 0, 0), \
                "fuse_avgpool requires k=1, stride 1, padding 0"
            fused = (avgpool_concat_conv3d if self.fuse_avgpool_concat
                     else avgpool_conv3d)
            y = fused(x.astype(dtype), kernel.astype(dtype))
        else:
            y = conv3d(x.astype(dtype), kernel.astype(dtype), self.stride,
                       self.padding, self.dilation)
        if self.use_bias:
            binit = self.bias_init or _uniform(1.0 / fan_in ** 0.5)
            bias = self.param("bias", binit, (self.features,), self.param_dtype)
            if self.fuse_avgpool_concat:
                # bias belongs to the conv half only; the avgpool half (the
                # first in_ch channels of the fused output) is bias-free.
                bias = jnp.concatenate(
                    [jnp.zeros((in_ch,), bias.dtype), bias])
            y = y + bias.astype(dtype)
        return y


class SNLinear(nn.Module, _SpectralState):
    """Spectrally-normalized dense layer (reference: utils.py snlinear)."""

    features: int
    use_bias: bool = True
    plain: bool = False
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        in_f = x.shape[-1]
        kinit = self.kernel_init or _uniform(1.0 / in_f ** 0.5)
        kernel = self.param("kernel", kinit, (in_f, self.features),
                            self.param_dtype)
        if not self.plain:
            w_mat = kernel.T  # torch view: [out, in]
            kernel = self._sn_weight(kernel, w_mat, update_stats)
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                    preferred_element_type=dtype)
        if self.use_bias:
            binit = self.bias_init or _uniform(1.0 / in_f ** 0.5)
            bias = self.param("bias", binit, (self.features,), self.param_dtype)
            y = y + bias.astype(dtype)
        return y
