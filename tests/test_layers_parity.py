"""Layer parity vs torch: spectral norm, BatchNorm3d, LayerNorm, attention,
BigGAN-deep blocks. Torch weights/state are converted into the flax
variable trees; both sides run in fp32 train mode on identical inputs."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
from torch.nn.utils.parametrizations import spectral_norm as TorchSN

import jax
import jax.numpy as jnp

from gan3d_tpu.nn import (
    BatchNorm3d,
    DBlockDeep,
    GBlockDeep,
    LayerNormVolume,
    RandomCrop3D,
    SelfAttention3d,
    SNConv3d,
    SNLinear,
)

RNG = np.random.default_rng(7)


def rand(*shape, std=1.0):
    return (RNG.normal(size=shape) * std).astype(np.float32)


def ndhwc(x):
    return np.moveaxis(x, 1, -1)


def ncdhw(x):
    return np.moveaxis(x, -1, 1)


def torch_sn_state(mod):
    # .copy() matters: torch updates _u/_v in-place during forward, and JAX's
    # CPU backend may zero-copy numpy arrays — without the copy the injected
    # flax state would silently track torch's.
    p = mod.parametrizations.weight[0]
    return p._u.detach().numpy().copy(), p._v.detach().numpy().copy()


class TestSpectralNorm:
    def _make_pair(self, k=3, pad=1, cin=4, cout=6):
        tconv = TorchSN(tnn.Conv3d(cin, cout, k, padding=pad, bias=True))
        x = rand(2, cin, 6, 6, 6)
        mod = SNConv3d(cout, kernel_size=k, padding=pad)
        variables = mod.init(jax.random.key(0), jnp.asarray(ndhwc(x)))
        # inject torch weights + SN state
        w = tconv.parametrizations.weight.original.detach().numpy()
        b = tconv.bias.detach().numpy()
        u, v = torch_sn_state(tconv)
        variables = {
            "params": {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
                       "bias": jnp.asarray(b)},
            "spectral": {"u": jnp.asarray(u), "v": jnp.asarray(v)},
        }
        return tconv, mod, variables, x

    def test_conv_forward_and_state_updates(self):
        tconv, mod, variables, x = self._make_pair()
        tconv.train()
        for step in range(3):
            ref = tconv(torch.from_numpy(x)).detach().numpy()
            out, upd = mod.apply(variables, jnp.asarray(ndhwc(x)),
                                 update_stats=True, mutable=["spectral"])
            variables = {**variables, "spectral": upd["spectral"]}
            np.testing.assert_allclose(ncdhw(np.asarray(out)), ref,
                                       atol=5e-5, rtol=1e-4,
                                       err_msg=f"step {step}")
            u_t, v_t = torch_sn_state(tconv)
            np.testing.assert_allclose(np.asarray(variables["spectral"]["u"]),
                                       u_t, atol=1e-5)
            np.testing.assert_allclose(np.asarray(variables["spectral"]["v"]),
                                       v_t, atol=1e-5)

    def test_eval_mode_no_update(self):
        tconv, mod, variables, x = self._make_pair()
        tconv.eval()
        with torch.no_grad():
            ref = tconv(torch.from_numpy(x)).numpy()
        out = mod.apply(variables, jnp.asarray(ndhwc(x)), update_stats=False)
        np.testing.assert_allclose(ncdhw(np.asarray(out)), ref, atol=5e-5,
                                   rtol=1e-4)

    def test_linear(self):
        tlin = TorchSN(tnn.Linear(8, 5))
        x = rand(3, 8)
        mod = SNLinear(5)
        w = tlin.parametrizations.weight.original.detach().numpy()
        u, v = torch_sn_state(tlin)
        variables = {
            "params": {"kernel": jnp.asarray(w.T),
                       "bias": jnp.asarray(tlin.bias.detach().numpy())},
            "spectral": {"u": jnp.asarray(u), "v": jnp.asarray(v)},
        }
        tlin.train()
        ref = tlin(torch.from_numpy(x)).detach().numpy()
        out, _ = mod.apply(variables, jnp.asarray(x), update_stats=True,
                           mutable=["spectral"])
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-4)

    def test_plain_flag_disables_sn(self):
        # reference utils.py:9-11 inverted sngan flag -> plain conv
        mod = SNConv3d(4, kernel_size=1, padding=0, plain=True)
        x = jnp.asarray(rand(1, 3, 3, 3, 2))
        variables = mod.init(jax.random.key(0), x)
        assert "spectral" not in variables


class TestBatchNorm:
    def test_train_forward_and_running_stats(self):
        tbn = tnn.BatchNorm3d(5)
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(rand(5, std=0.2) + 1))
            tbn.bias.copy_(torch.from_numpy(rand(5, std=0.1)))
        mod = BatchNorm3d(5)
        variables = {
            "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                       "bias": jnp.asarray(tbn.bias.detach().numpy())},
            "batch_stats": {"mean": jnp.zeros(5), "var": jnp.ones(5)},
        }
        tbn.train()
        for _ in range(2):
            x = rand(4, 5, 4, 4, 4)
            ref = tbn(torch.from_numpy(x)).detach().numpy()
            out, upd = mod.apply(variables, jnp.asarray(ndhwc(x)),
                                 mutable=["batch_stats"])
            variables = {**variables, "batch_stats": upd["batch_stats"]}
            np.testing.assert_allclose(ncdhw(np.asarray(out)), ref, atol=1e-5,
                                       rtol=1e-4)
        np.testing.assert_allclose(np.asarray(variables["batch_stats"]["mean"]),
                                   tbn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(variables["batch_stats"]["var"]),
                                   tbn.running_var.numpy(), atol=1e-5, rtol=1e-5)
        # eval mode uses running stats
        tbn.eval()
        x = rand(2, 5, 4, 4, 4)
        ref = tbn(torch.from_numpy(x)).detach().numpy()
        out = mod.apply(variables, jnp.asarray(ndhwc(x)),
                        use_running_average=True)
        np.testing.assert_allclose(ncdhw(np.asarray(out)), ref, atol=1e-5,
                                   rtol=1e-4)


class TestLayerNorm:
    def test_volume_layernorm(self):
        # reference dcgan.py:162: nn.LayerNorm([C, D, H, W])
        C, D, H, W = 3, 4, 4, 4
        tln = tnn.LayerNorm([C, D, H, W])
        with torch.no_grad():
            tln.weight.copy_(torch.from_numpy(rand(C, D, H, W, std=0.3) + 1))
            tln.bias.copy_(torch.from_numpy(rand(C, D, H, W, std=0.1)))
        x = rand(2, C, D, H, W)
        ref = tln(torch.from_numpy(x)).detach().numpy()
        mod = LayerNormVolume((D, H, W, C))
        variables = {"params": {
            "scale": jnp.asarray(tln.weight.detach().numpy().transpose(1, 2, 3, 0)),
            "bias": jnp.asarray(tln.bias.detach().numpy().transpose(1, 2, 3, 0)),
        }}
        out = mod.apply(variables, jnp.asarray(ndhwc(x)))
        np.testing.assert_allclose(ncdhw(np.asarray(out)), ref, atol=1e-5,
                                   rtol=1e-4)


def _torch_attention(x, wf, wg, wh, wv, gamma):
    """Reference Attention forward (utils.py:34-45) with *given* (already
    normalized) weights, as a pure-torch oracle."""
    N, C, D, H, W = x.shape
    c_ = wf.shape[0]
    f = F.conv3d(x, wf)
    g = F.max_pool3d(F.conv3d(x, wg), [2, 2, 2], stride=2)
    f = f.reshape(N, c_, D * H * W)
    g = g.reshape(N, c_, D * H * W // 8)
    beta = torch.softmax(torch.bmm(f.permute(0, 2, 1), g), -1)
    h = F.max_pool3d(F.conv3d(x, wh), [2, 2, 2], stride=2)
    h = h.reshape(N, c_, D * H * W // 8)
    o = torch.bmm(h, beta.permute(0, 2, 1)).reshape(N, c_, D, H, W)
    return gamma * F.conv3d(o, wv) + x


class TestAttention:
    def test_vs_torch_oracle(self):
        C = 16
        x = rand(2, C, 4, 4, 4)
        mod = SelfAttention3d(C)
        variables = mod.init(jax.random.key(1), jnp.asarray(ndhwc(x)))
        # Export our *normalized* weights to build the torch oracle: run with
        # update_stats=False so both sides see identical effective weights.
        from gan3d_tpu.nn.layers import spectral_sigma

        def eff(name, cout):
            k = variables["params"][name]["kernel"]  # [1,1,1,in,out]
            u = variables["spectral"][name]["u"]
            v = variables["spectral"][name]["v"]
            w_mat = jnp.transpose(k, (4, 3, 0, 1, 2)).reshape(cout, -1)
            sig = spectral_sigma(w_mat, u, v)
            w = np.asarray(k / sig)  # [1,1,1,in,out]
            return torch.from_numpy(w.transpose(4, 3, 0, 1, 2).copy())

        gamma = float(variables["params"]["gamma"])
        ref = _torch_attention(torch.from_numpy(x), eff("f", C // 8),
                               eff("g", C // 8), eff("h", C // 8),
                               eff("v", C), gamma).numpy()
        out = mod.apply(variables, jnp.asarray(ndhwc(x)), update_stats=False)
        np.testing.assert_allclose(ncdhw(np.asarray(out)), ref, atol=2e-5,
                                   rtol=1e-4)


class TestBlocksShapes:
    """Shape/structure goldens for the deep blocks (value parity is covered
    transitively by the SN/BN/conv layer tests above)."""

    def test_gblockdeep_upsample_channel_drop(self):
        mod = GBlockDeep(in_channels=8, out_channels=4, upsample=True)
        x = jnp.asarray(rand(2, 4, 4, 4, 8))
        variables = mod.init(jax.random.key(0), x)
        y, _ = mod.apply(variables, x, train=True,
                         mutable=["batch_stats", "spectral"])
        assert y.shape == (2, 8, 8, 8, 4)

    def test_gblockdeep_identity_when_same_channels(self):
        mod = GBlockDeep(in_channels=8, out_channels=8, upsample=False)
        x = jnp.asarray(rand(2, 4, 4, 4, 8))
        variables = mod.init(jax.random.key(0), x)
        y, _ = mod.apply(variables, x, mutable=["batch_stats", "spectral"])
        assert y.shape == x.shape

    def test_dblockdeep_downsample_concat_shortcut(self):
        mod = DBlockDeep(in_channels=4, out_channels=8, downsample=True)
        x = jnp.asarray(rand(2, 8, 8, 8, 4))
        variables = mod.init(jax.random.key(0), x)
        # conv_sc produces out-in extra channels (reference utils.py:108-117)
        assert variables["params"]["conv_sc"]["kernel"].shape[-1] == 4
        y, _ = mod.apply(variables, x, mutable=["spectral"])
        assert y.shape == (2, 4, 4, 4, 8)

    def test_gblockdeep_plain_has_no_spectral_state(self):
        mod = GBlockDeep(in_channels=8, out_channels=8, plain=True)
        x = jnp.asarray(rand(1, 4, 4, 4, 8))
        variables = mod.init(jax.random.key(0), x)
        assert "spectral" not in variables

    def test_dblockdeep_always_spectral(self):
        # reference utils.py:101-106: deep D blocks ignore the sngan flag
        mod = DBlockDeep(in_channels=8, out_channels=8)
        x = jnp.asarray(rand(1, 4, 4, 4, 8))
        variables = mod.init(jax.random.key(0), x)
        assert "spectral" in variables


class TestRandomCrop:
    def test_shapes_and_content(self):
        mod = RandomCrop3D(n_crops=16)
        x = jnp.asarray(rand(2, 8, 8, 8, 1))
        y = mod.apply({}, x, rngs={"crops": jax.random.key(3)})
        assert y.shape == (2, 4, 4, 4, 16)
        # every crop is a contiguous subvolume: its values must be a subset
        xv = np.asarray(x[0, ..., 0])
        crop = np.asarray(y[0, ..., 0])
        assert np.isin(crop.ravel(), xv.ravel()).all()
        # different rng -> different crops
        y2 = mod.apply({}, x, rngs={"crops": jax.random.key(4)})
        assert not np.allclose(np.asarray(y), np.asarray(y2))
