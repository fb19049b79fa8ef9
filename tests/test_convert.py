"""Reference-checkpoint conversion tests.

DCGAN G/D get a full numerical oracle: a torch model with the reference's
layer ordering is built generically in-test, its real state_dict (including
spectral-norm parametrization keys) is converted, and outputs are compared.
BigGAN conversion is validated structurally against a synthesized state_dict
with the reference's key layout (block-level numerics are covered by the
layer parity tests)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
from torch.nn.utils.parametrizations import spectral_norm as TorchSN

import jax.numpy as jnp

from gan3d_tpu.config import Config
from gan3d_tpu.eval.convert import (
    convert_biggan_g,
    convert_dcgan_d,
    convert_dcgan_g,
)
from gan3d_tpu.models import build_models

RNG = np.random.default_rng(17)


def build_torch_dcgan_g(cfg):
    """Reference DCGAN G layer order (dcgan.py:45-70) for resolution 16."""
    chans = cfg.dcgan_g_channels()
    layers = [tnn.ConvTranspose3d(cfg.z_size, chans[0], 4, stride=1),
              tnn.BatchNorm3d(chans[0]), tnn.ReLU(True)]
    for cin, cout in zip(chans, chans[1:]):
        layers += [tnn.ConvTranspose3d(cin, cout, 4, stride=2, padding=1),
                   tnn.BatchNorm3d(cout), tnn.ReLU(True)]
    layers += [tnn.ConvTranspose3d(chans[-1], 1, 4, stride=2, padding=1),
               tnn.Tanh()]
    return tnn.Sequential(*layers)


def build_torch_dcgan_d_sngan(cfg):
    """Reference sngan D layer order (dcgan.py:117-136)."""
    chans = cfg.dcgan_d_channels()
    layers = []
    prev = 1
    for ch in chans:
        layers += [TorchSN(tnn.Conv3d(prev, ch, 4, stride=2, padding=1,
                                      bias=False)),
                   tnn.LeakyReLU(0.1, inplace=True)]
        prev = ch
    layers += [TorchSN(tnn.Conv3d(prev, 1, (4, 4, 4), stride=1, padding=0,
                                  bias=False))]
    return tnn.Sequential(*layers)


class TestDcganConversion:
    def cfg(self, **kw):
        base = dict(dcgan=True, resolution=16, z_size=8, filterG=4,
                    filterD=4, compute_dtype="float32")
        base.update(kw)
        return Config(**base)

    def test_generator_numeric_oracle(self):
        cfg = self.cfg()
        tg = build_torch_dcgan_g(cfg)
        tg.eval()  # BN running stats (fresh init: mean 0 var 1)
        sd = {f"main.{k}": v for k, v in tg.state_dict().items()}
        g_vars = convert_dcgan_g(sd, cfg)

        G, _ = build_models(cfg)
        z = RNG.normal(size=(2, cfg.z_size)).astype(np.float32)
        with torch.no_grad():
            ref = tg(torch.from_numpy(z).reshape(2, cfg.z_size, 1, 1, 1))
        # eval-mode forward: use running averages like torch eval()
        out = G.apply(g_vars, jnp.asarray(z), train=False)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(out), -1, 1), ref.numpy(), atol=1e-4,
            rtol=1e-3)

    def test_discriminator_sngan_numeric_oracle(self):
        cfg = self.cfg(sngan=True)
        td = build_torch_dcgan_d_sngan(cfg)
        td.eval()
        sd = {f"main.{k}": v for k, v in td.state_dict().items()}
        d_vars = convert_dcgan_d(sd, cfg)

        _, D = build_models(cfg)
        x = RNG.normal(size=(2, 1, 16, 16, 16)).astype(np.float32)
        with torch.no_grad():
            ref = td(torch.from_numpy(x)).reshape(2, -1)
        out = D.apply(d_vars, jnp.asarray(np.moveaxis(x, 1, -1)),
                      update_stats=False)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4,
                                   rtol=1e-3)


class TestBigganConversion:
    def test_structural_roundtrip(self):
        """Synthesize a reference-keyed state_dict from our own init and
        check the converted tree matches our model's variable structure."""
        cfg = Config(resolution=16, z_size=8, filterG=4, filterD=4,
                     sagan=True, compute_dtype="float32")
        G, _ = build_models(cfg)
        import jax

        gv = G.init({"params": jax.random.key(0)}, jnp.zeros((1, 8)))

        # build torch-style keys from our variables (inverse mapping)
        sd = {}

        def conv_to_torch(p, sp):
            w = np.asarray(p["kernel"]).transpose(4, 3, 0, 1, 2)
            out = {}
            if sp is not None:
                out["parametrizations.weight.original"] = w
                out["parametrizations.weight.0._u"] = np.asarray(sp["u"])
                out["parametrizations.weight.0._v"] = np.asarray(sp["v"])
            else:
                out["weight"] = w
            if "bias" in p:
                out["bias"] = np.asarray(p["bias"])
            return out

        params, stats = gv["params"], gv["batch_stats"]
        spectral = gv["spectral"]
        # linear
        sd["linear.parametrizations.weight.original"] = \
            np.asarray(params["linear"]["kernel"]).T
        sd["linear.parametrizations.weight.0._u"] = \
            np.asarray(spectral["linear"]["u"])
        sd["linear.parametrizations.weight.0._v"] = \
            np.asarray(spectral["linear"]["v"])
        sd["linear.bias"] = np.asarray(params["linear"]["bias"])

        arch = cfg.biggan_g_arch()
        for idx in range(len(arch["out_channels"])):
            ours = params[f"g{idx}_0"]
            sp = spectral[f"g{idx}_0"]
            st = stats[f"g{idx}_0"]
            for c in ("conv1", "conv2", "conv3", "conv4"):
                for k, v in conv_to_torch(ours[c], sp.get(c)).items():
                    sd[f"blocks.{idx}.0.{c}.{k}"] = v
            for b in ("bn1", "bn2", "bn3", "bn4"):
                sd[f"blocks.{idx}.0.{b}.weight"] = np.asarray(ours[b]["scale"])
                sd[f"blocks.{idx}.0.{b}.bias"] = np.asarray(ours[b]["bias"])
                sd[f"blocks.{idx}.0.{b}.running_mean"] = \
                    np.asarray(st[b]["mean"])
                sd[f"blocks.{idx}.0.{b}.running_var"] = np.asarray(st[b]["var"])
            if arch["attention"][arch["resolution"][idx]]:
                a = params[f"attn{idx}"]
                asp = spectral[f"attn{idx}"]
                for nmod in ("f", "g", "h", "v"):
                    for k, v in conv_to_torch(a[nmod], asp.get(nmod)).items():
                        sd[f"blocks.{idx}.1.{nmod}.{k}"] = v
                sd[f"blocks.{idx}.1.gamma"] = np.asarray(a["gamma"])
        sd["output_layer.0.weight"] = np.asarray(params["out_bn"]["scale"])
        sd["output_layer.0.bias"] = np.asarray(params["out_bn"]["bias"])
        sd["output_layer.0.running_mean"] = \
            np.asarray(stats["out_bn"]["mean"])
        sd["output_layer.0.running_var"] = np.asarray(stats["out_bn"]["var"])
        for k, v in conv_to_torch(params["out_conv"],
                                  spectral.get("out_conv")).items():
            sd[f"output_layer.2.{k}"] = v

        converted = convert_biggan_g(sd, cfg)
        # identical tree structure and values
        import jax

        ref_flat = jax.tree.leaves_with_path(gv)
        got_flat = jax.tree.leaves_with_path(converted)
        assert len(ref_flat) == len(got_flat)
        for (pa, va), (pb, vb) in zip(sorted(ref_flat, key=lambda t: str(t[0])),
                                      sorted(got_flat, key=lambda t: str(t[0]))):
            assert str(pa) == str(pb)
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                       atol=1e-6, err_msg=str(pa))
        # converted weights run
        out, _ = G.apply(converted, jnp.zeros((1, 8)),
                         mutable=["batch_stats", "spectral"])
        assert out.shape == (1, 16, 16, 16, 1)
