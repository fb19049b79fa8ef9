"""StyleGAN-family checkpoint conversion: structural round-trips built by
inverse-mapping our own initialized variables into reference-keyed torch
state_dicts, then converting back and comparing trees + running forward."""

import numpy as np

import jax
import jax.numpy as jnp

from gan3d_tpu.config import Config
from gan3d_tpu.eval.convert import (
    convert_stylegan1_g,
    convert_stylegan2_g,
    convert_stylegan_d,
)


def _trees_equal(a, b):
    fa = sorted(jax.tree.leaves_with_path(a), key=lambda t: str(t[0]))
    fb = sorted(jax.tree.leaves_with_path(b), key=lambda t: str(t[0]))
    assert len(fa) == len(fb), (len(fa), len(fb))
    for (pa, va), (pb, vb) in zip(fa, fb):
        assert str(pa) == str(pb), (str(pa), str(pb))
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6,
                                   err_msg=str(pa))


def test_stylegan2_g_roundtrip():
    from gan3d_tpu.models.stylegan import Generator

    cfg = Config(stylegan2=True, resolution=16, z_size=32, filterG=256,
                 compute_dtype="float32")
    G = Generator(cfg)
    key = jax.random.key(0)
    gv = G.init({"params": key, "noise": key}, jnp.zeros((1, 32)))

    sd = {}
    for fc, p in gv["params"]["mapping"].items():
        sd[f"mapping.{fc}.weight"] = np.asarray(p["weight"]).T
        sd[f"mapping.{fc}.bias"] = np.asarray(p["bias"])
    sd["mapping.w_avg"] = np.asarray(gv["moving"]["mapping"]["w_avg"])
    for bname, blk in gv["params"]["synthesis"].items():
        for lname, layer in blk.items():
            if lname == "const":
                sd[f"synthesis.{bname}.const"] = \
                    np.asarray(layer).transpose(3, 0, 1, 2)
                continue
            sd[f"synthesis.{bname}.{lname}.weight"] = \
                np.asarray(layer["weight"]).transpose(4, 3, 0, 1, 2)
            sd[f"synthesis.{bname}.{lname}.bias"] = np.asarray(layer["bias"])
            if "noise_strength" in layer:
                sd[f"synthesis.{bname}.{lname}.noise_strength"] = \
                    np.asarray(layer["noise_strength"])
            sd[f"synthesis.{bname}.{lname}.affine.weight"] = \
                np.asarray(layer["affine"]["weight"]).T
            sd[f"synthesis.{bname}.{lname}.affine.bias"] = \
                np.asarray(layer["affine"]["bias"])

    converted = convert_stylegan2_g(sd, cfg)
    _trees_equal(gv, converted)
    out, _ = G.apply(converted, jnp.zeros((1, 32)),
                     rngs={"noise": key})
    assert out[0].shape == (1, 16, 16, 16, 1) if isinstance(out, tuple) \
        else out.shape == (1, 16, 16, 16, 1)


def test_stylegan_d_roundtrip():
    from gan3d_tpu.models.stylegan import Discriminator

    cfg = Config(stylegan2=True, resolution=16, z_size=32, filterD=512,
                 compute_dtype="float32")
    D = Discriminator(cfg)
    key = jax.random.key(0)
    dv = D.init({"params": key}, jnp.zeros((4, 16, 16, 16, 1)))

    sd = {}
    for bname, blk in dv["params"].items():
        for lname, layer in blk.items():
            if "weight" in layer and np.asarray(layer["weight"]).ndim == 5:
                sd[f"{bname}.{lname}.weight"] = \
                    np.asarray(layer["weight"]).transpose(4, 3, 0, 1, 2)
            else:  # fc/out (FullyConnectedLayer)
                w = np.asarray(layer["weight"]).T  # [O, in] (ours NDHWC order)
                if lname == "fc":
                    o, flat = w.shape
                    c = flat // 64
                    # ours rows are (d,h,w,c); emit torch (c,d,h,w) order
                    w = w.reshape(o, 4, 4, 4, c).transpose(0, 4, 1, 2, 3)
                    w = w.reshape(o, flat)
                sd[f"{bname}.{lname}.weight"] = w
            if "bias" in layer:
                sd[f"{bname}.{lname}.bias"] = np.asarray(layer["bias"])

    converted = convert_stylegan_d(sd, cfg)
    _trees_equal(dv, converted)
    out = D.apply(converted, jnp.zeros((4, 16, 16, 16, 1)))
    assert out.shape == (4, 1)


def test_stylegan1_g_roundtrip():
    from gan3d_tpu.models.stylegan import StyleGAN1Generator

    cfg = Config(stylegan=True, resolution=16, z_size=512,
                 compute_dtype="float32")
    G = StyleGAN1Generator(cfg)
    key = jax.random.key(0)
    gv = G.init({"params": key, "mixing": key}, jnp.zeros((2, 512)))

    sd = {}
    for name, p in gv["params"].items():
        if name.startswith("map"):
            i = int(name[3:]) * 2
            sd[f"latentMapping.{i}.weight"] = np.asarray(p["kernel"]).T
            sd[f"latentMapping.{i}.bias"] = np.asarray(p["bias"])
        elif name.startswith("A"):
            sd[f"{name}.weight"] = np.asarray(p["kernel"]).T
            sd[f"{name}.bias"] = np.asarray(p["bias"])
        elif name == "C_out":
            sd["C_out.0.weight"] = \
                np.asarray(p["kernel"]).transpose(4, 3, 0, 1, 2)
        else:  # C{i}
            sd[f"{name}.0.weight"] = \
                np.asarray(p["kernel"]).transpose(4, 3, 0, 1, 2)

    converted = convert_stylegan1_g(sd, cfg)
    _trees_equal(gv, converted)
    out = G.apply(converted, jnp.zeros((2, 512)), rngs={"mixing": key})
    assert out.shape == (2, 16, 16, 16, 1)


def test_epilogue_fc_permutation_vs_torch_order():
    """The epilogue fc conversion must map torch's NCDHW flatten to our
    NDHWC flatten: verify numerically against a torch-order matmul."""
    rng = np.random.default_rng(3)
    N, C = 2, 6
    x = rng.normal(size=(N, C, 4, 4, 4)).astype(np.float32)  # NCDHW
    w_torch = rng.normal(size=(5, C * 64)).astype(np.float32)  # [O, c-major]
    ref = x.reshape(N, -1) @ w_torch.T

    sd = {"b4.fc.weight": w_torch, "b4.fc.bias": np.zeros(5, np.float32)}
    cfg = Config(stylegan2=True, resolution=16, filterD=512)
    conv = convert_stylegan_d(sd, cfg)
    w_ours = np.asarray(conv["params"]["b4"]["fc"]["weight"])  # [in, O]
    x_ndhwc = np.moveaxis(x, 1, -1)  # (N,4,4,4,C)
    got = x_ndhwc.reshape(N, -1) @ w_ours
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
