"""Model zoo shape/structure tests (CPU, small configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan3d_tpu.config import Config
from gan3d_tpu.models import build_models


def small_cfg(**kw):
    base = dict(resolution=16, z_size=32, filterG=8, filterD=8, batch_size=2,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


def init_and_forward(cfg, batch=2, rngs_extra=None):
    G, D = build_models(cfg)
    key = jax.random.key(0)
    z = jax.random.normal(key, (batch, cfg.z_size))
    rngs = {"params": key}
    if rngs_extra:
        rngs.update(rngs_extra)
    gv = G.init(rngs, z)
    fake, gnew = G.apply(gv, z, train=True,
                         mutable=["batch_stats", "spectral"],
                         rngs=rngs_extra)
    dv = D.init(rngs, fake)
    mutables = [c for c in ("batch_stats", "spectral") if c in dv]
    out, dnew = D.apply(dv, fake, mutable=mutables, rngs=rngs_extra)
    return fake, out, gv, dv


@pytest.mark.parametrize("flags", [
    dict(dcgan=True),
    dict(dcgan=True, sngan=True),
    dict(dcgan=True, sagan=True),
    dict(),                      # biggan default (SNGAN-style single blocks)
    dict(sngan=True),
    dict(sagan=True),
    dict(biggan=True),
    dict(hybrid=True),
])
def test_families_forward_shapes(flags):
    rngs_extra = {"crops": jax.random.key(9)} if flags.get("msl") else None
    cfg = small_cfg(**flags)
    fake, out, _, _ = init_and_forward(cfg, rngs_extra=rngs_extra)
    r = cfg.resolution
    assert fake.shape == (2, r, r, r, 1)
    assert out.shape == (2, 1)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(fake)).max() <= 1.0  # tanh output


def test_msl_discriminator():
    cfg = small_cfg(dcgan=True, msl=True, resolution=32)
    G, D = build_models(cfg)
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 32, 32, 32, 1))
    rngs = {"params": key, "crops": jax.random.key(1)}
    dv = D.init(rngs, x)
    out = D.apply(dv, x, rngs={"crops": jax.random.key(2)},
                  mutable=["spectral"])[0]
    assert out.shape == (2, 1)


def test_sngan_flag_strips_g_spectral_norm():
    # reference quirk: sngan=True -> plain G convs, D deep blocks keep SN
    cfg = small_cfg(sngan=True)
    G, D = build_models(cfg)
    key = jax.random.key(0)
    z = jax.random.normal(key, (2, cfg.z_size))
    gv = G.init({"params": key}, z)
    assert "spectral" not in gv
    x = jax.random.normal(key, (2, 16, 16, 16, 1))
    dv = D.init({"params": key}, x)
    assert "spectral" in dv  # DBlockDeep always SN
    # but the input conv + final linear are plain:
    assert "input_conv" not in dv["spectral"]
    assert "linear" not in dv["spectral"]


def test_biggan_doubles_blocks():
    cfg = small_cfg(biggan=True)
    G, _ = build_models(cfg)
    gv = G.init({"params": jax.random.key(0)},
                jnp.zeros((1, cfg.z_size)))
    names = set(gv["params"].keys())
    assert "g0_0" in names and "g0_1" in names
    cfg2 = small_cfg()
    G2, _ = build_models(cfg2)
    gv2 = G2.init({"params": jax.random.key(0)}, jnp.zeros((1, cfg2.z_size)))
    names2 = set(gv2["params"].keys())
    assert "g0_0" in names2 and "g0_1" not in names2


def test_attention_placement_at_128_topology():
    # At full resolution the attention sits at 32^3 (G) / 16^3 (D); use a
    # 64^3 config where those resolutions exist mid-network.
    cfg = Config(resolution=64, z_size=16, filterG=4, filterD=4, sagan=True,
                 compute_dtype="float32")
    G, D = build_models(cfg)
    gv = G.init({"params": jax.random.key(0)}, jnp.zeros((1, 16)))
    assert any(n.startswith("attn") for n in gv["params"])
    dv = D.init({"params": jax.random.key(0)},
                jnp.zeros((1, 64, 64, 64, 1)))
    assert any(n.startswith("attn") for n in dv["params"])


def test_generator_bf16_compute():
    cfg = small_cfg(compute_dtype="bfloat16")
    G, D = build_models(cfg)
    key = jax.random.key(0)
    z = jax.random.normal(key, (2, cfg.z_size), jnp.float32)
    gv = G.init({"params": key}, z)
    # params stay fp32
    assert gv["params"]["g0_0"]["conv1"]["kernel"].dtype == jnp.float32
    fake, _ = G.apply(gv, z, mutable=["batch_stats", "spectral"])
    assert fake.dtype == jnp.bfloat16
