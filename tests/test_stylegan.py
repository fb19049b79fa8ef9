"""StyleGAN stack tests: resampling parity, modulated conv oracle, model
shapes, and end-to-end training for both stylegan2 and stylegan-1."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gan3d_tpu.config import Config
from gan3d_tpu.models.stylegan.layers import (
    FullyConnectedLayer,
    modulated_conv3d,
)
from gan3d_tpu.models.stylegan.resample import (
    conv3d_resample,
    setup_filter,
    upfirdn3d,
)

RNG = np.random.default_rng(21)


def rand(*s):
    return RNG.normal(size=s).astype(np.float32)


def upfirdn3d_oracle(x, f, up=1, down=1, padding=(0,) * 6, flip_filter=False,
                     gain=1.0):
    """Independent oracle: zero-stuff with numpy, pad/crop, depthwise torch
    conv with the (flipped) full filter, stride-slice. x: [N, D, H, W, C]."""
    n, d, h, w, c = x.shape
    px0, px1, py0, py1, pz0, pz1 = padding
    up_x = np.zeros((n, d * up, h * up, w * up, c), np.float32)
    up_x[:, ::up, ::up, ::up, :] = x
    pz = [max(pz0, 0), max(pz1, 0)]
    py = [max(py0, 0), max(py1, 0)]
    px = [max(px0, 0), max(px1, 0)]
    up_x = np.pad(up_x, [(0, 0), pz, py, px, (0, 0)])
    up_x = up_x[:, max(-pz0, 0): up_x.shape[1] - max(-pz1, 0),
                max(-py0, 0): up_x.shape[2] - max(-py1, 0),
                max(-px0, 0): up_x.shape[3] - max(-px1, 0), :]
    fk = np.asarray(f, np.float32) * gain
    if not flip_filter:
        fk = fk[::-1, ::-1, ::-1]
    t = torch.from_numpy(np.moveaxis(up_x, -1, 1).copy())
    kern = torch.from_numpy(np.tile(fk[None, None], (c, 1, 1, 1, 1)).copy())
    out = F.conv3d(t, kern, groups=c).numpy()
    out = np.moveaxis(out, 1, -1)
    return out[:, ::down, ::down, ::down, :]


class TestUpfirdn:
    @pytest.mark.parametrize("up,down,pad", [
        (1, 1, (1, 1, 1, 1, 1, 1)),
        (2, 1, (2, 1, 2, 1, 2, 1)),
        (1, 2, (1, 1, 1, 1, 1, 1)),
        (2, 2, (2, 2, 2, 2, 2, 2)),
        (1, 1, (-1, 2, 0, 1, 2, -1)),   # crop + pad mix
    ])
    def test_vs_oracle(self, up, down, pad):
        x = rand(2, 5, 5, 5, 3)
        f = np.asarray(setup_filter())
        ours = upfirdn3d(jnp.asarray(x), jnp.asarray(f), up=up, down=down,
                         padding=list(pad), gain=float(up) ** 2)
        ref = upfirdn3d_oracle(x, f, up=up, down=down, padding=pad,
                               gain=float(up) ** 2)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5,
                                   rtol=1e-4)

    def test_identity_filter(self):
        x = rand(1, 4, 4, 4, 2)
        out = upfirdn3d(jnp.asarray(x), None)
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)


class TestConvResample:
    """Each fast path must equal the naive composition: upfirdn-upsample ->
    plain conv -> upfirdn-downsample with the resolved paddings."""

    def _naive(self, x, w, f, up, down, padding):
        from gan3d_tpu.models.stylegan.resample import _parse_padding

        kd, kh, kw = w.shape[:3]
        fd = fh = fw = f.shape[0] if f is not None else 1
        px0, px1, py0, py1, pz0, pz1 = _parse_padding(padding)
        if up > 1:
            px0 += (fw + up - 1) // 2
            px1 += (fw - up) // 2
            py0 += (fh + up - 1) // 2
            py1 += (fh - up) // 2
            pz0 += (fd + up - 1) // 2
            pz1 += (fd - up) // 2
        if down > 1:
            px0 += (fw - down + 1) // 2
            px1 += (fw - down) // 2
            py0 += (fh - down + 1) // 2
            py1 += (fh - down) // 2
            pz0 += (fd - down + 1) // 2
            pz1 += (fd - down) // 2
        y = upfirdn3d_oracle(x, np.asarray(f) if up > 1 else np.ones((1, 1, 1)),
                             up=up, padding=(px0, px1, py0, py1, pz0, pz1),
                             gain=up ** 2)
        t = torch.from_numpy(np.moveaxis(y, -1, 1).copy())
        wt = torch.from_numpy(np.asarray(w).transpose(4, 3, 0, 1, 2).copy())
        y = F.conv3d(t, wt).numpy()
        y = np.moveaxis(y, 1, -1)
        if down > 1:
            y = upfirdn3d_oracle(y, np.asarray(f), down=down)
        return y

    @pytest.mark.parametrize("k,up,down,pad", [
        (3, 1, 1, 1),   # plain path
        (3, 1, 2, 1),   # strided-down path
        (1, 1, 2, 0),   # 1x1 down fast path
        (1, 2, 1, 0),   # 1x1 up fast path
        (3, 2, 1, 1),   # transposed-up path
    ])
    def test_paths_vs_naive(self, k, up, down, pad):
        x = rand(2, 6, 6, 6, 3)
        w = rand(k, k, k, 3, 4)
        f = np.asarray(setup_filter())
        ours = conv3d_resample(jnp.asarray(x), jnp.asarray(w), jnp.asarray(f),
                               up=up, down=down, padding=pad,
                               flip_weight=(up == 1))
        ref = self._naive(x, w if up == 1 else w[::-1, ::-1, ::-1], f, up,
                          down, pad)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4,
                                   rtol=1e-3)


class TestFullyConnected:
    def test_lr_multiplier_semantics(self):
        # effective weight = stored * lr_mult / sqrt(in); bias * lr_mult
        mod = FullyConnectedLayer(4, lr_multiplier=0.01, bias_init=1.0)
        x = rand(3, 8)
        variables = mod.init(jax.random.key(0), jnp.asarray(x))
        w = np.asarray(variables["params"]["weight"])
        b = np.asarray(variables["params"]["bias"])
        ref = x @ (w * 0.01 / np.sqrt(8)) + b * 0.01
        out = mod.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)
        # stored weight has std 1/lr_mult; bias starts at bias_init
        assert np.isclose(w.std(), 100, rtol=0.2)
        np.testing.assert_allclose(b, 1.0)


class TestModulatedConv:
    def test_vs_per_sample_weight_oracle(self):
        """Non-fused modulated conv == per-sample modulated+demodulated
        weights applied sample-by-sample (the fused formulation)."""
        n, cin, cout, k = 2, 3, 5, 3
        x = rand(n, 4, 4, 4, cin)
        w = rand(k, k, k, cin, cout)
        styles = rand(n, cin) * 0.5 + 1.0
        out = modulated_conv3d(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(styles), padding=1)
        # oracle: w_i = w * style_i; demod over (k, cin); torch conv per i
        outs = []
        for i in range(n):
            wi = w * styles[i][None, None, None, :, None]
            d = 1.0 / np.sqrt((wi ** 2).sum(axis=(0, 1, 2, 3)) + 1e-8)
            wi = wi * d[None, None, None, None, :]
            t = torch.from_numpy(np.moveaxis(x[i:i + 1], -1, 1).copy())
            wt = torch.from_numpy(wi.transpose(4, 3, 0, 1, 2).copy())
            y = F.conv3d(t, wt, padding=1).numpy()
            outs.append(np.moveaxis(y, 1, -1)[0])
        np.testing.assert_allclose(np.asarray(out), np.stack(outs), atol=1e-4,
                                   rtol=1e-3)

    def test_fused_matches_nonfused(self):
        """fused=True (reference's eval path, stylegan.py:438-445) matches
        the non-fused training path — with and without demod/noise/up."""
        n, cin, cout, k = 2, 3, 5, 3
        x = jnp.asarray(rand(n, 4, 4, 4, cin))
        w = jnp.asarray(rand(k, k, k, cin, cout))
        styles = jnp.asarray(rand(n, cin) * 0.5 + 1.0)
        noise = jnp.asarray(rand(n, 4, 4, 4, 1) * 0.1)
        for demod in (True, False):
            a = modulated_conv3d(x, w, styles, noise=noise, padding=1,
                                 demodulate=demod)
            b = modulated_conv3d(x, w, styles, noise=noise, padding=1,
                                 demodulate=demod, fused=True)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
        from gan3d_tpu.models.stylegan.resample import setup_filter
        a = modulated_conv3d(x, w, styles, up=2, padding=1,
                             resample_filter=setup_filter((1, 3, 3, 1)),
                             flip_weight=False)
        b = modulated_conv3d(x, w, styles, up=2, padding=1,
                             resample_filter=setup_filter((1, 3, 3, 1)),
                             flip_weight=False, fused=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

    def test_generator_fused_eval_path(self):
        """G with train=False (reference: fused_modconv at eval,
        stylegan.py:601) matches train=True synthesis numerics."""
        from gan3d_tpu.models.stylegan import Generator

        cfg = Config(stylegan2=True, resolution=8, z_size=8, filterG=128)
        g = Generator(cfg)
        z = jnp.asarray(rand(2, 8))
        rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
        v = g.init(rngs, z)
        kw = dict(noise_mode="const", mutable=["noise_consts", "mapping"],
                  rngs={"noise": jax.random.key(2),
                        "params": jax.random.key(3)})
        (img_t, _), _ = g.apply(v, z, train=True, **kw)
        (img_e, _), _ = g.apply(v, z, train=False, **kw)
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_e),
                                   atol=1e-5, rtol=1e-4)

    def test_no_demodulate(self):
        n, cin, cout = 2, 4, 3
        x = rand(n, 4, 4, 4, cin)
        w = rand(1, 1, 1, cin, cout)
        styles = rand(n, cin)
        out = modulated_conv3d(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(styles), demodulate=False)
        ref = np.einsum("ndhwi,io,ni->ndhwo", x, w[0, 0, 0], styles)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)


class TestStyleGANModels:
    def cfg(self, **kw):
        base = dict(stylegan2=True, resolution=16, z_size=32, filterG=512,
                    filterD=512, batch_size=4, compute_dtype="float32")
        base.update(kw)
        return Config(**base)

    def test_generator_shapes_and_numws(self):
        from gan3d_tpu.models.stylegan import Generator

        cfg = self.cfg()
        G = Generator(cfg)
        key = jax.random.key(0)
        z = jax.random.normal(key, (2, cfg.z_size))
        variables = G.init({"params": key, "noise": key}, z)
        (img, ws) = G.apply(variables, z, rngs={"noise": key})
        assert img.shape == (2, 16, 16, 16, 1)
        # res 4,8,16 -> convs 1+2+2 = 5, final torgb 1 -> num_ws 6
        assert ws.shape == (2, 6, 512)
        assert np.abs(np.asarray(img)).max() <= 1.0

    def test_discriminator_shapes(self):
        from gan3d_tpu.models.stylegan import Discriminator

        cfg = self.cfg()
        D = Discriminator(cfg)
        key = jax.random.key(0)
        x = jax.random.normal(key, (4, 16, 16, 16, 1))
        variables = D.init({"params": key}, x)
        out = D.apply(variables, x)
        assert out.shape == (4, 1)
        # epilogue channels at 4^3: min(512//4, 512) = 128
        assert variables["params"]["b4"]["conv"]["weight"].shape[-1] == 128

    def test_stylegan1_shapes(self):
        from gan3d_tpu.models.stylegan import StyleGAN1Generator

        cfg = Config(stylegan=True, resolution=16, z_size=512,
                     compute_dtype="float32")
        G = StyleGAN1Generator(cfg)
        key = jax.random.key(0)
        z = jax.random.normal(key, (2, 512))
        variables = G.init({"params": key, "mixing": key}, z)
        img = G.apply(variables, z, rngs={"mixing": key})
        assert img.shape == (2, 16, 16, 16, 1)
        # res 16 -> 2 upsample stages -> affines A1..A5
        assert "A5" in variables["params"] and "A6" not in variables["params"]

    def test_c1act_bias_act_parity(self):
        """bias_act's squeezed-C=1 path is numerically identical (values
        and grads) to the default path."""
        from gan3d_tpu.models.stylegan.layers import bias_act, set_c1act_mode

        x = jnp.asarray(RNG.normal(size=(2, 4, 4, 4, 1)), jnp.float32)
        b = jnp.asarray(RNG.normal(size=(1,)), jnp.float32)

        def f(xx, bb):
            return jnp.sum(bias_act(xx, bb, act="lrelu") ** 2)

        set_c1act_mode("off")
        try:
            ref, (gx_ref, gb_ref) = (
                bias_act(x, b, act="lrelu"),
                jax.grad(f, argnums=(0, 1))(x, b))
            set_c1act_mode("on")
            got, (gx, gb) = (
                bias_act(x, b, act="lrelu"),
                jax.grad(f, argnums=(0, 1))(x, b))
        finally:
            set_c1act_mode("auto")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref))
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref))

    def test_stylegan1_fast_adain_parity(self):
        """The one-pass-moments AdaIN lowering matches the reference form
        (exact algebra; f32 rounding via E[x²]−μ² only) — at the op AND
        through a jitted G forward."""
        from gan3d_tpu.models.stylegan import StyleGAN1Generator
        from gan3d_tpu.models.stylegan.stylegan1 import (ada_in,
                                                         set_fast_adain_mode)

        x = jnp.asarray(RNG.normal(size=(2, 8, 8, 8, 16)), jnp.float32)
        style = jnp.asarray(RNG.normal(size=(2, 32)), jnp.float32)
        set_fast_adain_mode("off")
        try:
            ref = np.asarray(ada_in(x, style))
            set_fast_adain_mode("on")
            fused = np.asarray(ada_in(x, style))
        finally:
            set_fast_adain_mode("auto")
        np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=2e-4)

        cfg = Config(stylegan=True, resolution=16, z_size=64,
                     compute_dtype="float32")
        G = StyleGAN1Generator(cfg)
        key = jax.random.key(0)
        z = jax.random.normal(key, (2, 64))
        variables = G.init({"params": key, "mixing": key}, z)

        def fwd():
            return np.asarray(jax.jit(
                lambda v, zz: G.apply(v, zz, train=False))(variables, z))

        set_fast_adain_mode("off")
        try:
            img_ref = fwd()
            set_fast_adain_mode("on")
            img_fused = fwd()
        finally:
            set_fast_adain_mode("auto")
        np.testing.assert_allclose(img_fused, img_ref, rtol=5e-4, atol=5e-4)

    def test_mapping_w_avg_update(self):
        from gan3d_tpu.models.stylegan.mapping import MappingNetwork

        m = MappingNetwork(z_dim=8, w_dim=8, num_ws=3, num_layers=2)
        key = jax.random.key(0)
        z = jax.random.normal(key, (4, 8))
        variables = m.init({"params": key}, z)
        assert np.allclose(np.asarray(variables["moving"]["w_avg"]), 0)
        ws, upd = m.apply(variables, z, update_w_avg=True, mutable=["moving"])
        assert ws.shape == (4, 3, 8)
        assert not np.allclose(np.asarray(upd["moving"]["w_avg"]), 0)
        # default (reference-faithful): no update
        _, upd2 = m.apply(variables, z, mutable=["moving"])
        assert np.allclose(np.asarray(upd2["moving"]["w_avg"]), 0)


class TestStyleGANTraining:
    def _dataset(self, tmp_path):
        from gan3d_tpu.data.datasets import NpzDataset

        x = RNG.normal(size=(16, 16, 16, 16)).astype(np.float32).clip(-1, 1)
        path = str(tmp_path / "train.npz")
        np.savez(path, X=x)
        return NpzDataset(path)

    def test_stylegan2_e2e(self, tmp_path):
        from gan3d_tpu.train import Trainer

        cfg = Config(stylegan2=True, resolution=16, z_size=32, filterG=256,
                     filterD=256, batch_size=4, niters=2, iterD=1,
                     steps_per_log=1, steps_per_img_log=10, steps_per_ckpt=10,
                     log_dir=str(tmp_path / "log"), compute_dtype="float32",
                     num_devices=1, data_loader_workers=1)
        t = Trainer(self._dataset(tmp_path), cfg)
        t.train()
        assert np.isfinite(t.G_losses).all()
        assert t.state.ema_params is not None

    def test_stylegan1_e2e(self, tmp_path):
        from gan3d_tpu.train import Trainer

        cfg = Config(stylegan=True, resolution=16, z_size=64, filterG=256,
                     filterD=256, batch_size=4, niters=2, iterD=1,
                     steps_per_log=1, steps_per_img_log=10, steps_per_ckpt=10,
                     log_dir=str(tmp_path / "log1"), compute_dtype="float32",
                     num_devices=1, data_loader_workers=1)
        t = Trainer(self._dataset(tmp_path), cfg)
        t.train()
        assert np.isfinite(t.G_losses).all()

    def _tiny_cfg(self, tmp_path, **kw):
        base = dict(stylegan2=True, resolution=16, z_size=16, filterG=128,
                    filterD=128, batch_size=4, iterD=1,
                    compute_dtype="float32", num_devices=1,
                    data_loader_workers=1, steps_per_log=100,
                    steps_per_img_log=100, steps_per_ckpt=100,
                    log_dir=str(tmp_path / "log"))
        base.update(kw)
        return Config(**base)

    def test_sg2_static_matches_dynamic(self, tmp_path):
        """Hoisting the lazy R1/PL branches out of lax.cond (static_r1/
        static_pl + host dispatch on step % 16) is numerically identical to
        the dynamic-cond form, across a full lazy interval boundary."""
        from gan3d_tpu.models.stylegan.loss import (LAZY_INTERVAL,
                                                    build_stylegan_step)
        from gan3d_tpu.train import Trainer

        cfg = self._tiny_cfg(tmp_path)
        t = Trainer(self._dataset(tmp_path), cfg)
        dyn = jax.jit(build_stylegan_step(cfg, t.G, t.D, t.g_tx, t.d_tx))
        reg = jax.jit(build_stylegan_step(cfg, t.G, t.D, t.g_tx, t.d_tx,
                                          static_r1=True, static_pl=True))
        plain = jax.jit(build_stylegan_step(cfg, t.G, t.D, t.g_tx, t.d_tx,
                                            static_r1=False, static_pl=False))
        reals = jnp.asarray(rand(cfg.iterD, cfg.batch_size, 16, 16, 16, 1))
        key = jax.random.key(3)
        host = jax.device_get(t.state)
        sa, sb = jax.device_put(host), jax.device_put(host)
        n = LAZY_INTERVAL + 2  # crosses the reg/plain boundary both ways
        for i in range(n):
            sa, ma, _ = dyn(sa, reals, key)
            fn = reg if i % LAZY_INTERVAL == 0 else plain
            sb, mb, _ = fn(sb, reals, key)
            np.testing.assert_allclose(float(ma["g_loss"]),
                                       float(mb["g_loss"]), rtol=1e-5)
        for pa, pb in zip(jax.tree.leaves(sa.g_params),
                          jax.tree.leaves(sb.g_params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(float(sa.pl_mean), float(sb.pl_mean),
                                   rtol=1e-5)

    def test_sg2_reg_grads_regularizes(self, tmp_path):
        """VERDICT r1 missing #4: with cfg.sg2_reg_grads=True the PL penalty
        must contribute G-parameter gradients (and R1 D-parameter gradients)
        — parameter updates at a reg step must differ from the faithful
        value-only default, while the logged loss value is identical."""
        from gan3d_tpu.models.stylegan.loss import build_stylegan_step
        from gan3d_tpu.train import Trainer

        cfg_off = self._tiny_cfg(tmp_path, log_dir=str(tmp_path / "off"))
        cfg_on = cfg_off.replace(sg2_reg_grads=True,
                                 log_dir=str(tmp_path / "on"))
        t = Trainer(self._dataset(tmp_path), cfg_off)
        step_off = jax.jit(build_stylegan_step(cfg_off, t.G, t.D, t.g_tx,
                                               t.d_tx, static_r1=True,
                                               static_pl=True))
        step_on = jax.jit(build_stylegan_step(cfg_on, t.G, t.D, t.g_tx,
                                              t.d_tx, static_r1=True,
                                              static_pl=True))
        reals = jnp.asarray(rand(cfg_off.iterD, cfg_off.batch_size,
                                 16, 16, 16, 1))
        key = jax.random.key(5)
        host = jax.device_get(t.state)
        s_off, m_off, _ = step_off(jax.device_put(host), reals, key)
        s_on, m_on, _ = step_on(jax.device_put(host), reals, key)
        # identical forward values (the penalty VALUE does not depend on the
        # flag — only its gradient contribution does)
        np.testing.assert_allclose(float(m_off["g_loss"]),
                                   float(m_on["g_loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(m_off["d_real"]),
                                   float(m_on["d_real"]), rtol=1e-5)
        g_diff = max(float(jnp.max(jnp.abs(a - b)))
                     for a, b in zip(jax.tree.leaves(s_off.g_params),
                                     jax.tree.leaves(s_on.g_params)))
        d_diff = max(float(jnp.max(jnp.abs(a - b)))
                     for a, b in zip(jax.tree.leaves(s_off.d_params),
                                     jax.tree.leaves(s_on.d_params)))
        assert g_diff > 1e-7, "PL penalty contributed no G grads"
        assert d_diff > 1e-7, "R1 penalty contributed no D grads"

    def test_sg2_split_matches_fused(self, tmp_path):
        """stylegan2 split-step mode (fused_step=False) is numerically
        identical to the fused step."""
        from gan3d_tpu.train import Trainer

        ds = self._dataset(tmp_path)
        ta = Trainer(ds, self._tiny_cfg(tmp_path, niters=3,
                                        log_dir=str(tmp_path / "f"),
                                        fused_step=True))
        ta.train()
        tb = Trainer(ds, self._tiny_cfg(tmp_path, niters=3,
                                        log_dir=str(tmp_path / "s"),
                                        fused_step=False))
        tb.train()
        np.testing.assert_allclose(ta.G_losses, tb.G_losses, rtol=1e-5)
        np.testing.assert_allclose(ta.D_losses, tb.D_losses, rtol=1e-5)
