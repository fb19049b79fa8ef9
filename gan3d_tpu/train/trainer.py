"""Host-side training driver.

Reference: trainer.py:28-313 (Trainer). Differences by design:
- the whole iteration (iterD D-steps + 1 G-step) is ONE jitted XLA program
  (gan3d_tpu.train.step) instead of eager per-op dispatch;
- data parallelism is jit-SPMD over a `data` mesh axis (batch sharded,
  params replicated, gradient all-reduce inserted by XLA) instead of
  nn.DataParallel;
- bf16 compute replaces CUDA AMP; there are no GradScalers;
- config persists as JSON; checkpoints go through Orbax with the same
  rolling single-checkpoint + auto-resume semantics (trainer.py:128-163);
- PRNG is explicitly threaded: given (seed, step) every noise draw is
  reproducible.

Faithful behaviors:
- model selection precedence (trainer.py:52-68) via models.build_models;
- Adam(lr, betas=(0, 0.9)) per network (trainer.py:77-78);
- sample-grid logging from a fixed noise batch every steps_per_img_log, with
  G left in train mode exactly like the reference (which never calls eval();
  BN batch stats + SN power iteration update during logging forwards too);
- stdout log line format and cadence (trainer.py:108-110);
- checkpoint every steps_per_ckpt(=100) with loss/FID histories
  (trainer.py:153-163, 307-310).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gan3d_tpu.config import Config
from gan3d_tpu.data.loader import DevicePrefetcher, Loader
from gan3d_tpu.models import build_models
from gan3d_tpu.parallel.mesh import make_mesh
from gan3d_tpu.train.checkpoint import CheckpointManager
from gan3d_tpu.train.state import TrainState, make_optimizer
from gan3d_tpu.train.step import build_train_step
from gan3d_tpu.utils.png import save_volume_grid


def resolve_boundary_autos(cfg: Config) -> tuple:
    """Resolve the fast_stem / fast_head "auto" modes by resolution/family.

    Measured (docs/PERF.md session 8): for biggan the two-sided C=1
    boundary rewrite (s2d D stem + tap-map G head) LOSES at 64^3
    (-6%/-15%) but WINS at 128^3 (1.01 vs 0.962 vol/s) — and the 128^3
    plain-conv program stopped fitting the remote compile helper, so the
    rewrite is also what keeps 128^3 compilable. Same resolution rule as
    downconv_vjp. For the StyleGAN-1 family the tap-map head WINS at
    64^3 too (59.3 vs 54.8 vol/s, round 3 session 4) — its C_out conv and
    transposes were 13% of the step at 1.1 TF/s.
    """
    fs, fh = cfg.fast_stem, cfg.fast_head
    if fs == "auto":
        fs = "on" if cfg.resolution >= 128 else "off"
    if fh == "auto":
        fh = ("on" if cfg.resolution >= 128 or cfg.family() == "stylegan"
              else "off")
    return fs, fh


class Trainer:
    def __init__(self, dataset, cfg: Config):
        # --- dirs + params persistence (reference trainer.py:33-47) ---
        self.log_dir = cfg.log_dir
        self.models_dir = os.path.join(self.log_dir, "models")
        self.images_dir = os.path.join(self.log_dir, "images")
        os.makedirs(self.models_dir, exist_ok=True)
        os.makedirs(self.images_dir, exist_ok=True)
        if cfg.load_params:
            cfg = Config.load(cfg.log_dir).replace(log_dir=cfg.log_dir)
        else:
            cfg.save()
        self.cfg = cfg
        self.family = cfg.family()

        # Lane-packed narrow-conv rewrite (ops/lane_conv.py) — set before any
        # model tracing; the flag is read at trace time.
        from gan3d_tpu.ops.downsample_conv import (set_downconv_vjp_mode,
                                                   set_fast_downconv_mode)
        from gan3d_tpu.ops.dw_conv import set_fast_dw_mode
        from gan3d_tpu.ops.lane_conv import set_lane_conv_mode
        from gan3d_tpu.ops.s2d_conv import set_fast_stem_mode
        from gan3d_tpu.ops.tap_conv import set_fast_head_mode
        from gan3d_tpu.ops.upsample_conv import set_fast_upconv_mode
        from gan3d_tpu.ops.wide_conv import set_wide_conv_mode
        set_lane_conv_mode(cfg.fast_conv)
        set_fast_upconv_mode(cfg.fast_upconv)
        set_fast_downconv_mode(cfg.fast_downconv)
        # Measured (docs/PERF.md): the collapsed downconv VJP wins at
        # 128^3 (+10%, recompute-dominated) and loses at 64^3 (-5%, the
        # custom_vjp boundary blocks backward fusions).
        dv = cfg.downconv_vjp
        if dv == "auto":
            dv = "custom" if cfg.resolution >= 128 else "autodiff"
        set_downconv_vjp_mode(dv)
        set_fast_dw_mode(cfg.fast_dw)
        set_wide_conv_mode(cfg.wide_conv)
        fs, fh = resolve_boundary_autos(cfg)
        set_fast_stem_mode(fs)
        set_fast_head_mode(fh)
        from gan3d_tpu.models.stylegan.resample import set_fast_fir_mode
        set_fast_fir_mode(cfg.fast_fir)
        from gan3d_tpu.ops.c1_conv import set_fast_c1_mode
        set_fast_c1_mode(cfg.fast_c1)
        from gan3d_tpu.ops.subpixel_conv import set_fast_pix_mode
        set_fast_pix_mode(cfg.fast_pix)
        from gan3d_tpu.ops.conv3d import set_fast_tri_mode
        set_fast_tri_mode(cfg.fast_tri)
        from gan3d_tpu.models.stylegan.stylegan1 import set_fast_adain_mode
        set_fast_adain_mode(cfg.fast_adain)
        from gan3d_tpu.ops.dx_conv import set_conv_dx_mode
        set_conv_dx_mode(cfg.conv_dx)

        if (cfg.resolution >= 128 and not cfg.remat
                and self.family not in ("stylegan", "stylegan2")):
            # stylegan's 128^3 channel table is narrow enough that batch <= 8
            # fits (and runs faster) WITHOUT remat — measured in docs/PERF.md.
            print("hint: at 128^3+, --remat=True --fused_step=False is "
                  "usually required to fit HBM / the compiler; add "
                  "--remat_scope=stage for larger batches (docs/PERF.md)",
                  flush=True)

        # --- mesh + models ---
        self.mesh = make_mesh(cfg.num_devices, spatial=cfg.spatial_devices,
                              model=cfg.model_devices)
        ndev = len(self.mesh.devices.ravel())
        n_data = ndev // max(cfg.spatial_devices, 1) \
            // max(cfg.model_devices, 1)
        if cfg.batch_size % n_data:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by {n_data} "
                f"data-parallel devices")
        if cfg.spatial_devices > 1 and cfg.resolution % cfg.spatial_devices:
            raise ValueError(
                f"resolution {cfg.resolution} not divisible by "
                f"spatial_devices {cfg.spatial_devices}")
        if cfg.spatial_devices > 1 or cfg.model_devices > 1:
            # A Pallas custom call cannot be partitioned by GSPMD: lower the
            # attention through plain XLA ops in sharded-tensor programs.
            from gan3d_tpu.ops.attention import set_attention_impl
            set_attention_impl("xla")
        # Multi-host: each process feeds its slice of the global batch.
        self._n_proc = jax.process_count()
        self._local_batch = cfg.batch_size // self._n_proc
        self.G, self.D = build_models(cfg)

        key = jax.random.key(cfg.seed)
        kg, kd, self._base_key = jax.random.split(key, 3)
        z0 = jnp.zeros((cfg.batch_size, cfg.z_size), jnp.float32)
        x0 = jnp.zeros((cfg.batch_size, cfg.resolution, cfg.resolution,
                        cfg.resolution, 1), jnp.float32)
        g_rngs = {"params": kg}
        if self.family == "stylegan2":
            g_rngs["noise"] = jax.random.fold_in(kg, 1)
        elif self.family == "stylegan":
            g_rngs["mixing"] = jax.random.fold_in(kg, 2)
        d_rngs = {"params": kd}
        if cfg.msl:
            d_rngs["crops"] = jax.random.fold_in(kd, 1)
        # jit the inits: eager init dispatches hundreds of tiny device ops
        # (minutes over a TPU tunnel); jitted it is one program.
        g_vars = jax.jit(self.G.init)(g_rngs, z0)
        d_vars = jax.jit(self.D.init)(d_rngs, x0)

        g_params = g_vars["params"]
        g_state = {k: v for k, v in g_vars.items() if k != "params"}
        d_params = d_vars["params"]
        d_state = {k: v for k, v in d_vars.items() if k != "params"}

        self.g_tx = make_optimizer(cfg.lrG, cfg.adam_b1, cfg.adam_b2,
                                   mu_free=cfg.mu_free_adam)
        self.d_tx = make_optimizer(cfg.lrD, cfg.adam_b1, cfg.adam_b2,
                                   mu_free=cfg.mu_free_adam)
        state = TrainState(
            step=jnp.int32(0),
            g_params=g_params, g_state=g_state, g_opt=self.g_tx.init(g_params),
            d_params=d_params, d_state=d_state, d_opt=self.d_tx.init(d_params),
            # jnp.copy: ema must not alias g_params — the jitted step donates
            # the state and XLA rejects the same buffer appearing twice.
            ema_params=(jax.tree.map(jnp.copy, g_params)
                        if self.family == "stylegan2" else None),
            pl_mean=(jnp.float32(0) if self.family in ("stylegan2", "stylegan")
                     else None),
        )

        # --- shardings + jitted programs ---
        # Scoped-VMEM budget for the step programs (cfg.xla_vmem_limit_kib,
        # opt-in). A 64 MiB budget measured +1.4% on the 64^3 flagship step
        # but costs 2.8x the compile time and makes the remote compile
        # helper SIGKILL nondeterministically (and deterministically at
        # 128^3) — docs/PERF.md. auto therefore resolves to the compiler
        # default; the knob stays for hardware with a local compiler.
        vmem = max(cfg.xla_vmem_limit_kib, 0)
        self._compiler_options = (
            {"xla_tpu_scoped_vmem_limit_kib": str(vmem)} if vmem > 0 else None)

        def jit_step(fn, **kw):
            return jax.jit(fn, compiler_options=self._compiler_options, **kw)

        # With spatial_devices > 1 the volume depth axis additionally shards
        # over "space" (reals are [iterD, N, D, H, W, 1]; fakes [N, D, H, W,
        # 1]) and GSPMD inserts halo exchanges for every conv stencil.
        sp = ("space",) if cfg.spatial_devices > 1 else ()
        rep = NamedSharding(self.mesh, P())
        batch_in = NamedSharding(self.mesh, P(None, "data", *sp))
        batch_out = NamedSharding(self.mesh, P("data", *sp))
        self._rep = rep
        self._batch_in = batch_in
        # Tensor parallelism (cfg.model_devices > 1): the train state's wide
        # kernels shard their output-channel dim over the "model" axis
        # (parallel/tp.py); GSPMD propagates the sharding through the step.
        if cfg.model_devices > 1:
            from gan3d_tpu.parallel.tp import tp_shardings
            state_shard = tp_shardings(state, self.mesh)
        else:
            state_shard = rep
        self._state_shard = state_shard
        self.state = jax.device_put(state, state_shard)

        if self.family in ("stylegan2", "stylegan"):
            # The lazy R1/PL branches are hoisted out of lax.cond: we compile
            # one program per (reg on, reg off) and dispatch by the host step
            # index (state.step == i in the train loop), so each program
            # carries only the code it runs — halves G/D-side HLO at 128^3.
            # stylegan(-1): R1 fires every step -> a single program suffices.
            from gan3d_tpu.models.stylegan.loss import (
                LAZY_INTERVAL, build_stylegan_split_steps, build_stylegan_step)

            is_v2 = self.family == "stylegan2"

            def _jit_fused(r1, pl):
                fn = build_stylegan_step(cfg, self.G, self.D, self.g_tx,
                                         self.d_tx, static_r1=r1,
                                         static_pl=pl)
                return jit_step(fn, in_shardings=(state_shard, batch_in, rep),
                                out_shardings=(state_shard, rep, batch_out),
                                donate_argnums=(0,))

            if cfg.fused_step:
                if is_v2:
                    step_reg = _jit_fused(True, True)
                    step_plain = _jit_fused(False, False)

                    def sg_step(state, reals, base_key, i):
                        fn = step_reg if i % LAZY_INTERVAL == 0 else step_plain
                        return fn(state, reals, base_key)

                    self._step = sg_step
                    self._jit_programs = {"fused": step_plain,
                                          "fused_reg": step_reg}
                else:
                    step_only = _jit_fused(True, False)
                    self._step = lambda s, r, k, i: step_only(s, r, k)
                    self._jit_programs = {"fused": step_only}
            else:
                def _jit_split(r1, pl):
                    d_fn, g_fn = build_stylegan_split_steps(
                        cfg, self.G, self.D, self.g_tx, self.d_tx,
                        static_r1=r1, static_pl=pl)
                    d_jit = jit_step(d_fn,
                                     in_shardings=(state_shard, batch_out,
                                                   rep, rep),
                                     out_shardings=(state_shard, rep),
                                     donate_argnums=(0,))
                    g_jit = jit_step(g_fn, in_shardings=(state_shard, rep),
                                     out_shardings=(state_shard, rep,
                                                    batch_out),
                                     donate_argnums=(0,))
                    return d_jit, g_jit

                if is_v2:
                    reg_fns = _jit_split(True, True)
                    plain_fns = _jit_split(False, False)
                else:
                    reg_fns = plain_fns = _jit_split(True, False)

                def sg_split_step(state, reals, base_key, i):
                    d_jit, g_jit = (reg_fns if i % LAZY_INTERVAL == 0
                                    else plain_fns)
                    d_metrics = {}
                    for k in range(cfg.iterD):
                        state, d_metrics = d_jit(state, reals[k], base_key,
                                                 jnp.int32(k))
                    state, g_metrics, fake = g_jit(state, base_key)
                    return state, {**d_metrics, **g_metrics}, fake

                self._step = sg_split_step
                self._jit_programs = {"d": plain_fns[0], "g": plain_fns[1],
                                      "d_reg": reg_fns[0],
                                      "g_reg": reg_fns[1]}
        elif cfg.fused_step:
            step_fn = build_train_step(cfg, self.G, self.D, self.g_tx,
                                       self.d_tx)
            fused = jit_step(step_fn,
                             in_shardings=(state_shard, batch_in, rep),
                             out_shardings=(state_shard, rep, batch_out),
                             donate_argnums=(0,))
            self._step = lambda s, r, k, i: fused(s, r, k)
            # raw jitted program handles for tooling (HLO dumps, AOT cost
            # analysis — scripts/dump_step_hlo.py)
            self._jit_programs = {"fused": fused}
        else:
            # Split mode: two smaller XLA programs (numerically identical to
            # the fused step) — for configs whose fused HLO overloads the
            # compiler (e.g. 128^3 + remat).
            from gan3d_tpu.train.step import build_split_steps

            d_fn, g_fn = build_split_steps(cfg, self.G, self.D, self.g_tx,
                                           self.d_tx)
            d_jit = jit_step(d_fn, in_shardings=(state_shard, batch_out,
                                                 rep, rep),
                             out_shardings=(state_shard, rep),
                             donate_argnums=(0,))
            g_jit = jit_step(g_fn, in_shardings=(state_shard, rep),
                             out_shardings=(state_shard, rep, batch_out),
                             donate_argnums=(0,))

            def split_step(state, reals, base_key, i):
                d_metrics = {}
                for k in range(cfg.iterD):
                    state, d_metrics = d_jit(state, reals[k], base_key,
                                             jnp.int32(k))
                state, g_metrics, fake = g_jit(state, base_key)
                return state, {**d_metrics, **g_metrics}, fake

            self._step = split_step
            self._jit_programs = {"d": d_jit, "g": g_jit}

        sample_key = jax.random.fold_in(self._base_key, 0xA5)

        def sample_fn(state: TrainState, noise: jax.Array):
            out, g_state = _apply_g(self.G, self.family, state, noise,
                                    sample_key)
            return out, state.replace(g_state=g_state)

        noise_in = NamedSharding(self.mesh, P("data"))  # [B, z]: no space dim
        self._sample = jax.jit(sample_fn, in_shardings=(state_shard, noise_in),
                               out_shardings=(batch_out, state_shard))

        # --- data (per-host slice of the global batch) ---
        self.loader = Loader(dataset, self._local_batch,
                             seed=cfg.seed + jax.process_index(),
                             num_workers=cfg.data_loader_workers)

        # --- bookkeeping (reference trainer.py:86-92) ---
        self.fixed_test_noise: Optional[jax.Array] = None
        self.G_losses: List[float] = []
        self.D_losses: List[List[float]] = []
        self.fid: List[float] = []
        self.fid_epoch: List[float] = []
        self._pending: List[Dict[str, Any]] = []
        # cfg.async_log: a log step stores (step, metrics, fake, real) here
        # and the device sync + print happen at the NEXT flush point, with
        # later steps already in the dispatch queue.
        self._deferred: Optional[tuple] = None
        self.ckpt = CheckpointManager(self.models_dir)
        self._fid_fn = self._make_inloop_fid()
        from gan3d_tpu.utils.profiling import StepProfiler

        self.profiler = StepProfiler(cfg.profile_dir)
        from gan3d_tpu.utils.energy import EnergyTracker

        self.energy = EnergyTracker(enabled=cfg.track_energy, n_chips=ndev)

    # ------------------------------------------------------------------
    def _make_inloop_fid(self):
        """In-loop axial slice FID of fake vs the current real batch — the
        reference computes it every steps_per_log unconditionally
        (trainer.py:100-110). cfg.fid_in_loop: None (default) = faithful
        whenever possible — Inception slice FID when weights are found,
        warn-and-nan otherwise; True = force (random-feature stand-in when no
        weights); False = off."""
        mode = self.cfg.fid_in_loop
        self._fid_active = False
        if mode is False:
            return lambda fake, real: float("nan")
        weights = self.cfg.inception_weights
        if not weights:
            fname = "pt_inception-2015-12-05-6726825d.pth"
            for d in (os.getcwd(), self.log_dir):
                cand = os.path.join(d, fname)
                if os.path.isfile(cand):
                    weights = cand
                    break
        if weights and os.path.isfile(weights):
            try:
                from gan3d_tpu.eval.slice_fid import SliceFID

                sfid = SliceFID(weights_path=weights)
                self._fid_active = True
                return lambda fake, real: sfid.axial(fake, real)
            except Exception as e:  # noqa: BLE001 — bad weights file
                print(f"in-loop FID disabled: {e}", flush=True)
                return lambda fake, real: float("nan")
        if mode is True:  # explicit opt-in without weights: stand-in
            from gan3d_tpu.eval.slice_fid import SliceFID

            sfid = SliceFID()
            self._fid_active = True
            return lambda fake, real: sfid.axial(fake, real)
        print("in-loop FID: no Inception weights found (set "
              "cfg.inception_weights); logging FID as nan. The reference "
              "computes slice-FID every steps_per_log (trainer.py:100-110).",
              flush=True)
        return lambda fake, real: float("nan")

    # ------------------------------------------------------------------
    def _flush_pending(self):
        for m in self._pending:
            self.D_losses.append([float(m["d_real"]), float(m["d_fake"])])
            self.G_losses.append(float(m["g_loss"]))
        self._pending.clear()

    def _history(self) -> Dict[str, Any]:
        self._flush_pending()
        return {"lossG": self.G_losses, "lossD": self.D_losses,
                "fid": self.fid_epoch}

    def log_train(self, step: int, fake, real, metrics=None) -> None:
        if self._n_proc > 1 and self._fid_active and real is not None:
            # Multi-host: the fid fn needs the full fake batch (sharded
            # globally) and the full real batch (each process holds only
            # its slice).
            from jax.experimental import multihost_utils

            fake = self._gather_global(fake)
            real = multihost_utils.process_allgather(np.asarray(real),
                                                     tiled=True)
        self.fid.append(self._fid_fn(fake, real))
        self._flush_pending()
        if metrics is not None:
            # deferred flush: _pending may already hold LATER steps'
            # metrics, so print this step's own values, not the list tail.
            d_real, d_fake = float(metrics["d_real"]), float(metrics["d_fake"])
            g_loss = float(metrics["g_loss"])
        else:
            d_real, d_fake = self.D_losses[-1]
            g_loss = self.G_losses[-1]
        print("[%d|%d]\tD(x): %.4f\tD(G(z)): %.4f|%.4f\tFID %.4f"
              % (step, self.cfg.niters, d_real, d_fake, g_loss,
                 self.fid[-1]), flush=True)

    def _flush_deferred(self) -> None:
        if self._deferred is not None:
            step, metrics, fake, real = self._deferred
            self._deferred = None
            self.log_train(step, fake, real, metrics=metrics)

    def log_interpolation(self, step: int) -> None:
        if self.fixed_test_noise is None:
            noise = np.asarray(jax.random.normal(
                jax.random.fold_in(self._base_key, 0xF1),
                (self.cfg.batch_size, self.cfg.z_size)))
            sharding = NamedSharding(self.mesh, P("data"))
            # make_array_from_callback is multi-process safe (each process
            # contributes only its addressable shards); device_put with a
            # global sharding is not.
            self.fixed_test_noise = jax.make_array_from_callback(
                noise.shape, sharding, lambda idx: noise[idx])
        fake, self.state = self._sample(self.state, self.fixed_test_noise)
        fake = self._gather_global(fake)
        if jax.process_index() == 0:
            save_volume_grid(os.path.join(self.images_dir, f"{step}.png"),
                             np.asarray(fake, np.float32))

    def _gather_global(self, arr):
        """Full array on every host: device_get locally, process_allgather
        (a collective — every process must call it) on multi-host."""
        if self._n_proc == 1:
            return jax.device_get(arr)
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(arr, tiled=True)

    def log(self, step: int, fake, real, metrics=None) -> None:
        if step % self.cfg.steps_per_log == 0:
            if self.cfg.async_log and metrics is not None:
                self._flush_deferred()
                self._deferred = (step, metrics, fake, real)
            else:
                self.log_train(step, fake, real)
        if step % self.cfg.steps_per_img_log == 0:
            self._flush_deferred()  # keep the [step] line ahead of its PNG
            self.log_interpolation(step)

    def save_checkpoint(self, step: int) -> None:
        self.ckpt.save(step, jax.device_get(self.state), self._history())

    def start_from_checkpoint(self) -> int:
        template = jax.device_get(self.state)
        restored, history = self.ckpt.restore(template)
        if restored is None:
            return 0
        self.state = jax.device_put(restored, self._state_shard)
        self.G_losses = history.get("lossG", [])
        self.D_losses = history.get("lossD", [])
        self.fid_epoch = history.get("fid", [])
        step = int(restored.step)
        print(f"starting from step {step}", flush=True)
        return step

    # ------------------------------------------------------------------
    def _wire_dtype(self):
        """Numpy dtype for batch upload, or None to keep float32."""
        w = self.cfg.wire_dtype
        if w == "float32":
            return None
        if w == "bfloat16":
            return jnp.bfloat16
        # auto: ship in compute dtype when that is numerically free — the
        # step casts reals at the first conv anyway; only the WGAN-GP input
        # interpolation consumes them in f32.
        if self.cfg.gp_weight:
            return None
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else None

    def train(self) -> None:
        cfg = self.cfg
        step_done = self.start_from_checkpoint()
        gen = self.loader.infinite()
        if self._n_proc == 1:
            put = lambda arr: jax.device_put(arr, self._batch_in)  # noqa: E731
        else:
            from gan3d_tpu.parallel.mesh import put_global_batch

            put = lambda arr: put_global_batch(  # noqa: E731
                self.mesh, arr, self._batch_in.spec)
        prefetch = DevicePrefetcher(gen, cfg.iterD, put,
                                    wire_dtype=self._wire_dtype())
        print("Starting Training...", flush=True)
        t0 = time.time()
        fake = real = None
        for i in range(step_done, cfg.niters):
            self.profiler.step(i)
            self.energy.epoch_start()
            reals_dev, real_host = prefetch.get()
            self.state, metrics, fake = self._step(self.state, reals_dev,
                                                   self._base_key, i)
            self._pending.append(metrics)  # device arrays; sync at log time
            self.energy.epoch_end()
            real = real_host
            self.log(i, fake, real, metrics)
            if i == step_done:
                # sync the first step eagerly: keeps the [0|N] line prompt,
                # surfaces compile failures immediately, and makes t_first
                # mark "compile + first step" exactly.
                self._flush_deferred()
                t_first = time.time()
            if i % cfg.steps_per_ckpt == 0 and i > 0:
                self._flush_deferred()  # fid list must include this step
                vals = [v for v in self.fid if not np.isnan(v)]
                self.fid_epoch.append(float(np.mean(vals)) if vals
                                      else float("nan"))
                self.fid = []
                self.save_checkpoint(i)
        # final log + checkpoint (reference trainer.py:172-175, 312)
        prefetch.close()
        gen.close()
        self.loader.close()  # stop the prefetch producer thread promptly
        i = cfg.niters - 1
        self.profiler.close()
        self.energy.write(self.log_dir)
        self._flush_deferred()
        self.log_train(i, fake, real)
        t_last_sync = time.time()  # all steps' compute synced at this point
        self.log_interpolation(i)
        self.save_checkpoint(i)
        self.ckpt.wait()
        dt = time.time() - t0
        n_steps = cfg.niters - step_done
        if n_steps > 0:
            msg = (f"...Done ({n_steps} steps in {dt:.1f}s, "
                   f"{n_steps / dt:.2f} steps/s")
            if n_steps > 1:
                # steady-state rate excluding compile+first step (the final
                # log_train above synced the last step's metrics).
                steady = (n_steps - 1) / max(t_last_sync - t_first, 1e-9)
                msg += (f"; steady {steady:.2f} steps/s = "
                        f"{steady * cfg.batch_size:.1f} vol/s")
            print(msg + ")", flush=True)


def _apply_g(G, family: str, state: TrainState, noise: jax.Array,
             rng_key=None):
    """Generator forward in train mode with mutable state (the reference
    never switches G to eval for logging, so BN/SN/mixing stay live)."""
    variables = {"params": state.g_params, **state.g_state}
    mut = list(state.g_state.keys())
    rngs = None
    if rng_key is not None:
        if family == "stylegan2":
            rngs = {"noise": rng_key}
        elif family == "stylegan":
            rngs = {"mixing": rng_key}
    if mut:
        fake, new_state = G.apply(variables, noise, train=True, mutable=mut,
                                  rngs=rngs)
    else:
        fake, new_state = G.apply(variables, noise, train=True, rngs=rngs), {}
    if isinstance(fake, tuple):  # stylegan2 returns (img, ws)
        fake = fake[0]
    return fake, new_state
