"""Typed configuration for gan3d_tpu.

Mirrors every flag of the reference CLI (reference: main.py:6-36) plus
TPU-native extras. The reference pickles its argparse Namespace to
``log_dir/params.pkl`` (reference: trainer.py:42-47) and rebuilds model
architectures from it at eval time (reference: eval.py:16-21,
tournament.py:15-23); we keep the same per-run-dir persistence contract but
serialize to JSON (``params.json``) instead of pickle, which is portable and
diff-able. For interop we can also *read* reference params.pkl files.

Model-family precedence matches reference trainer.py:52-68:
    hybrid > dcgan > stylegan2 > stylegan > biggan-default
where ``sngan/sagan/biggan/msl`` further mutate the selected family.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

PARAMS_FILENAME = "params.json"


@dataclass
class Config:
    # ---- Hyperparameters (reference: main.py:8-19) ----
    niters: int = 5000
    batch_size: int = 16
    z_size: int = 512
    filterG: int = 128
    filterD: int = 128
    iterD: int = 2
    lrG: float = 5e-5
    lrD: float = 1e-4
    data_path: str = "lidc_train"
    steps_per_log: int = 10
    steps_per_img_log: int = 50
    log_dir: str = "log"
    load_params: bool = False

    # ---- Model family switches (reference: main.py:25-32) ----
    dcgan: bool = False
    hybrid: bool = False
    stylegan2: bool = False
    stylegan: bool = False
    msl: bool = False
    sngan: bool = False
    sagan: bool = False
    biggan: bool = False

    # ---- Loss (reference: main.py:35) ----
    hinge: bool = False

    # ---- TPU-native extras (no reference equivalent) ----
    resolution: int = 128       # output volume side; reference hardcodes 128
    seed: int = 0               # base PRNG seed (reference samples ad hoc)
    num_devices: int = 0        # devices for data parallelism; 0 = all
    spatial_devices: int = 1    # >1: 2-D (data, space) mesh — the volume
                                # depth axis is sharded over `space` and XLA
                                # GSPMD inserts conv halo exchanges (the
                                # volumetric analog of context parallelism,
                                # SURVEY §5.7). Lets volumes whose
                                # activations exceed one chip's HBM (256^3+,
                                # or 128^3 without remat) train across
                                # chips. resolution must divide by it;
                                # attention lowers through XLA (not Pallas)
                                # in this mode.
    model_devices: int = 1      # >1: 2-D (data, model) mesh — tensor
                                # parallelism: wide kernels shard their
                                # output-channel dim over `model`
                                # (parallel/tp.py) and downstream
                                # activations shard channel-wise, dividing
                                # activation memory by the axis size. The
                                # channel-dim complement to spatial_devices
                                # (not combinable with it); attention
                                # lowers through XLA in this mode.
    sync_bn: bool = True        # cross-replica BN stats (reference DataParallel
                                # computes BN per replica; see SURVEY §5.8)
    compute_dtype: str = "bfloat16"  # bf16 compute replaces CUDA AMP
    param_dtype: str = "float32"
    remat: bool = False         # jax.checkpoint per block (memory at 128^3)
    remat_scope: str = "block"  # remat granularity for the biggan family:
                                # "block" = one jax.checkpoint per deep
                                # block; "stage" = per doubled-block stage,
                                # with the G out-head and D input-conv
                                # folded into their neighboring stage —
                                # same recompute FLOPs (everything is
                                # recomputed exactly once either way) but
                                # far smaller saved-boundary memory: the
                                # 128^3 64-ch head input (268 MB/sample
                                # bf16) stops being a checkpoint residual.
                                # Unlocks larger batches at 128^3.
    steps_per_ckpt: int = 100   # reference checkpoints every 100 steps
    async_log: bool = True      # defer each log line's device sync to the
                                # next flush point (log/img/ckpt step or end
                                # of training) so later steps are already
                                # enqueued when the host blocks — the
                                # blocking readback otherwise drains the
                                # dispatch queue and idles the chip (~15% at
                                # steps_per_log=10 over a high-latency
                                # tunnel). Printed values, content, and line
                                # order are identical; lines just appear one
                                # log interval later. False = print eagerly.
    fid_in_loop: Optional[bool] = None  # in-loop axial slice FID every
                                # steps_per_log (reference trainer.py:100-110
                                # computes it unconditionally). None = auto:
                                # on when Inception weights are found (see
                                # inception_weights), warn-and-nan otherwise;
                                # True = force (random-feature stand-in if no
                                # weights); False = off.
    inception_weights: str = ""  # path to the pt_inception-2015-12-05 torch
                                 # weights for slice FID; "" = search cwd +
                                 # log_dir for the standard filename
    fused_step: bool = True     # single jitted step: iterD D-updates + 1 G-update
    adam_b1: float = 0.0        # reference: trainer.py:77-78 betas=(0., 0.9)
    adam_b2: float = 0.9
    mu_free_adam: bool = True   # b1=0 drops the (inert) first-moment tree
                                # (train/state.py) — bit-identical updates,
                                # one param-sized fp32 tree less HBM. False
                                # = plain optax.adam (escape hatch for the
                                # remote-compile-helper ceiling at 128^3
                                # with the boundary rewrite forced off).
    ema_decay: float = 0.5      # stylegan2 weight_avg: 0.5 (reference: trainer.py:199-206)
    data_loader_workers: int = 4
    profile_dir: str = ""       # if set, jax.profiler traces are written here
    platform: str = ""          # force a JAX platform ('cpu'/'tpu'); "" = auto
    gp_weight: float = 0.0      # WGAN-GP weight (reference has it commented
                                # out at trainer.py:242; opt-in here)
    sg2_reg_grads: bool = False  # False = reference-faithful: R1/PL computed
                                 # with create_graph=False contribute NO
                                 # parameter gradients (stylegan.py:62, 88);
                                 # True = NVIDIA-original regularization
    track_energy: bool = False   # energy/CO2e estimate -> log_dir/energy.json
                                 # (reference wires carbontracker but keeps it
                                 # commented out — trainer.py:6, 93)
    channel_ratio: int = 4       # BigGAN-deep bottleneck shrink factor
                                 # (reference utils.py:48 fixes 4); smaller =
                                 # wider hidden convs = far better MXU
                                 # utilization on TPU (docs/PERF.md)
    fast_conv: str = "auto"      # lane-packed rewrite of narrow-channel k=3
                                 # convs (ops/lane_conv.py): "auto" = the
                                 # measured end-to-end winner (currently OFF:
                                 # isolated-conv wins don't survive block
                                 # fusion — docs/PERF.md); "on"/"bwd"/"off"
                                 # force the rewrite / hybrid / plain paths.
                                 # Numerically equivalent modulo f32 summation
                                 # order; read at trace time.
    fast_upconv: str = "auto"    # fused nearest-2x-upsample + k=3 conv in
                                 # GBlockDeep (ops/upsample_conv.py): "auto"
                                 # = the measured TPU winner ("tconv", one
                                 # stride-2 transposed conv, +20-25%/block);
                                 # "on"/"tconv"/"off" force. Same params /
                                 # numerics (mod f32 order).
    fast_downconv: str = "auto"  # fused avgpool(2) + 1x1 conv in
                                 # DBlockDeep (ops/downsample_conv.py): one
                                 # k=2/s=2 conv per pair, incl. the concat
                                 # shortcut (measured 1.05-2.84x per pair
                                 # on TPU — docs/PERF.md). "auto" = on for
                                 # TPU; "on"/"off" force. Same params /
                                 # numerics (mod f32 order).
    downconv_vjp: str = "auto"   # backward form for the fused downconvs:
                                 # "custom" = collapsed uniform-kernel VJP
                                 # (dx = one GEMM + nearest-upsample, dW =
                                 # avgpool(x)^T @ g), "autodiff" = XLA's
                                 # lhs_dilate=2 conv forms, "auto" = the
                                 # measured step-level winner (docs/PERF.md
                                 # — custom_vjp is also a fusion boundary).
    wide_conv: str = "auto"      # Pallas transposed-layout conv for the
                                 # narrow k=3/s=1/p=1 convs
                                 # (ops/wide_conv.py): out^T = W2 @ X27 with
                                 # N=spatial (all MXU lanes), Pallas fwd/dx/
                                 # dW. "auto" = measured winner per backend;
                                 # "on"/"off" force.
    fast_dw: str = "auto"        # Pallas wide-N weight-gradient kernel for
                                 # the k=3/s=1/p=1 convs (ops/dw_conv.py):
                                 # dW as one [Ci,K]@[K,27*Co] GEMM (all MXU
                                 # lanes live vs XLA's narrow-N=Co form).
                                 # "auto" = measured winner per backend;
                                 # "on"/"off" force. Forward/dx unchanged;
                                 # dW accumulates f32.
    fast_stem: str = "auto"      # space-to-depth rewrite of the k=3 Ci=1
                                 # stem conv (ops/s2d_conv.py): packed
                                 # k=[3,2,2] conv at 4x channels — exact
                                 # algebra, grad program 2.95x in
                                 # isolation; step A/B: LOSES at 64^3,
                                 # WINS at 128^3 with fast_head — "auto"
                                 # = on at >=128^3, off below (Trainer).
    fast_head: str = "auto"      # tap-map rewrite of the Co=1 G output
                                 # conv (ops/tap_conv.py): channel GEMM +
                                 # 27-tap shift-add. Step A/B: LOSES at
                                 # 64^3 (19.1 vs 20.3), WINS at 128^3
                                 # with fast_stem (1.01 vs 0.962) — same
                                 # auto rule as fast_stem.
    fast_fir: str = "auto"       # stylegan upfirdn3d as three separable
                                 # spatial-axis matmuls (models/stylegan/
                                 # resample.py): the C<=64 depthwise FIRs
                                 # run at 0.1 TF/s in XLA's degenerate
                                 # C=1 layout (~80% of the sg2 step).
                                 # Measured GO: 2.30x (PERF.md session 9);
                                 # "auto" = on (c<=64 per-call gate).
    fast_c1: str = "auto"        # tiny-channel k=3 convs as one banded
                                 # spatial-matmul einsum (ops/c1_conv.py):
                                 # the 1-2-channel sg2 top-res blocks run
                                 # at 0.1-0.2 TF/s in XLA's degenerate
                                 # layout (68% of the sg2 64^3 step,
                                 # round-3 trace). Measured GO twice:
                                 # stride-1 264.9 vs 144.5 (1.83x), then
                                 # up/down 372.9 vs 264.9 (1.41x) —
                                 # "auto" = on (TPU).
    fast_tri: str = "auto"       # trilinear 2x upsample (StyleGAN-1 G) as
                                 # three banded spatial-axis matmul einsums
                                 # (ops/conv3d.py) instead of
                                 # jax.image.resize, whose dot_general
                                 # lowering forces ~17 ms/step of layout
                                 # copies (round-3 session-5 trace).
                                 # "auto" resolves per the measured A/B
                                 # (fast_tri_enabled()).
    conv_dx: str = "auto"        # explicit-conv first-order backward for
                                 # the StyleGAN-1 G's stride-1 k=3 convs
                                 # (ops/dx_conv.py): dx/dW handed to XLA
                                 # as plain convolutions instead of the
                                 # autodiff lowering whose cotangent
                                 # reorganization runs as a 4 GB/s
                                 # DUS-while (~8% of the sg1 step).
                                 # "auto" per the measured A/B
                                 # (conv_dx_enabled()).
    fast_adain: str = "auto"     # StyleGAN-1 AdaIN lowering: one-pass
                                 # moments (Σx, Σx² fused into the producer
                                 # conv's epilogue — removes the var pass's
                                 # second full read) + single-FMA apply
                                 # (models/stylegan/stylegan1.py:ada_in).
                                 # "auto" resolves per the measured A/B
                                 # (fast_adain_enabled()).
    fast_pix: str = "auto"       # sub-pixel (s2d/d2s) rewrite of the DCGAN
                                 # family's k=4 s=2 single-channel boundary
                                 # convs (ops/subpixel_conv.py): G's final
                                 # tconv and D's stem conv run at 1.5-3.9
                                 # TF/s in XLA's degenerate C=1 layout
                                 # (~30% of the dcgan 64^3 step, round-3
                                 # trace). Measured GO: 408.6 vs 324.4
                                 # vol/s (1.26x) — "auto" = on (TPU).
    xla_vmem_limit_kib: int = -1  # scoped-VMEM fusion budget passed to the
                                  # TPU compiler (xla_tpu_scoped_vmem_limit_kib)
                                  # for the train-step programs, via
                                  # jit(compiler_options=...). -1/0 =
                                  # compiler default (64 MiB measured only
                                  # +1.4% on the flagship step at 2.8x the
                                  # compile time, with flaky remote-helper
                                  # compiles — docs/PERF.md); >0 opts in to
                                  # that many KiB on hardware with a local
                                  # compiler.
    wire_dtype: str = "auto"     # host->device dtype for real batches:
                                 # "auto" = compute_dtype when numerically
                                 # free (the step casts at the first conv;
                                 # forced to f32 while gp_weight > 0, whose
                                 # input interpolation is f32), or
                                 # "float32"/"bfloat16" to force. Halves
                                 # tunnel upload bytes on TPU.
    # ---- multi-host (DCN) — no reference equivalent (SURVEY §2.2) ----
    distributed: bool = False    # call jax.distributed.initialize at startup
    coordinator_address: str = ""  # host:port of process 0 ("" = env/auto)
    process_id: int = -1           # -1 = from environment
    num_processes: int = 0         # 0 = from environment

    # ------------------------------------------------------------------
    def family(self) -> str:
        """Resolved model family per reference precedence (trainer.py:52-68)."""
        if self.hybrid:
            return "hybrid"
        if self.dcgan:
            return "dcgan"
        if self.stylegan2:
            return "stylegan2"
        if self.stylegan:
            return "stylegan"
        return "biggan"  # covers sngan / sagan / biggan flag variants

    # ------------------------------------------------------------------
    # Derived architecture helpers. The reference hardcodes 128^3; we derive
    # the same channel patterns for any power-of-two resolution >= 8 so the
    # 32^3 / 64^3 BASELINE configs work with the identical topology at 128.
    # ------------------------------------------------------------------
    @property
    def num_up_stages(self) -> int:
        """Stride-2 stages from the 4^3 stem to `resolution`."""
        r, n = self.resolution, 0
        assert r >= 8 and (r & (r - 1)) == 0, "resolution must be 2^k >= 8"
        while r > 4:
            r //= 2
            n += 1
        return n

    def dcgan_g_channels(self) -> List[int]:
        """Per-stage output channels for the DCGAN G, stem first.

        At 128^3 reproduces reference dcgan.py:17-70:
        [ngf*16, ngf*8, ngf*4, ngf*2, ngf] then 1 output channel.
        """
        s = self.num_up_stages  # stem + (s-1) inner stages + final to 1ch
        return [self.filterG * (1 << (s - 1 - i)) for i in range(s)]

    def dcgan_d_channels(self) -> List[int]:
        """Per-stage output channels for the DCGAN D (mirror of G).

        At 128^3 reproduces reference dcgan.py:117-182:
        [ndf, ndf*2, ndf*4, ndf*8, ndf*16] then a 4^3 conv to 1.
        """
        s = self.num_up_stages
        return [self.filterD * (1 << i) for i in range(s)]

    def biggan_g_arch(self) -> Dict[str, Any]:
        """BigGAN-3D G architecture dict (reference: biggan.py:14-17).

        At 128^3: in mults [16,16,8,4,2], out [16,8,4,2,1], resolutions
        [8..128], attention at 32.
        """
        n = self.num_up_stages
        out = [min(16, 1 << (n - 1 - i)) for i in range(n)]
        inn = [out[0]] + out[:-1]
        res = [1 << (3 + i) for i in range(n)]
        return {
            "in_channels": [m * self.filterG for m in inn],
            "out_channels": [m * self.filterG for m in out],
            "resolution": res,
            "attention": {r: (r == 32) for r in res},
        }

    def biggan_d_arch(self) -> Dict[str, Any]:
        """BigGAN-3D D architecture dict (reference: biggan.py:70-75).

        At 128^3: in mults [1,2,4,8,16], out [2,4,8,16,16], resolutions
        [64,32,16,8,4], attention at 16.
        """
        n = self.num_up_stages
        inn = [min(16, 1 << i) for i in range(n)]
        out = [min(16, 1 << (i + 1)) for i in range(n)]
        res = [self.resolution >> (1 + i) for i in range(n)]
        return {
            "in_channels": [m * self.filterD for m in inn],
            "out_channels": [m * self.filterD for m in out],
            "downsample": [True] * n,
            "resolution": res,
            "attention": {r: (r == 16) for r in res},
        }

    # ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def save(self, log_dir: Optional[str] = None) -> str:
        path = os.path.join(log_dir or self.log_dir, PARAMS_FILENAME)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)
        return path

    @classmethod
    def load(cls, log_dir: str) -> "Config":
        """Load params from a run dir — JSON first, reference pickle fallback."""
        jpath = os.path.join(log_dir, PARAMS_FILENAME)
        if os.path.isfile(jpath):
            with open(jpath) as f:
                return cls.from_dict(json.load(f))
        ppath = os.path.join(log_dir, "params.pkl")
        if os.path.isfile(ppath):
            import pickle

            with open(ppath, "rb") as f:
                ns = pickle.load(f)
            return cls.from_dict(vars(ns))
        raise FileNotFoundError(f"no {PARAMS_FILENAME} or params.pkl in {log_dir}")

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_namespace(self):
        """argparse.Namespace of every field — the reference's params.pkl
        payload type (trainer.py:42-47), for torch-side export
        (eval/export.py)."""
        import argparse

        return argparse.Namespace(**self.to_dict())


def add_config_flags(parser) -> None:
    """Register every Config field on an argparse parser.

    Unlike the reference (main.py uses ``type=bool`` so any value parses as
    True — SURVEY §2.3), booleans here parse 'true/false/1/0' correctly, while
    still accepting the reference's ``--biggan=True`` spelling.
    """

    def parse_bool(v: str) -> bool:
        return str(v).strip().lower() in ("1", "true", "yes", "y", "t")

    def parse_opt_bool(v: str) -> Optional[bool]:
        if str(v).strip().lower() in ("none", "auto", ""):
            return None
        return parse_bool(v)

    for f in dataclasses.fields(Config):
        arg = f"--{f.name}"
        if "Optional[bool]" in str(f.type):
            parser.add_argument(arg, type=parse_opt_bool, default=f.default,
                                nargs="?", const=True)
        elif f.type in ("bool", bool):
            parser.add_argument(arg, type=parse_bool, default=f.default, nargs="?",
                                const=True)
        else:
            ty = {"int": int, "float": float, "str": str}.get(str(f.type), str)
            parser.add_argument(arg, type=ty, default=f.default)


def config_from_args(argv=None) -> Config:
    import argparse

    parser = argparse.ArgumentParser(description="gan3d_tpu")
    add_config_flags(parser)
    args = parser.parse_args(argv)
    return Config.from_dict(vars(args))
