"""Headline benchmark: BigGAN-Deep-3D training throughput at 64^3.

Measures the full train iteration (iterD=2 D-updates + 1 G-update, hinge
loss, spectral norm + 3D self-attention — BASELINE.json config 3) on the
available accelerator and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "volumes/sec/chip", "vs_baseline": N}

volumes/sec counts generated volumes per second: batch_size * full_steps/sec.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
denominator comes from BASELINE_MEASURED.json — the torch reference measured
on this host with the A100 number derived by GEMM-ratio roofline transfer
(scripts/measure_reference_baseline.py documents the method). Falls back to
the analytic estimate below if the measured file is absent.

--family=stylegan2 benches BASELINE.json config 4 (mapping net + modulated
conv + lazy regularization, amortized at its true 1/16 cadence).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Fallback A100 estimate if BASELINE_MEASURED.json is absent: comparable
# published 3D-GAN training runs at 64^3 sustain ~2-4 iter/s at batch 16 on
# A100-class parts -> ~32-64 vol/s; we take the optimistic end.
A100_BASELINE_VPS = 64.0


def _init_backend_or_die(timeout_s: float = 600.0) -> None:
    """Fail fast if the TPU backend can't initialize (tunnel outage).

    `jax.devices()` blocks indefinitely when the axon relay is down
    (observed: a 2.5h+ hang); a hung bench would silently eat the driver's
    whole budget. Probe init on a daemon thread and abort loudly instead.
    """
    import threading

    ok = threading.Event()

    def probe() -> None:
        import jax

        jax.devices()
        ok.set()

    threading.Thread(target=probe, daemon=True).start()
    if not ok.wait(timeout_s):
        print(f"# FATAL: backend init did not complete in {timeout_s:.0f}s "
              "(TPU tunnel down?)", file=sys.stderr, flush=True)
        os._exit(3)


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache — first bench compile is minutes; the
    driver's end-of-round run then hits the warm cache."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


FAM_LOSS_NOTE = {
    # family-specific loss/arch annotation recorded with each scoreboard row
    # so a --record re-run reproduces the full config string (ADVICE r4).
    "biggan": "hinge",
    "dcgan": "WGAN",
    "hybrid": "WGAN (BigGAN G + DCGAN D)",
    "stylegan2": "softplus, lazy reg amortized 1/16",
    "stylegan": "softplus, lazy reg amortized 1/16",
}


def _echo_scoreboard(fam_file: str, skip: str | None, note: str = "") -> None:
    """Emit the recorded per-family scoreboard as '#' stderr lines."""
    if not os.path.isfile(fam_file):
        return
    with open(fam_file) as f:
        fams = json.load(f)
    for k, v in fams.items():
        if k == "_marathon":
            # the round-5 long-horizon training-run record (docs/ROUND5.md)
            print(f"# marathon: {v}", file=sys.stderr, flush=True)
            continue
        if k.startswith("_") or k == skip:
            continue
        b = v.get("vs_baseline_band")
        print(f"# family {k}: {v['value']} vol/s, vs_baseline "
              f"{v['vs_baseline']}"
              + (f" [{b[0]}, {b[1]}]" if b else "")
              + f" ({v.get('measured', '?')}){note}",
              file=sys.stderr, flush=True)


class _ZeroDataset:
    """Stub dataset for Trainer construction; the bench drives the jitted
    step directly with synthetic device-resident batches."""

    def __init__(self, n: int, res: int):
        self.n, self.res = n, res

    def __len__(self) -> int:
        return self.n

    def batch(self, idx):
        import numpy as np

        return np.zeros((len(idx), self.res, self.res, self.res), np.float32)


def measure(batch_size: int, iters: int, warmup: int, resolution: int = 64,
            filters: int = 64, remat: bool = False, channel_ratio: int = 4,
            family: str = "biggan", fused: bool = True,
            fast_conv: str = "auto", remat_scope: str = "block",
            xla_vmem: int = -1, fast_dw: str = "auto",
            wide_conv: str = "auto", downconv_vjp: str = "auto",
            fast_stem: str = "auto", fast_head: str = "auto",
            fast_fir: str = "auto", fast_c1: str = "auto",
            fast_pix: str = "auto", fast_tri: str = "auto",
            fast_adain: str = "auto", conv_dx: str = "auto") -> float:
    import tempfile

    import jax
    import numpy as np

    from gan3d_tpu.config import Config
    from gan3d_tpu.train.trainer import Trainer

    fam_kw = {
        "biggan": {"biggan": True, "hinge": True},
        "stylegan2": {"stylegan2": True},
        "stylegan": {"stylegan": True},
        "dcgan": {"dcgan": True},  # reference default variant: WGAN loss,
                                   # LayerNorm D (dcgan.py:158-182)
        "hybrid": {"hybrid": True},  # BigGAN G + DCGAN D, WGAN loss
                                     # (reference trainer.py:52-54)
    }[family]
    cfg = Config(resolution=resolution, filterG=filters, filterD=filters,
                 z_size=512, batch_size=batch_size, iterD=2, remat=remat,
                 remat_scope=remat_scope,
                 channel_ratio=channel_ratio, fused_step=fused,
                 fast_conv=fast_conv, fast_dw=fast_dw, wide_conv=wide_conv,
                 downconv_vjp=downconv_vjp, fast_stem=fast_stem,
                 fast_head=fast_head, fast_fir=fast_fir, fast_c1=fast_c1,
                 fast_pix=fast_pix, fast_tri=fast_tri,
                 fast_adain=fast_adain, conv_dx=conv_dx,
                 fid_in_loop=False,
                 xla_vmem_limit_kib=xla_vmem,
                 log_dir=tempfile.mkdtemp(prefix="bench_"),
                 data_loader_workers=1, **fam_kw)
    t = time.perf_counter()
    tr = Trainer(_ZeroDataset(4 * batch_size, resolution), cfg)
    print(f"# trainer init {time.perf_counter() - t:.1f}s",
          file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    reals = jax.device_put(
        rng.normal(size=(cfg.iterD, batch_size, resolution, resolution,
                         resolution, 1)).astype(np.float32).clip(-1, 1),
        tr._batch_in)

    def sync(m):
        # device_get forces a real device->host readback; on the experimental
        # axon tunnel block_until_ready alone returns before execution
        # finishes, inflating throughput ~10x.
        return float(jax.device_get(m["g_loss"]))

    state = tr.state
    t = time.perf_counter()
    cache_dir = jax.config.jax_compilation_cache_dir
    n_cache0 = (len(os.listdir(cache_dir))
                if cache_dir and os.path.isdir(cache_dir) else 0)
    # warmup from i=0 so stylegan2 compiles BOTH lazy-reg programs (i%16==0
    # fires the reg step).
    for i in range(warmup):
        state, metrics, _ = tr._step(state, reals, tr._base_key, i)
    sync(metrics)
    compile_s = time.perf_counter() - t
    n_cache1 = (len(os.listdir(cache_dir))
                if cache_dir and os.path.isdir(cache_dir) else 0)
    new = n_cache1 - n_cache0
    if cache_dir is None:
        cache_msg = "disabled (--no_cache)"
    elif new:
        cache_msg = ("MISS (%d new entr%s written)"
                     % (new, "y" if new == 1 else "ies"))
    else:
        cache_msg = "HIT (no new entries)"
    print(f"# compile+warmup {compile_s:.1f}s; persistent cache {cache_msg}",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for i in range(warmup, warmup + iters):
        state, metrics, _ = tr._step(state, reals, tr._base_key, i)
    sync(metrics)
    dt = time.perf_counter() - t0
    tr.loader.close()
    return batch_size * iters / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer iters")
    p.add_argument("--batch", type=int, default=0, help="0 = auto")
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--filters", type=int, default=64)
    p.add_argument("--family", default="biggan",
                   choices=["biggan", "stylegan2", "stylegan", "dcgan", "hybrid"])
    p.add_argument("--fused_step", default="True")
    p.add_argument("--fast_conv", default="auto",
                   choices=["auto", "on", "off"],
                   help="lane-packed narrow-conv rewrite (ops/lane_conv.py)")
    p.add_argument("--remat", default="auto",
                   help="True/False force remat; auto = per-batch ladder")
    p.add_argument("--remat_scope", default="block",
                   choices=["block", "stage"],
                   help="remat granularity (config.remat_scope)")
    p.add_argument("--xla_vmem", type=int, default=-1,
                   help="xla_tpu_scoped_vmem_limit_kib for the step "
                        "programs (<=0 compiler default; >0 opts in — "
                        "see docs/PERF.md)")
    p.add_argument("--fast_dw", default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas wide-N weight-gradient kernel for the k=3 "
                        "convs (ops/dw_conv.py)")
    p.add_argument("--downconv_vjp", default="auto",
                   choices=["custom", "autodiff", "auto"],
                   help="fused-downconv backward form (ops/downsample_conv)")
    p.add_argument("--fast_stem", default="auto",
                   help="space-to-depth stem conv (ops/s2d_conv.py)")
    p.add_argument("--fast_head", default="auto",
                   help="tap-map Co=1 head conv (ops/tap_conv.py)")
    p.add_argument("--fast_fir", default="auto",
                   help="separable matmul upfirdn3d (stylegan resample)")
    p.add_argument("--fast_c1", default="auto",
                   choices=["auto", "on", "off"],
                   help="banded-matmul tiny-channel k=3 convs "
                        "(ops/c1_conv.py)")
    p.add_argument("--fast_tri", default="auto",
                   choices=["auto", "on", "off"],
                   help="trilinear upsample as banded spatial matmuls "
                        "(ops/conv3d.py, StyleGAN-1 G)")
    p.add_argument("--fast_adain", default="auto",
                   choices=["auto", "on", "off"],
                   help="one-pass-moments AdaIN lowering (StyleGAN-1, "
                        "models/stylegan/stylegan1.py)")
    p.add_argument("--conv_dx", default="auto",
                   choices=["auto", "on", "off"],
                   help="explicit-conv first-order backward for the "
                        "StyleGAN-1 G stride-1 k=3 convs (ops/dx_conv.py)")
    p.add_argument("--c1_act", default="auto",
                   choices=["auto", "on", "off"],
                   help="bias+activation of C=1 tensors on the squeezed "
                        "4-D view (stylegan fromrgb — "
                        "models/stylegan/layers.py)")
    p.add_argument("--c1_wfirst", default="auto",
                   choices=["auto", "on", "off"],
                   help="W-band-first einsum order for the sg2 up-conv "
                        "band lowering (ops/c1_conv.py)")
    p.add_argument("--fast_pix_wide", default="auto",
                   choices=["auto", "on", "off"],
                   help="extend the sub-pixel rewrite to the interior "
                        "k=4 s=2 convs (any Ci/Co)")
    p.add_argument("--fast_pix", default="auto",
                   choices=["auto", "on", "off"],
                   help="sub-pixel k=4 s=2 boundary convs "
                        "(ops/subpixel_conv.py)")
    p.add_argument("--wide_conv", default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas transposed-layout conv (ops/wide_conv.py)")
    p.add_argument("--record", action="store_true",
                   help="write this result into FAMILY_RESULTS.json (the "
                        "per-family scoreboard bench.py echoes as # lines)")
    p.add_argument("--no_cache", action="store_true",
                   help="skip the persistent compile cache: on the axon "
                        "tunnel a cache HIT re-UPLOADS the ~77 MB serialized "
                        "executable (measured 350-660 s) while a server-side "
                        "recompile is ~260 s — A/B knob for that tradeoff")
    p.add_argument("--channel_ratio", type=int, default=4,
                   help="bottleneck shrink (4 = reference; smaller = wider "
                        "hidden convs, better MXU utilization)")
    a = p.parse_args()
    fam_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "FAMILY_RESULTS.json")
    # Timeout-proofing (VERDICT r4 #3): the trainer init + compile take
    # minutes (the ~77 MB executable transfer over the tunnel); a driver
    # timeout mid-compile used to leave an artifact with zero scoreboard
    # content. Emit ALL recorded family rows AND the previous record for
    # this bench's own family BEFORE touching the backend, so killing the
    # process at any point after ~1 s still leaves a complete scoreboard
    # in the output tail. The fresh JSON printed after measurement remains
    # the LAST stdout line (which the driver parses).
    _echo_scoreboard(fam_file, skip=None, note=" [previous record]")
    if os.path.isfile(fam_file):
        with open(fam_file) as f:
            _prev = json.load(f).get(a.family)
        if _prev:
            print("# previous_record " + json.dumps(
                {"metric": f"{a.family} 64^3 train throughput "
                           f"({_prev.get('config', '?')}) [previous record]",
                 "value": _prev["value"], "unit": _prev["unit"],
                 "vs_baseline": _prev["vs_baseline"],
                 "vs_baseline_band": _prev.get("vs_baseline_band")}),
                file=sys.stderr, flush=True)
    from gan3d_tpu.ops.subpixel_conv import set_fast_pix_wide_mode
    set_fast_pix_wide_mode(a.fast_pix_wide)
    from gan3d_tpu.ops.c1_conv import set_c1_wfirst_mode
    set_c1_wfirst_mode(a.c1_wfirst)
    from gan3d_tpu.models.stylegan.layers import set_c1act_mode
    set_c1act_mode(a.c1_act)
    _init_backend_or_die()
    if not a.no_cache:
        _enable_compile_cache()
    fused = str(a.fused_step).lower() in ("1", "true", "yes")
    if a.family in ("stylegan2", "stylegan"):
        # lazy regularization fires every 16 steps; amortize exactly.
        iters = 16 if a.quick else 32
        warmup = 2
    else:
        iters = 5 if a.quick else 20
        warmup = 2 if a.quick else 3

    if a.batch:
        if str(a.remat).lower() in ("1", "true", "yes"):
            candidates = [(a.batch, True)]
        elif str(a.remat).lower() in ("0", "false", "no"):
            candidates = [(a.batch, False)]
        else:
            candidates = [(a.batch, False), (a.batch, True)]
    else:
        # Family-informed auto ladder (measured A/Bs, docs/PERF.md rounds
        # 4-5): the ladder takes the first success, so lead with each
        # family's measured sweet spot — biggan 16 (b32 = 0.89x NO-GO, r4),
        # hybrid 32 (78.5 vs 76.3, r5), dcgan 256 (640.8 vs 609 b128 vs
        # 487 b64, replicated, r5), sg2 256 (1113.6, replicated; b512
        # REGRESSES to 1042 — the peak, r5), sg1 32 (= b16, r5).
        # volumes/sec is batch-independent in the denominator; the metric
        # string discloses the batch used.
        first = {"biggan": 16, "hybrid": 32, "dcgan": 256,
                 "stylegan2": 256, "stylegan": 32}[a.family]
        candidates = [(first, False), (32, False), (16, False), (16, True),
                      (8, False), (4, False)]
        candidates = list(dict.fromkeys(candidates))
    vps, used = None, None
    for b, remat in candidates:
        try:
            vps = measure(b, iters, warmup, a.resolution, a.filters, remat,
                          a.channel_ratio, a.family, fused, a.fast_conv,
                          a.remat_scope, a.xla_vmem, a.fast_dw, a.wide_conv,
                          a.downconv_vjp, a.fast_stem, a.fast_head,
                          a.fast_fir, a.fast_c1, a.fast_pix, a.fast_tri,
                          a.fast_adain, a.conv_dx)
            used = f"{b}{'+remat' if remat else ''}"
            break
        except Exception as e:  # noqa: BLE001 — OOM fallback
            msg = str(e).split("\n")[0][:200]
            print(f"# batch {b} remat={remat} failed ({type(e).__name__}: "
                  f"{msg}); retrying", file=sys.stderr, flush=True)
    if vps is None:
        raise SystemExit("benchmark failed at all batch sizes")

    baseline = A100_BASELINE_VPS if a.family == "biggan" else None
    band = None
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.isfile(measured):
        with open(measured) as f:
            _data = json.load(f)
        if a.family == "biggan":
            baseline = float(_data["volumes_per_sec"])
            band = _data.get("band")
        elif a.family in _data:
            baseline = float(_data[a.family]["volumes_per_sec"])
            band = _data[a.family].get("band")
    name = {"stylegan2": "StyleGAN2-3D", "stylegan": "StyleGAN1-3D",
            "dcgan": "DCGAN-3D", "biggan": "BigGAN-Deep-3D",
            "hybrid": "Hybrid-3D (BigGAN G + DCGAN D)"}[a.family]
    out = {
        "metric": f"{name} {a.resolution}^3 train throughput "
                  f"(batch {used}, iterD=2{', hinge' if a.family == 'biggan' else ''})",
        "value": round(vps, 3),
        "unit": "volumes/sec/chip",
    }
    # measured baselines exist per family in BASELINE_MEASURED.json (derived
    # by scripts/measure_reference_baseline.py); other resolutions have no
    # reference measurement to divide by. The denominator is a derived-A100
    # estimate with transfer-method bounds, so alongside the point ratio we
    # emit vs_baseline_band = [value/band_hi, value/band_lo] (VERDICT r2 #6).
    at64 = a.resolution == 64 and baseline is not None
    out["vs_baseline"] = round(vps / baseline, 3) if at64 else None
    if at64 and band:
        out["vs_baseline_band"] = [round(vps / float(band[1]), 3),
                                   round(vps / float(band[0]), 3)]
    # record any full 64^3 run; vs_baseline stays null for families with no
    # measured reference denominator (e.g. hybrid).
    if a.record and a.resolution == 64 and not a.quick:
        fams = {}
        if os.path.isfile(fam_file):
            with open(fam_file) as f:
                fams = json.load(f)
        fams[a.family] = {
            "value": out["value"], "unit": out["unit"],
            "vs_baseline": out["vs_baseline"],
            "vs_baseline_band": out.get("vs_baseline_band"),
            "config": f"batch {used}, iterD=2, {FAM_LOSS_NOTE[a.family]}",
            "measured": time.strftime("%Y-%m-%d") + " (builder-run)",
        }
        with open(fam_file, "w") as f:
            json.dump(fams, f, indent=2)
    # Echo the other families' most recent measured numbers so the driver's
    # single-family artifact tail carries the whole scoreboard (VERDICT r3
    # next #2). '#' lines go to stderr; the JSON line below stays the only
    # stdout line.
    _echo_scoreboard(fam_file, skip=a.family)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
