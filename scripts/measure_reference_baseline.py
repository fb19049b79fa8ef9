"""Measure the torch reference's training throughput -> BASELINE_MEASURED.json.

VERDICT r1 #1: bench.py's vs_baseline divided a measurement by an invented
constant. This script replaces the constant with a *measured* baseline:

1. It runs the PyTorch reference's training iteration (iterD D-steps + 1
   G-step, hinge loss — reference trainer.py:208-283, 296-303) using the
   reference's OWN unmodified modules imported from /root/reference
   (utils.GBlockDeep/DBlockDeep/Attention/snconv3d/snlinear), on the only
   hardware available here (host CPU; torch is CPU-only in this image),
   at the flagship bench config: BigGAN-Deep-3D 64^3, batch 16, filters 64.
   The reference hardcodes 128^3 (biggan.py:14-17), so the 64^3 model is
   assembled from the reference's own blocks with the 4-stage channel
   pattern our framework derives at 64^3 (config.biggan_g_arch) — identical
   topology to what bench.py measures on TPU.

2. It measures the host's sustained fp32 GEMM rate (torch.mm / oneDNN) and
   the reference's five hottest conv shapes individually, giving a
   measured per-op efficiency profile.

3. It derives an A100 estimate by roofline transfer, documented in the
   output: t_A100 ~= t_cpu * (cpu_gemm_flops / a100_gemm_flops). The
   transfer assumes the op mix sustains the same fraction of GEMM-peak on
   both parts. For the reference's narrow-channel 3D convs this is
   GENEROUS to the A100 (tensor cores lose relatively more of their peak
   at 16-64 channels than AVX-512 does), so vs_baseline computed against
   it is conservative for us. A sanity band [low, high] is reported using
   TF32 (low) and fp16 (high) published sustained-GEMM figures.

Usage:
  python scripts/measure_reference_baseline.py --iters 2 --warmup 1 --write

Batch-size note: the flagship config is batch 16, but on this 1-core host
the reference's eager attention materializes an 8.6 GB score tensor at
batch 16 and the run degenerates into allocator churn (>90% system time),
which would make the reference look slower than compute alone — a bias in
OUR favor. Volumes/sec on a serial host is batch-independent (compute
scales linearly), so the default measurement batch is 4 (2.1 GB attention
tensor); the GEMM-fraction transfer is unchanged.

Writes BASELINE_MEASURED.json at the repo root when --write is passed;
bench.py then uses its "volumes_per_sec" as the vs_baseline denominator.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REFERENCE = "/root/reference"
sys.path.insert(0, REFERENCE)

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

# the reference's own building blocks (imported, NOT copied)
from utils import Attention, DBlockDeep, GBlockDeep, snconv3d, snlinear  # noqa: E402

# Published sustained dense-GEMM figures for A100-SXM (cuBLAS, large square
# GEMMs): ~250 TFLOP/s fp16 tensor-core (~80% of the 312 peak), ~100 TFLOP/s
# TF32. The reference trains under torch.cuda.amp -> fp16 compute.
A100_GEMM_FP16 = 250e12
A100_GEMM_TF32 = 100e12


class RefG64(nn.Module):
    """The reference BigGAN-deep G (biggan.py:8-63) at 64^3: same doubled
    GBlockDeep pattern, attention at 32^3, orthogonal init — with the
    4-stage channel pattern [8,8,4,2]->[8,4,2,1] (x filterG)."""

    def __init__(self, filters=64, z=512):
        super().__init__()
        self.dim_z = z
        inn = [m * filters for m in (8, 8, 4, 2)]
        out = [m * filters for m in (8, 4, 2, 1)]
        res = [8, 16, 32, 64]
        self.linear = snlinear(z, inn[0] * 4 ** 3)
        blocks = []
        for i in range(4):
            for g_index in range(2):  # biggan doubled blocks
                blocks.append([GBlockDeep(
                    in_channels=inn[i],
                    out_channels=inn[i] if g_index == 0 else out[i],
                    upsample=(functools.partial(F.interpolate, scale_factor=2)
                              if g_index == 1 else None))])
            if res[i] == 32:
                blocks[-1].append(Attention(out[i]))
        self.blocks = nn.ModuleList(nn.ModuleList(b) for b in blocks)
        self.output_layer = nn.Sequential(
            nn.BatchNorm3d(out[-1]), nn.ReLU(inplace=True),
            snconv3d(out[-1], 1))
        for m in self.modules():
            if isinstance(m, (nn.Conv3d, nn.Linear)):
                nn.init.orthogonal_(m.weight)

    def forward(self, z):
        h = self.linear(z.squeeze())
        h = h.view(h.size(0), -1, 4, 4, 4)
        for blocklist in self.blocks:
            for block in blocklist:
                h = block(h)
        return torch.tanh(self.output_layer(h))


class RefD64(nn.Module):
    """The reference BigGAN-deep D (biggan.py:65-119) at 64^3: doubled
    DBlockDeep, attention at 16^3, global sum pool, channel pattern
    [1,2,4,8]->[2,4,8,16] (x filterD)."""

    def __init__(self, filters=64):
        super().__init__()
        inn = [m * filters for m in (1, 2, 4, 8)]
        out = [m * filters for m in (2, 4, 8, 16)]
        res = [32, 16, 8, 4]
        self.input_conv = snconv3d(1, inn[0])
        blocks = []
        for i in range(4):
            blocks.append([DBlockDeep(
                in_channels=inn[i] if d == 0 else out[i],
                out_channels=out[i], preactivation=True,
                downsample=(nn.AvgPool3d(2) if d == 0 else None))
                for d in range(2)])
            if res[i] == 16:
                blocks[-1].append(Attention(out[i]))
        self.blocks = nn.ModuleList(nn.ModuleList(b) for b in blocks)
        self.linear = snlinear(out[-1], 1)
        for m in self.modules():
            if isinstance(m, (nn.Conv3d, nn.Linear)):
                nn.init.orthogonal_(m.weight)

    def forward(self, x):
        h = self.input_conv(x)
        for blocklist in self.blocks:
            for block in blocklist:
                h = block(h)
        h = torch.sum(F.relu(h), [2, 3, 4])
        return self.linear(h)


class RefDCGAN_G64(nn.Module):
    """The reference DCGAN G (dcgan.py:44-70) at 64^3: the same
    [ConvTranspose3d(4, s2, p1), BN, ReLU] ladder with one fewer stage —
    channels [8,4,2,1]*ngf (the pattern config.dcgan_g_channels derives),
    normal(0, 0.02) init (dcgan.py:76-82)."""

    def __init__(self, filters=64, z=512):
        super().__init__()
        self.dim_z = z
        chans = [filters * m for m in (8, 4, 2, 1)]
        layers = [nn.ConvTranspose3d(z, chans[0], 4, stride=1),
                  nn.BatchNorm3d(chans[0]), nn.ReLU(True)]
        for cin, cout in zip(chans[:-1], chans[1:]):
            layers += [nn.ConvTranspose3d(cin, cout, 4, stride=2, padding=1),
                       nn.BatchNorm3d(cout), nn.ReLU(True)]
        layers += [nn.ConvTranspose3d(chans[-1], 1, 4, stride=2, padding=1),
                   nn.Tanh()]
        self.main = nn.Sequential(*layers)
        for m in self.modules():
            if isinstance(m, (nn.ConvTranspose3d,)):
                nn.init.normal_(m.weight.data, 0.0, 0.02)
            elif isinstance(m, nn.BatchNorm3d):
                nn.init.normal_(m.weight.data, 1.0, 0.02)
                nn.init.constant_(m.bias.data, 0)

    def forward(self, z):
        return self.main(z)


class RefDCGAN_D64(nn.Module):
    """The reference WGAN-default DCGAN D (dcgan.py:158-182) at 64^3:
    [Conv3d(4, s2, p1, bias=False), LayerNorm, LeakyReLU(0.2)] ladder with
    one fewer stage — channels [1,2,4,8]*ndf — and the final 4^3 conv."""

    def __init__(self, filters=64):
        super().__init__()
        chans = [filters * m for m in (1, 2, 4, 8)]
        layers = []
        cin, res = 1, 64
        for c in chans:
            res //= 2
            layers += [nn.Conv3d(cin, c, 4, stride=2, padding=1, bias=False),
                       nn.LayerNorm([c, res, res, res]),
                       nn.LeakyReLU(0.2, inplace=True)]
            cin = c
        layers += [nn.Conv3d(cin, 1, (4, 4, 4), stride=1, padding=0,
                             bias=False)]
        self.main = nn.Sequential(*layers)
        for m in self.modules():
            if isinstance(m, nn.Conv3d):
                nn.init.normal_(m.weight.data, 0.0, 0.02)

    def forward(self, x):
        return self.main(x)


def count_forward_flops(model, x):
    """Conv/linear/bmm forward FLOPs via hooks (2*MACs)."""
    flops = [0]

    def conv_hook(mod, inp, out):
        k = np.prod(mod.kernel_size)
        flops[0] += 2 * out.numel() * mod.in_channels * k

    def tconv_hook(mod, inp, out):
        # transposed conv: each INPUT element scatters into k^3 x Cout
        k = np.prod(mod.kernel_size)
        flops[0] += 2 * inp[0].numel() * mod.out_channels * k

    def lin_hook(mod, inp, out):
        flops[0] += 2 * out.numel() * mod.in_features

    handles = []
    for m in model.modules():
        if isinstance(m, nn.ConvTranspose3d):
            handles.append(m.register_forward_hook(tconv_hook))
        elif isinstance(m, nn.Conv3d):
            handles.append(m.register_forward_hook(conv_hook))
        elif isinstance(m, nn.Linear):
            handles.append(m.register_forward_hook(lin_hook))
    with torch.no_grad():
        model(x)
    for h in handles:
        h.remove()
    return flops[0]


def measure_step(G, D, batch, z_size, res, iters, warmup, iterD=2,
                 loss="hinge"):
    """The reference's exact iteration (trainer.py:208-283): iterD D-steps
    + 1 G-step, Adam(0,0.9), requires_grad toggling, GradScaler (no-op on
    CPU, like autocast — AMP is CUDA-only; fp32 eager). ``loss`` picks the
    D objective branch: "hinge" (trainer.py:222-235) or the WGAN default
    (trainer.py:237-248, gradient penalty commented out in the
    reference)."""
    optG = torch.optim.Adam(G.parameters(), lr=5e-5, betas=(0.0, 0.9))
    optD = torch.optim.Adam(D.parameters(), lr=1e-4, betas=(0.0, 0.9))
    real = torch.randn(batch, 1, res, res, res).clamp_(-1, 1)

    def d_step():
        for p in D.parameters():
            p.requires_grad = True
        D.zero_grad()
        noise = torch.randn(batch, z_size, 1, 1, 1)
        fake = G(noise)
        if loss == "hinge":
            errD = (F.relu(1.0 - D(real))).mean() + \
                (F.relu(1.0 + D(fake))).mean()
        else:  # WGAN
            errD = D(fake).mean() - D(real).mean()
        errD.backward()
        optD.step()
        for p in D.parameters():
            p.requires_grad = False

    def g_step():
        for p in G.parameters():
            p.requires_grad = True
        G.zero_grad()
        noise = torch.randn(batch, z_size, 1, 1, 1)
        errG = -D(G(noise)).mean()
        errG.backward()
        optG.step()
        for p in G.parameters():
            p.requires_grad = False

    for p in list(G.parameters()) + list(D.parameters()):
        p.requires_grad = False

    for k in range(warmup):
        t = time.perf_counter()
        for _ in range(iterD):
            d_step()
        g_step()
        print(f"# warmup iter {k}: {time.perf_counter() - t:.0f}s",
              flush=True)
    t0 = time.perf_counter()
    for k in range(iters):
        t = time.perf_counter()
        for _ in range(iterD):
            d_step()
        g_step()
        print(f"# iter {k}: {time.perf_counter() - t:.0f}s", flush=True)
    dt = (time.perf_counter() - t0) / iters
    return dt


def measure_step_sg2(batch, z_size, filters, res, iters, warmup, iterD=2):
    """The reference's exact StyleGAN2 iteration (trainer.py:208-283 with
    p.stylegan2: iterD x loss.step_D + loss.step_G, Adam(0,0.9), the
    weight_avg state-dict Polyak pass after every G step — trainer.py:199-206).

    The reference's OWN unmodified modules (stylegan.py Generator/
    Discriminator/StyleGAN2Loss) are imported and driven, fp32 eager (the
    trainer's autocast/GradScaler are CUDA-only no-ops on CPU). Lazy reg
    (R1 at step%16==0 in step_D, PL in step_G) is measured on its own and
    amortized at the true 1/16 cadence, matching bench.py's 32-iter
    amortization on TPU.

    Returns (amortized_dt, plain_dt, reg_dt).
    """
    from stylegan import (Discriminator as StyleD, Generator as StyleG,
                          StyleGAN2Loss)

    class P:
        pass

    p = P()
    p.z_size = z_size
    p.filterG = filters
    p.filterD = filters
    p.stylegan2 = True
    p.stylegan = False
    p.device = "cpu"
    G = StyleG(p, img_resolution=res)
    D = StyleD(p, img_resolution=res)
    loss = StyleGAN2Loss(p, G.mapping, G.synthesis, D)
    optG = torch.optim.Adam(G.parameters(), lr=5e-5, betas=(0.0, 0.9))
    optD = torch.optim.Adam(D.parameters(), lr=1e-4, betas=(0.0, 0.9))
    real = torch.randn(batch, 1, res, res, res).clamp_(-1, 1)
    ema_state = {k: v.clone() for k, v in G.state_dict().items()}

    def weight_avg():  # trainer.py:199-206
        state = G.state_dict()
        for key in state:
            state[key] = (state[key] + ema_state[key]) / 2.0
        G.load_state_dict(state)
        ema_state.clear()
        ema_state.update(state)

    def iteration(step):
        for _ in range(iterD):
            for q in D.parameters():
                q.requires_grad = True
            D.zero_grad()
            noise = torch.randn(batch, z_size, 1, 1, 1)
            loss.step_D(step, real, noise)
            optD.step()
            for q in D.parameters():
                q.requires_grad = False
        for q in G.parameters():
            q.requires_grad = True
        G.zero_grad()
        noise = torch.randn(batch, z_size, 1, 1, 1)
        loss.step_G(step, noise)
        optG.step()
        for q in G.parameters():
            q.requires_grad = False
        weight_avg()

    def timed(step0, n, tag):
        t0 = time.perf_counter()
        for k in range(n):
            t = time.perf_counter()
            iteration(step0 + k if tag == "plain" else step0)
            print(f"# {tag} iter {k}: {time.perf_counter() - t:.0f}s",
                  flush=True)
        return (time.perf_counter() - t0) / n

    for k in range(warmup):
        t = time.perf_counter()
        iteration(1 + k)
        print(f"# warmup iter {k}: {time.perf_counter() - t:.0f}s",
              flush=True)
    plain_dt = timed(17, iters, "plain")      # never hits step%16==0
    reg_dt = timed(16, max(1, iters // 2), "reg")  # R1 (x iterD) + PL
    dt = (15 * plain_dt + reg_dt) / 16.0
    return dt, plain_dt, reg_dt


class RefSG1G64(nn.Module):
    """The reference StyleGAN-1 generator (stylegan.py:969-1148) at 64^3:
    the same 8-Linear latent mapping, ones-const 4^3x512 input, AdaIN
    (imported, stylegan.py:942-959) + trilinear-up + conv ladder, with the
    128^3-hardcoded channel schedule truncated by one stage for 64^3 —
    512@4^3 -> 256,256@8^3 -> 128,128@16^3 -> 64,64@32^3 -> 32@64^3 -> 1,
    exactly the truncation rule gan3d_tpu's StyleGAN1Generator applies
    (models/stylegan/stylegan1.py:_stage_channels). Style mixing keeps the
    reference's 5 in-ladder conditionalSplit sites with swapPoint in [0,5)
    (every draw reachable; the 128^3 reference draws [0,6) over 6 sites).

    As shipped the reference CRASHES in StyleGAN2Loss.run_G unpacking
    `img, ws = self.G_mapping(z)` (styleGAN_gen returns one tensor,
    stylegan.py:32/1148); forward here returns (img, w) — the minimal
    enabling change, matching gan3d_tpu's interpretation. ws is unused by
    the sg1 loss path (no PL, no loss-side mixing), so this affects
    nothing timed."""

    def __init__(self, z=512):
        super().__init__()
        from stylegan import AdaIN, conditionalSplit  # reference's own
        self._adain = AdaIN
        self._split = conditionalSplit
        self.nz = z
        self.latentMapping = nn.Sequential(*[
            m for _ in range(8)
            for m in (nn.Linear(z, z), nn.LeakyReLU(0.2, inplace=True))])
        chans = [512, 256, 128, 64, 32]  # _stage_channels(64)

        def conv(cin, cout):
            return nn.Sequential(
                nn.Conv3d(cin, cout, 3, 1, 1, bias=False),
                nn.LeakyReLU(0.2, inplace=True))

        convs, affines = [conv(512, chans[0])], [nn.Linear(z, 2 * 512)]
        for i in range(1, len(chans) - 1):
            convs += [conv(chans[i - 1], chans[i]), conv(chans[i], chans[i])]
            affines += [nn.Linear(z, 2 * chans[i - 1]),
                        nn.Linear(z, 2 * chans[i])]
        convs.append(conv(chans[-2], chans[-1]))
        affines += [nn.Linear(z, 2 * chans[-2]), nn.Linear(z, 2 * chans[-1])]
        self.convs = nn.ModuleList(convs)
        self.affines = nn.ModuleList(affines)
        self.out = nn.Sequential(nn.Conv3d(chans[-1], 1, 3, 1, 1, bias=False),
                                 nn.Tanh())
        self._chans = chans

    def forward(self, z_in, w_passed=False):
        b = z_in.shape[0]
        if self.training:
            # the 64^3 truncation keeps 5 conditionalSplit sites (ctr 0-4),
            # so draw swapPoint from [0,5) to keep every draw reachable —
            # randint(6) would make ~1/6 of iterations mix nothing, which
            # the un-truncated 128^3 reference never does (ADVICE r3)
            swap = torch.randint(5, (1, 1, 1)).detach().item()
        ctr = 0

        def mix(w):
            nonlocal ctr
            if self.training:
                w = self._split(w, swap, ctr, False)
            ctr += 1
            return w

        w = torch.squeeze(z_in) if w_passed else \
            self.latentMapping(torch.squeeze(z_in))
        h = torch.ones((b, self.nz, 4, 4, 4), dtype=z_in.dtype,
                       device=z_in.device)
        ci, ai = 0, 0

        def ada(h):
            nonlocal ai
            y = self._adain(h, self.affines[ai](w))
            ai += 1
            return y

        h = ada(h)
        h = self.convs[ci](h); ci += 1  # C1
        w = mix(w)
        for _ in range(1, len(self._chans) - 1):
            h = ada(h)
            h = F.interpolate(h, scale_factor=2, mode='trilinear')
            h = self.convs[ci](h); ci += 1   # halve
            h = ada(h)
            h = self.convs[ci](h); ci += 1   # same
            w = mix(w)
        h = ada(h)
        h = F.interpolate(h, scale_factor=2, mode='trilinear')
        h = self.convs[ci](h); ci += 1       # final halve (C8 at 64^3)
        w = mix(w)
        h = ada(h)
        return self.out(h), w


def _sg1_setup(batch, z_size, filters, res):
    from stylegan import Discriminator as StyleD, StyleGAN2Loss

    class P:
        pass

    p = P()
    p.z_size = z_size
    p.filterG = filters
    p.filterD = filters
    p.stylegan2 = False
    p.stylegan = True
    p.device = "cpu"
    G = RefSG1G64(z_size)
    D = StyleD(p, img_resolution=res)
    loss = StyleGAN2Loss(p, G, None, D)  # trainer.py:62-65
    optG = torch.optim.Adam(G.parameters(), lr=5e-5, betas=(0.0, 0.9))
    optD = torch.optim.Adam(D.parameters(), lr=1e-4, betas=(0.0, 0.9))
    real = torch.randn(batch, 1, res, res, res).clamp_(-1, 1)

    def iteration(step):
        # p.stylegan makes do_Dr1 TRUE on every D step (stylegan.py:41);
        # do_Gpl stays False and there is no weight_avg (trainer.py:74-75,
        # 199-206 are stylegan2-only) — every iteration is the same kind.
        for _ in range(2):  # iterD
            for q in D.parameters():
                q.requires_grad = True
            D.zero_grad()
            noise = torch.randn(batch, z_size, 1, 1, 1)
            loss.step_D(step, real, noise)
            optD.step()
            for q in D.parameters():
                q.requires_grad = False
        for q in G.parameters():
            q.requires_grad = True
        G.zero_grad()
        noise = torch.randn(batch, z_size, 1, 1, 1)
        loss.step_G(step, noise)
        optG.step()
        for q in G.parameters():
            q.requires_grad = False

    for q in list(G.parameters()) + list(D.parameters()):
        q.requires_grad = False
    return iteration


def measure_step_sg1(batch, z_size, filters, res, iters, warmup):
    """The reference's exact StyleGAN-1 iteration (trainer.py:62-65 wiring:
    StyleGAN2Loss with G_synthesis=None, R1 on EVERY D step, no PL, no
    EMA), fp32 eager on host CPU. Returns (step_seconds, aten_ops/iter)."""
    iteration = _sg1_setup(batch, z_size, filters, res)
    for k in range(warmup):
        t = time.perf_counter()
        iteration(1 + k)
        print(f"# warmup iter {k}: {time.perf_counter() - t:.0f}s",
              flush=True)
    t0 = time.perf_counter()
    for k in range(iters):
        t = time.perf_counter()
        iteration(17 + k)
        print(f"# iter {k}: {time.perf_counter() - t:.0f}s", flush=True)
    dt = (time.perf_counter() - t0) / iters

    # steady-state aten-op count for the launch floor (same method as
    # count_reference_ops.count_sg2: frozen params, warmed-up Adam)
    from count_reference_ops import OpCounter
    counter = OpCounter()
    with counter:
        iteration(99)
    return dt, counter.n


def measure_gemm(n=2048, iters=8):
    a = torch.randn(n, n)
    b = torch.randn(n, n)
    for _ in range(2):
        torch.mm(a, b)
    t0 = time.perf_counter()
    for _ in range(iters):
        torch.mm(a, b)
    dt = (time.perf_counter() - t0) / iters
    return 2 * n ** 3 / dt


def measure_hot_convs(batch=16):
    """The reference's five hottest conv shapes at the 64^3 config."""
    shapes = [  # (cin, cout, k, spatial)  — from the GBlockDeep bottlenecks
        (32, 32, 3, 64), (32, 32, 3, 32), (64, 64, 3, 32),
        (128, 128, 3, 16), (512, 128, 1, 8),
    ]
    rows = []
    for cin, cout, k, s in shapes:
        conv = nn.Conv3d(cin, cout, k, padding=k // 2)
        x = torch.randn(batch, cin, s, s, s)
        with torch.no_grad():
            conv(x)
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                conv(x)
            dt = (time.perf_counter() - t0) / n
        fl = 2 * batch * cout * s ** 3 * cin * k ** 3
        rows.append({"conv": f"{cin}->{cout} k{k} @{s}^3",
                     "ms": round(dt * 1e3, 1),
                     "gflops": round(fl / dt / 1e9, 1)})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--filters", type=int, default=64)
    ap.add_argument("--z", type=int, default=512)
    ap.add_argument("--family", default="biggan",
                    choices=["biggan", "stylegan2", "stylegan", "dcgan",
                             "hybrid"])
    ap.add_argument("--write", action="store_true")
    a = ap.parse_args()
    torch.manual_seed(0)
    n_threads = torch.get_num_threads()

    print(f"# torch {torch.__version__} cpu, {n_threads} threads",
          flush=True)
    gemm = measure_gemm()
    print(f"# host sustained fp32 GEMM: {gemm / 1e9:.1f} GFLOP/s", flush=True)

    if a.family == "stylegan2":
        dt, plain_dt, reg_dt = measure_step_sg2(
            a.batch, a.z, a.filters, 64, a.iters, a.warmup)
        vps_cpu = a.batch / dt
        print(f"# reference sg2 step (1/16-amortized): {dt:.1f} s -> "
              f"{vps_cpu:.3f} vol/s on host CPU "
              f"(plain {plain_dt:.1f}s, reg {reg_dt:.1f}s)", flush=True)
        # Two-bound transfer. The plain GEMM-ratio transfer (biggan method)
        # is physically implausible here: the sg2 eager iteration is ~8k
        # dispatched aten ops (tiny 4^3..64^3 tensors, C=1 depthwise FIRs),
        # so on a GPU the step is bounded below by kernel-launch overhead,
        # not FLOPs. A100 time = max(compute transfer, launch floor), with
        # the launch floor from a measured per-iteration op count at
        # 5-10 us/op (published eager CUDA per-op overheads).
        from count_reference_ops import count_sg2  # noqa: E402 (same dir)
        n_plain = count_sg2(a.batch, a.z, a.filters, 64, step=17)
        n_reg = count_sg2(a.batch, a.z, a.filters, 64, step=16)
        n_amort = (15 * n_plain + n_reg) / 16.0
        print(f"# aten ops/iteration: plain {n_plain}, reg {n_reg} "
              f"(amortized {n_amort:.0f})", flush=True)
        bench_batch = 16  # the config-4 bench batch; compute scales
        t_cpu_b16 = dt * bench_batch / a.batch  # serial host: linear
        t_fp16 = t_cpu_b16 * gemm / A100_GEMM_FP16
        t_tf32 = t_cpu_b16 * gemm / A100_GEMM_TF32
        t_high = max(t_fp16, n_amort * 5e-6)
        t_low = max(t_tf32, n_amort * 10e-6)
        vps_a100_high = bench_batch / t_high
        vps_a100_low = bench_batch / t_low
        vps_a100 = float(np.sqrt(vps_a100_low * vps_a100_high))
        print(f"# A100 estimate (launch-floored, batch 16): "
              f"{vps_a100:.1f} vol/s [{vps_a100_low:.1f} .. "
              f"{vps_a100_high:.1f}]; compute-only transfer would claim "
              f"{bench_batch / t_fp16:.0f} (fp16), launch floor alone "
              f"{bench_batch / (n_amort * 7e-6):.0f} @7us", flush=True)
        sub = {
            "volumes_per_sec": round(vps_a100, 2),
            "band": [round(vps_a100_low, 2), round(vps_a100_high, 2)],
            "hardware": "A100 (derived)",
            "method": ("measured torch reference (reference's own "
                       "stylegan.py modules, StyleGAN2-3D 64^3 batch %d, "
                       "iterD=2, lazy reg amortized 1/16, fp32 eager) on "
                       "host CPU; A100 time = max(GEMM-ratio compute "
                       "transfer, kernel-launch floor from the measured "
                       "aten-op count at 5-10us/op) at bench batch 16 — "
                       "the pure GEMM transfer alone is implausible for "
                       "this ~8k-op eager iteration" % a.batch),
            "ops_per_iteration": {"plain": n_plain, "reg": n_reg},
            "cpu_measured": {
                "volumes_per_sec": round(vps_cpu, 4),
                "step_seconds": round(dt, 2),
                "plain_step_seconds": round(plain_dt, 2),
                "reg_step_seconds": round(reg_dt, 2),
                "host_gemm_gflops": round(gemm / 1e9, 1),
                "threads": n_threads,
            },
        }
        print(json.dumps(sub, indent=2))
        if a.write:
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BASELINE_MEASURED.json")
            data = {}
            if os.path.isfile(path):
                with open(path) as f:
                    data = json.load(f)
            data["stylegan2"] = sub
            with open(path, "w") as f:
                json.dump(data, f, indent=2)
            print(f"# updated {path} [stylegan2]", flush=True)
        return
    if a.family == "stylegan":
        dt, n_ops = measure_step_sg1(a.batch, a.z, a.filters, 64,
                                     a.iters, a.warmup)
        vps_cpu = a.batch / dt
        print(f"# reference sg1 step: {dt:.1f} s -> {vps_cpu:.3f} vol/s on "
              f"host CPU; {n_ops} aten ops/iteration", flush=True)
        # Same two-bound transfer as stylegan2: the sg1 iteration shares the
        # op-heavy sg2 D (6 passes/iter) plus R1 double-backward EVERY step,
        # so an A100 eager step is bounded below by kernel-launch overhead
        # as well as by compute. A100 time = max(GEMM-ratio transfer,
        # n_ops * 5-10us launch floor) at the bench batch of 16.
        bench_batch = 16
        t_cpu_b16 = dt * bench_batch / a.batch  # serial host: linear
        t_high = max(t_cpu_b16 * gemm / A100_GEMM_FP16, n_ops * 5e-6)
        t_low = max(t_cpu_b16 * gemm / A100_GEMM_TF32, n_ops * 10e-6)
        vps_a100_high = bench_batch / t_high
        vps_a100_low = bench_batch / t_low
        vps_a100 = float(np.sqrt(vps_a100_low * vps_a100_high))
        print(f"# A100 estimate (launch-floored, batch 16): "
              f"{vps_a100:.1f} vol/s [{vps_a100_low:.1f} .. "
              f"{vps_a100_high:.1f}]; launch floor alone "
              f"{bench_batch / (n_ops * 7e-6):.0f} @7us", flush=True)
        sub = {
            "volumes_per_sec": round(vps_a100, 2),
            "band": [round(vps_a100_low, 2), round(vps_a100_high, 2)],
            "hardware": "A100 (derived)",
            "method": ("measured torch reference (stylegan.py:969-1148 "
                       "styleGAN_gen truncated one stage for 64^3 + the "
                       "reference's own Discriminator/StyleGAN2Loss with "
                       "R1 every D step, batch %d, iterD=2, fp32 eager; "
                       "the shipped run_G unpack crash fixed minimally by "
                       "returning (img, w)) on host CPU; A100 time = "
                       "max(GEMM-ratio compute transfer, kernel-launch "
                       "floor from the measured aten-op count at 5-10us/op)"
                       " at bench batch 16" % a.batch),
            "ops_per_iteration": n_ops,
            "cpu_measured": {
                "volumes_per_sec": round(vps_cpu, 4),
                "step_seconds": round(dt, 2),
                "host_gemm_gflops": round(gemm / 1e9, 1),
                "threads": n_threads,
            },
        }
        print(json.dumps(sub, indent=2))
        if a.write:
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BASELINE_MEASURED.json")
            data = {}
            if os.path.isfile(path):
                with open(path) as f:
                    data = json.load(f)
            data["stylegan"] = sub
            with open(path, "w") as f:
                json.dump(data, f, indent=2)
            print(f"# updated {path} [stylegan]", flush=True)
        return
    if a.family == "hybrid":
        # --hybrid (reference trainer.py:52-54): BigGAN-deep G + the DCGAN
        # WGAN-LayerNorm D, WGAN loss (the default; hybrid has no canonical
        # hinge run). Eager op count sits near the biggan flagship's, far
        # under the sg2 launch-floor regime, so the plain GEMM-ratio
        # transfer applies (same method as the biggan headline).
        G = RefG64(a.filters, a.z)
        D = RefDCGAN_D64(a.filters)
        gf = count_forward_flops(G, torch.randn(a.batch, a.z, 1, 1, 1))
        df = count_forward_flops(D, torch.randn(a.batch, 1, 64, 64, 64))
        step_flops = 2 * (gf + 6 * df) + (3 * gf + 3 * df)
        print(f"# G fwd {gf / 1e9:.1f} GFLOP, D fwd {df / 1e9:.1f} GFLOP, "
              f"full iteration ~{step_flops / 1e12:.2f} TFLOP", flush=True)
        dt = measure_step(G, D, a.batch, a.z, 64, a.iters, a.warmup,
                          loss="wgan")
        vps_cpu = a.batch / dt
        eff_cpu = step_flops / dt
        print(f"# reference hybrid step: {dt:.1f} s -> {vps_cpu:.3f} vol/s "
              f"on host CPU ({eff_cpu / 1e9:.1f} GFLOP/s sustained, "
              f"{100 * eff_cpu / gemm:.0f}% of host GEMM rate)", flush=True)
        frac = eff_cpu / gemm
        vps_a100_high = a.batch / (step_flops / (frac * A100_GEMM_FP16))
        vps_a100_low = a.batch / (step_flops / (frac * A100_GEMM_TF32))
        vps_a100 = float(np.sqrt(vps_a100_low * vps_a100_high))
        print(f"# A100 estimate: {vps_a100:.1f} vol/s "
              f"[{vps_a100_low:.1f} (TF32) .. {vps_a100_high:.1f} (fp16)]",
              flush=True)
        sub = {
            "volumes_per_sec": round(vps_a100, 2),
            "band": [round(vps_a100_low, 2), round(vps_a100_high, 2)],
            "hardware": "A100 (derived)",
            "method": ("measured torch reference (--hybrid: biggan.py G + "
                       "dcgan.py:158-182 WGAN-LayerNorm D at 64^3, batch "
                       "%d, iterD=2, WGAN, fp32 eager) on host CPU; A100 "
                       "derived by GEMM-ratio roofline transfer like the "
                       "biggan headline" % a.batch),
            "cpu_measured": {
                "volumes_per_sec": round(vps_cpu, 4),
                "step_seconds": round(dt, 2),
                "sustained_gflops": round(eff_cpu / 1e9, 1),
                "host_gemm_gflops": round(gemm / 1e9, 1),
                "threads": n_threads,
                "step_tflop": round(step_flops / 1e12, 2),
            },
        }
        print(json.dumps(sub, indent=2))
        if a.write:
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BASELINE_MEASURED.json")
            data = {}
            if os.path.isfile(path):
                with open(path) as f:
                    data = json.load(f)
            data["hybrid"] = sub
            with open(path, "w") as f:
                json.dump(data, f, indent=2)
            print(f"# updated {path} [hybrid]", flush=True)
        return

    if a.family == "dcgan":
        # BASELINE config 1: DCGAN 64^3, WGAN loss, LayerNorm D. Few ops
        # per eager iteration (~40 modules/net), so the launch floor is
        # irrelevant and the plain GEMM-ratio transfer applies.
        G = RefDCGAN_G64(a.filters, a.z)
        D = RefDCGAN_D64(a.filters)
        gf = count_forward_flops(G, torch.randn(a.batch, a.z, 1, 1, 1))
        df = count_forward_flops(D, torch.randn(a.batch, 1, 64, 64, 64))
        step_flops = 2 * (gf + 6 * df) + (3 * gf + 3 * df)
        print(f"# G fwd {gf / 1e9:.1f} GFLOP, D fwd {df / 1e9:.1f} GFLOP, "
              f"full iteration ~{step_flops / 1e12:.2f} TFLOP", flush=True)
        dt = measure_step(G, D, a.batch, a.z, 64, a.iters, a.warmup,
                          loss="wgan")
        vps_cpu = a.batch / dt
        eff_cpu = step_flops / dt
        print(f"# reference dcgan step: {dt:.1f} s -> {vps_cpu:.3f} vol/s "
              f"on host CPU ({eff_cpu / 1e9:.1f} GFLOP/s sustained, "
              f"{100 * eff_cpu / gemm:.0f}% of host GEMM rate)", flush=True)
        frac = eff_cpu / gemm
        vps_a100_high = a.batch / (step_flops / (frac * A100_GEMM_FP16))
        vps_a100_low = a.batch / (step_flops / (frac * A100_GEMM_TF32))
        vps_a100 = float(np.sqrt(vps_a100_low * vps_a100_high))
        print(f"# A100 estimate: {vps_a100:.1f} vol/s "
              f"[{vps_a100_low:.1f} (TF32) .. {vps_a100_high:.1f} (fp16)]",
              flush=True)
        sub = {
            "volumes_per_sec": round(vps_a100, 2),
            "band": [round(vps_a100_low, 2), round(vps_a100_high, 2)],
            "hardware": "A100 (derived)",
            "method": ("measured torch reference (dcgan.py:44-70 G ladder /"
                       " :158-182 WGAN-LayerNorm D at 64^3 = one fewer "
                       "stage, batch %d, iterD=2, WGAN, fp32 eager) on "
                       "host CPU; A100 derived by GEMM-ratio roofline "
                       "transfer like the biggan headline" % a.batch),
            "cpu_measured": {
                "volumes_per_sec": round(vps_cpu, 4),
                "step_seconds": round(dt, 2),
                "sustained_gflops": round(eff_cpu / 1e9, 1),
                "host_gemm_gflops": round(gemm / 1e9, 1),
                "threads": n_threads,
                "step_tflop": round(step_flops / 1e12, 2),
            },
        }
        print(json.dumps(sub, indent=2))
        if a.write:
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BASELINE_MEASURED.json")
            data = {}
            if os.path.isfile(path):
                with open(path) as f:
                    data = json.load(f)
            data["dcgan"] = sub
            with open(path, "w") as f:
                json.dump(data, f, indent=2)
            print(f"# updated {path} [dcgan]", flush=True)
        return

    convs = measure_hot_convs(a.batch)
    for r in convs:
        print(f"# conv {r['conv']}: {r['ms']} ms, {r['gflops']} GFLOP/s",
              flush=True)

    G = RefG64(a.filters, a.z)
    D = RefD64(a.filters)
    gf = count_forward_flops(G, torch.randn(a.batch, a.z, 1, 1, 1))
    df = count_forward_flops(
        D, torch.randn(a.batch, 1, 64, 64, 64))
    # per-iteration FLOPs: iterD*(Gf + 2 Df fwd + 2*2 Df bwd) + (Gf + Df fwd
    # + 2(Gf+Df) bwd), backward ~2x forward
    step_flops = 2 * (gf + 6 * df) + (3 * gf + 3 * df)
    print(f"# G fwd {gf / 1e9:.1f} GFLOP, D fwd {df / 1e9:.1f} GFLOP, "
          f"full iteration ~{step_flops / 1e12:.2f} TFLOP", flush=True)

    dt = measure_step(G, D, a.batch, a.z, 64, a.iters, a.warmup)
    vps_cpu = a.batch / dt
    eff_cpu = step_flops / dt  # sustained FLOP/s across the whole step
    print(f"# reference step: {dt:.1f} s -> {vps_cpu:.3f} vol/s on host CPU "
          f"({eff_cpu / 1e9:.1f} GFLOP/s sustained, "
          f"{100 * eff_cpu / gemm:.0f}% of host GEMM rate)", flush=True)

    # Roofline transfer: assume the same fraction of sustained-GEMM rate on
    # the A100 as measured on the host (generous to the A100 — see module
    # docstring).
    frac = eff_cpu / gemm
    vps_a100_high = a.batch / (step_flops / (frac * A100_GEMM_FP16))
    vps_a100_low = a.batch / (step_flops / (frac * A100_GEMM_TF32))
    vps_a100 = float(np.sqrt(vps_a100_low * vps_a100_high))  # geometric mid
    print(f"# A100 estimate: {vps_a100:.1f} vol/s "
          f"[{vps_a100_low:.1f} (TF32) .. {vps_a100_high:.1f} (fp16)]",
          flush=True)

    out = {
        "volumes_per_sec": round(vps_a100, 2),
        "band": [round(vps_a100_low, 2), round(vps_a100_high, 2)],
        "hardware": "A100 (derived)",
        "method": ("measured torch reference (reference's own modules, "
                   "BigGAN-Deep 64^3 batch %d, iterD=2, hinge, fp32 eager) "
                   "on host CPU; A100 derived by GEMM-ratio roofline "
                   "transfer — see scripts/measure_reference_baseline.py"
                   % a.batch),
        "cpu_measured": {
            "volumes_per_sec": round(vps_cpu, 4),
            "step_seconds": round(dt, 2),
            "sustained_gflops": round(eff_cpu / 1e9, 1),
            "host_gemm_gflops": round(gemm / 1e9, 1),
            "threads": n_threads,
            "step_tflop": round(step_flops / 1e12, 2),
        },
        "hot_convs_cpu": convs,
        "a100_gemm_assumption": {"fp16": A100_GEMM_FP16,
                                 "tf32": A100_GEMM_TF32},
    }
    print(json.dumps(out, indent=2))
    if a.write:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BASELINE_MEASURED.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"# wrote {path}", flush=True)


if __name__ == "__main__":
    main()
