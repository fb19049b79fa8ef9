"""Count aten ops in one reference training iteration (launch-floor input).

The GEMM-ratio roofline transfer in measure_reference_baseline.py assumes
the A100 sustains the same fraction of its GEMM peak as the host CPU does.
That holds roughly for the biggan flagship (large im2col GEMMs dominate)
but breaks for StyleGAN2-3D at 64^3: the eager op mix is thousands of tiny
kernels (4^3..64^3 activations, C=1 depthwise FIRs, style affines), where a
GPU step is bounded below by kernel-launch overhead, not FLOPs.

This script runs ONE reference iteration (iterD D-steps + 1 G-step,
reference's own modules) under a TorchDispatchMode that counts dispatched
aten ops — a lower bound on CUDA kernel launches in eager mode (each
dispatched op launches >=1 kernel; many launch several). The launch floor
is then t >= n_ops * t_launch with t_launch ~5-10 us (published eager
per-op overhead on CUDA).

Usage: python scripts/count_reference_ops.py [--family stylegan2] [--step 16|17]
"""

from __future__ import annotations

import argparse
import sys

REFERENCE = "/root/reference"
sys.path.insert(0, REFERENCE)

import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch.utils._python_dispatch import TorchDispatchMode  # noqa: E402


class OpCounter(TorchDispatchMode):
    def __init__(self) -> None:
        super().__init__()
        self.n = 0

    def __torch_dispatch__(self, func, types, args=(), kwargs=None):
        self.n += 1
        return func(*args, **(kwargs or {}))


def count_sg2(batch: int, z_size: int, filters: int, res: int,
              step: int, iterD: int = 2) -> int:
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

    def iteration(s):
        for _ in range(iterD):
            for q in D.parameters():
                q.requires_grad = True
            D.zero_grad()
            noise = torch.randn(batch, z_size, 1, 1, 1)
            loss.step_D(s, real, noise)
            optD.step()
            for q in D.parameters():
                q.requires_grad = False
        for q in G.parameters():
            q.requires_grad = True
        G.zero_grad()
        noise = torch.randn(batch, z_size, 1, 1, 1)
        loss.step_G(s, noise)
        optG.step()
        for q in G.parameters():
            q.requires_grad = False
        # weight_avg (trainer.py:199-206)
        state = G.state_dict()
        for key in state:
            state[key] = (state[key] + ema_state[key]) / 2.0
        G.load_state_dict(state)

    # Steady state: the reference trainer toggles requires_grad around each
    # step so that during the D-steps the G params do NOT require grad (and
    # vice versa) — fresh-constructed params default to requires_grad=True,
    # which would make loss_Dgen.backward() traverse the full G backward
    # graph iterD extra times per iteration. Freeze both nets first, then
    # run ONE uncounted warmup iteration to absorb Adam's lazy state init
    # and any first-call buffers (matches measure_step_sg2's warmup).
    for q in list(G.parameters()) + list(D.parameters()):
        q.requires_grad = False
    iteration(1)  # warmup (plain step; inits all Adam state), not counted

    counter = OpCounter()
    with counter:
        iteration(step)
    return counter.n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    # default 64 = the baseline config (measure_reference_baseline.py and
    # bench.py both use filters=64); BASELINE_MEASURED.json's recorded
    # ops_per_iteration were counted at filters=64.
    ap.add_argument("--filters", type=int, default=64)
    ap.add_argument("--z", type=int, default=512)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--step", type=int, default=17,
                    help="17 = plain step (no lazy reg), 16 = R1+PL step")
    a = ap.parse_args()
    torch.manual_seed(0)
    n = count_sg2(a.batch, a.z, a.filters, a.res, a.step)
    tag = "reg" if a.step % 16 == 0 else "plain"
    print(f"aten ops per {tag} iteration (iterD=2 + G + weight_avg): {n}")
    for us in (5, 7, 10):
        print(f"  launch floor @ {us} us/op: {n * us / 1e3:.1f} ms "
              f"-> {a.batch / (n * us / 1e6):.0f} vol/s at batch {a.batch} "
              f"/ {16 / (n * us / 1e6):.0f} at batch 16")


if __name__ == "__main__":
    main()
