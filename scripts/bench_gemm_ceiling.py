"""Narrow-N GEMM ceilings for the dcgan / sg1 residual chapters (round 4).

The biggan narrow-conv chapter (docs/PERF.md "Why utilization is ~10-15%")
closed with: XLA's conv achieves ~84% of the PURE-GEMM rate at the conv's
im2col shape, so the conv lowering is not the problem — the model's narrow
channels are. This script applies the same test to the shapes that carry
the dcgan and StyleGAN-1 residuals:

  - dcgan 32^3 C=64 bucket (k=4 s=2, 64<->128ch): im2col GEMM
    [16*16^3, 4^3*64] @ [4096, 128]  — measured conv rate 71.9 TF/s
  - sg1 64^3 stage (k=3 s=1, 64->32):  [16*64^3, 27*64] @ [1728, 32]
  - sg1 32^3 stage (k=3 s=1, 64->64):  [16*32^3, 27*64] @ [1728, 64]
    — measured conv bucket rate 27.4 TF/s (session-5 sg1 trace)

If GEMM ~= conv rate, the conv is at its hardware ceiling and the chapter
closes; if GEMM >> conv, there is kernel headroom worth hunting.

Also prints the banded-lowering (fast_c1-style) arithmetic for the sg1
C=64 case: the band inflates dense FLOPs by W/3 per axis, so at W=64 the
einsum must sustain 21.3x the conv's effective rate to break even —
above MXU peak whenever the conv already exceeds ~9 TF/s. That closes the
"relax the c1 gate to 64ch" question (VERDICT r3 next #5) by arithmetic.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gemm_ceiling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_gemm(m: int, k: int, n: int, iters: int = 30) -> float:
    """Time `iters` GEMMs chained inside ONE jitted lax.scan — per-call
    dispatch over the axon tunnel has a ~2 ms floor that swamps small
    GEMMs (a first cut measured every shape at a flat 20-30 TF/s)."""
    key = jax.random.key(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)

    @jax.jit
    def f(a, b):
        def body(carry, _):
            b, acc = carry
            out = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # loop-carried dependency so XLA can't hoist the GEMM; the
            # perturbation underflows bf16 (value-neutral). Carry the SMALL
            # operand: carrying `a` double-buffers it and the 4M-row sg1
            # shapes (13.9 GB in bf16) then OOM HBM.
            # Consume the WHOLE output: a first cut fed only out[0, 0]
            # forward and XLA strength-reduced the GEMM to one output row —
            # the sg1 shapes then "measured" 570 TF/s, 2.9x above MXU peak.
            # The sum reduction fuses into the GEMM epilogue (no extra HBM
            # round-trip) and depends on every output element.
            tot = jnp.sum(out)
            b = b + (tot * 1e-38).astype(b.dtype)
            return (b, acc + tot), None

        (_, acc), _ = jax.lax.scan(body, (b, jnp.float32(0)), None,
                                   length=iters)
        return acc

    _ = float(jax.device_get(f(a, b)))  # compile+warm (axon:
    #                        block_until_ready returns early; read back)
    t0 = time.perf_counter()
    _ = float(jax.device_get(f(a, b)))
    dt = (time.perf_counter() - t0) / iters
    return 2 * m * k * n / dt / 1e12


def main() -> None:
    cases = [
        ("dcgan k4s2 64->128 @32^3 (conv measured 71.9 TF/s)",
         16 * 16 ** 3, 4 ** 3 * 64, 128),
        ("dcgan dW form [4096 x 65536 x 128]", 4096, 16 * 16 ** 3, 128),
        ("sg1 k3s1 64->32 @64^3 (conv bucket 27.4 TF/s)",
         16 * 64 ** 3, 27 * 64, 32),
        ("sg1 k3s1 64->64 @32^3", 16 * 32 ** 3, 27 * 64, 64),
        ("sg1 k3s1 32->32 @64^3", 16 * 64 ** 3, 27 * 32, 32),
        ("wide control 128ch (round-1: 61.8 TF/s @ N=128)",
         16 * 16 ** 3, 27 * 128, 128),
    ]
    for name, m, k, n in cases:
        tfs = bench_gemm(m, k, n)
        print(f"{tfs:7.1f} TF/s  [{m} x {k} x {n}]  {name}", flush=True)

    # banded-lowering arithmetic for sg1's C=64 convs (no A/B needed):
    w = 64
    inflate = 3 * w / 9  # (9 shifted views * W contraction) / 27-tap stencil
    print(f"\n# banded (fast_c1-style) lowering at W={w}: {inflate:.1f}x "
          "dense-FLOP inflation -> even at MXU peak ~197 TF/s the effective "
          f"rate caps at {197 / inflate:.1f} TF/s; XLA's conv already "
          "achieves 27.4 TF/s at the sg1 C=64 stage, so the banded form "
          "loses by arithmetic — gate relaxation closed without an A/B.",
          flush=True)


if __name__ == "__main__":
    main()
