"""Micro-bench: formulations of the tap-head dW contraction on the TPU.

The tap-conv custom VJP needs dW[t, c] = sum_m du[m, t] * x[m, c] with
M = N*D*H*W (4.19M at the sg1 64^3 step), t = 27 taps, c = Ci. The naive
dot_general(contract dim 0 of both) makes XLA transpose x [M, C] ->
[C, M] via a 53 GB/s dynamic-update-slice while-loop (~21.5 ms/step in
the round-3 session-5 sg1 trace). Candidates:

  a) dot:   dot_general(du, x, contract (0, 0))          (the slow one)
  b) conv:  jax.vjp of a 1x1x1 conv x -> [*, 27] w.r.t. its weight —
            XLA's native backward-weights conv lowering (measured
            17-38 TF/s on the flagship's dW convs, PERF.md session 6)
  c) mulsum: 27 elementwise mul + reduce passes (bandwidth form)

Isolated numbers only FILTER formulations of this one node; the winner
still needs a step-level bench.py A/B before its auto flips (PERF.md
method rule).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NDHWC", "DHWIO", "NDHWC")


def dw_dot(du, x):
    n, d, h, w, ci = x.shape
    duf = du.reshape(-1, 27)
    xf = x.reshape(-1, ci)
    return lax.dot_general(duf, xf, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def dw_conv(du, x):
    n, d, h, w, ci = x.shape

    def f(w1):
        return lax.conv_general_dilated(
            x, w1, (1, 1, 1), [(0, 0)] * 3, dimension_numbers=_DN,
            preferred_element_type=du.dtype)

    w0 = jnp.zeros((1, 1, 1, ci, 27), x.dtype)
    return jax.vjp(f, w0)[1](du)[0][0, 0, 0].astype(jnp.float32)  # [Ci,27]


def dw_mulsum(du, x):
    outs = []
    for t in range(27):
        outs.append(jnp.sum(du[..., t:t + 1].astype(jnp.float32)
                            * x.astype(jnp.float32), axis=(0, 1, 2, 3)))
    return jnp.stack(outs)  # [27, Ci]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--ci", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(a.n, a.res, a.res, a.res, a.ci)),
                    jnp.bfloat16)
    du = jnp.asarray(rng.normal(size=(a.n, a.res, a.res, a.res, 27)),
                     jnp.bfloat16)
    m = a.n * a.res ** 3
    flop = 2.0 * m * 27 * a.ci
    forms = {"dot": dw_dot, "conv": dw_conv, "mulsum": dw_mulsum}
    ref = None
    for name, fn in forms.items():
        jf = jax.jit(fn)
        out = jax.device_get(jf(du, x))
        o = np.asarray(out, np.float32).reshape(-1)
        o = np.sort(np.abs(o))
        if ref is None:
            ref = o
        else:
            rel = np.max(np.abs(o - ref)) / (np.max(ref) + 1e-9)
            print(f"# {name}: rel-to-first {rel:.2e}")
        t0 = time.perf_counter()
        for _ in range(a.iters):
            r = jf(du, x)
        jax.device_get(r)  # honest sync through the tunnel
        dt = (time.perf_counter() - t0) / a.iters
        print(f"{name:7s} {dt * 1e3:8.2f} ms  {flop / dt / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
