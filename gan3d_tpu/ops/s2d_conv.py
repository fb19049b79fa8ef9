"""Space-to-depth rewrite for the single-channel stem conv (k=3, Ci=1).

The flagship D's stem conv (reference discriminator input conv,
`utils.py:96-117` block stack head / `biggan.py` D first conv: 1 channel ->
filterD) is the worst MXU citizen in the step: with Ci=1 the im2col
contraction depth is 27, and XLA's conv emitter measures 1.4 TF/s at
64^3 (session-7 trace, docs/PERF.md).  Because the input tensor is TINY
(one channel: 8 MB at batch 16 @ 64^3), the space-to-depth relayout tax
that sank the packed rewrite for the wide convs (scripts/bench_s2d_conv.py,
measured no-go) is negligible here — and the packed conv gets a 4x wider
contraction and 4x wider output:

    pack H,W by 2 (PHASE-SHIFTED: pad the SAME halo first, block b holds
    original rows {2b-1, 2b}) -> the 4-tap window of a k=3 conv lands on
    exactly 2 packed blocks, so the packed kernel is k=[3,2,2] over
    (4*Ci -> 4*Co) channels at only (4/3)^2 = 1.78x dense FLOPs.

Exact algebra (same multiplies; structural zeros contribute exactly 0):
parity pinned in tests/test_s2d_conv.py.  Measured (scripts/
bench_boundary_conv.py, batch 16 @ 64^3): grad program 2.95x faster,
fwd-only program 0.88x — the win is the backward (dx/dW of the packed
form are wide convs).  Step-level verdicts are RESOLUTION-DEPENDENT
(docs/PERF.md session 8): at 64^3 the A/B LOST (18.3 vs 20.3 vol/s —
fusion-neighborhood non-locality, same lesson as the glue ladder), but at
128^3 the two-sided boundary rewrite (this op + the tap-map head,
ops/tap_conv.py) WINS: 1.01 vs 0.962 vol/s, and the 128^3 control
program stopped fitting the remote compile helper entirely.  The Trainer
resolves ``fast_stem="auto"`` to ON at resolution >= 128, OFF below
(mirroring ``downconv_vjp``); the module-level auto (no Trainer) is OFF.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NDHWC", "DHWIO", "NDHWC")

_MODE = os.environ.get("GAN3D_FAST_STEM", "auto")


def set_fast_stem_mode(mode: str) -> None:
    global _MODE
    assert mode in ("off", "auto", "on"), mode
    _MODE = mode


def fast_stem_enabled() -> bool:
    if _MODE == "auto":
        return False  # step-level A/B measured a LOSS (18.3 vs 20.3 vol/s)
    return _MODE == "on"


def eligible(x_shape, w_shape, stride, padding, dilation, groups) -> bool:
    """k=3, stride 1, SAME pad 1, no dilation/groups, Ci == 1, wide-ish
    Co, even H/W (the pack factor)."""
    if groups != 1:
        return False
    if tuple(w_shape[:3]) != (3, 3, 3):
        return False
    if tuple(stride) != (1, 1, 1) or tuple(padding) != (1, 1, 1):
        return False
    if tuple(dilation) != (1, 1, 1):
        return False
    if x_shape[4] != 1 or w_shape[3] != 1:
        return False
    if w_shape[4] < 16:
        return False
    return x_shape[2] % 2 == 0 and x_shape[3] % 2 == 0 and \
        x_shape[2] >= 8 and x_shape[3] >= 8


@functools.lru_cache(maxsize=None)
def _embed_matrix() -> np.ndarray:
    """m1[K, q, p, t] in {0,1} per packed dim: packed-kernel offset K at
    input subposition q contributes original tap t = 2K - 1 + q - p to
    output subposition p when 0 <= t <= 2 (6 of 8 combos live)."""
    m1 = np.zeros((2, 2, 2, 3), np.float32)
    for K in range(2):
        for q in range(2):
            for p in range(2):
                t = 2 * K - 1 + q - p
                if -1 <= t <= 1:
                    m1[K, q, p, t + 1] = 1.0
    return m1


def _embed_weights_hw2(w: jax.Array) -> jax.Array:
    """[3,3,3,Ci,Co] -> [3,2,2,4Ci,4Co] (H,W packed by 2)."""
    m1 = jnp.asarray(_embed_matrix(), w.dtype)
    wp = jnp.einsum("KqpT,LrsU,dTUio->dKLqripso", m1, m1, w)
    kd, ci, co = w.shape[0], w.shape[3], w.shape[4]
    return wp.reshape(kd, 2, 2, 4 * ci, 4 * co)


def stem_conv3d_s2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME k=3 conv via phase-shifted H,W space-to-depth (exact)."""
    n, d, h, wd, ci = x.shape
    co = w.shape[4]
    # pack: pad the SAME halo on H/W, block b = original {2b-1, 2b}
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    xp = xp.reshape(n, d, (h + 2) // 2, 2, (wd + 2) // 2, 2, ci)
    xp = xp.transpose(0, 1, 2, 4, 3, 5, 6)
    xp = xp.reshape(n, d, h // 2 + 1, wd // 2 + 1, 4 * ci)
    y = lax.conv_general_dilated(
        xp, _embed_weights_hw2(w), (1, 1, 1),
        [(1, 1), (0, 0), (0, 0)], dimension_numbers=_DN,
        preferred_element_type=x.dtype)
    # unpack (output blocks are aligned: P holds {2P, 2P+1})
    y = y.reshape(n, d, h // 2, wd // 2, 2, 2, co)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6)
    return y.reshape(n, d, h, wd, co)
