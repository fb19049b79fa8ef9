"""Structured synthetic volumetric dataset for long-horizon training runs.

The real reference datasets (LIDC lung CT / BraTS brain MR — SURVEY §0,
reference main.py:16, run.sh:1-3) are not available in this environment, so
long training runs use this generator: each volume is a smooth "phantom" —
a soft body ellipsoid containing 1-3 smaller soft ellipsoid "lesions" with
random centers/radii/orientations/intensities — in the reference's data
contract ([-1, 1] float32, npz key 'X', shape [N, R, R, R], loaded by
data_handler.py:7-18 semantics).

Unlike pure-noise stand-ins, these volumes have learnable structure: a GAN
trained on them must reproduce body boundary, lesion count statistics and
smooth intensity falloffs, so loss trajectories, in-loop FID and sample
grids are meaningful.

Usage:
    python scripts/make_synth_dataset.py --out train64.npz --n 256 --res 64 --seed 0
"""

from __future__ import annotations

import argparse

import numpy as np


def _soft_ellipsoid(grid, center, radii, rot, sharpness=8.0):
    """Soft indicator in [0,1]: sigmoid over the ellipsoid's level set."""
    d = grid - np.asarray(center)[:, None, None, None]      # [3, R, R, R]
    d = np.einsum("ij,jxyz->ixyz", rot, d)
    r = np.sqrt((d[0] / radii[0]) ** 2 + (d[1] / radii[1]) ** 2
                + (d[2] / radii[2]) ** 2)
    return 1.0 / (1.0 + np.exp(sharpness * (r - 1.0)))


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def make_volume(rng, res: int) -> np.ndarray:
    ax = np.arange(res, dtype=np.float32)
    grid = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"))  # [3, R, R, R]
    c = res / 2.0
    # body: large soft ellipsoid around the center, mid intensity
    body_r = rng.uniform(0.30, 0.42, size=3) * res
    body = _soft_ellipsoid(grid, (c, c, c), body_r, _random_rotation(rng),
                           sharpness=6.0)
    vol = -1.0 + 1.2 * body                                  # ~[-1, 0.2]
    # lesions: 1-3 bright soft ellipsoids inside the body
    for _ in range(rng.integers(1, 4)):
        center = c + rng.uniform(-0.18, 0.18, size=3) * res
        radii = rng.uniform(0.06, 0.16, size=3) * res
        lesion = _soft_ellipsoid(grid, center, radii, _random_rotation(rng))
        vol += rng.uniform(0.6, 1.0) * lesion * body
    # faint smooth texture so intensities aren't piecewise constant
    k = max(res // 8, 2)
    coarse = rng.normal(scale=0.05, size=(k, k, k)).astype(np.float32)
    reps = -(-res // k)
    tex = np.kron(coarse, np.ones((reps, reps, reps),
                                  np.float32))[:res, :res, :res]
    return np.clip(vol + tex, -1.0, 1.0).astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    rng = np.random.default_rng(a.seed)
    X = np.stack([make_volume(rng, a.res) for _ in range(a.n)])
    np.savez(a.out, X=X)
    print(f"wrote {a.out}: {X.shape} in [{X.min():.2f}, {X.max():.2f}], "
          f"mean {X.mean():.3f}")


if __name__ == "__main__":
    main()
