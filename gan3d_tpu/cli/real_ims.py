"""Dump one shuffled real batch for qualitative comparison
(reference: real_ims.py — saves `{name}_real.npz` with an NCDHW batch)."""

from __future__ import annotations

import argparse

import numpy as np

from gan3d_tpu.data.datasets import open_dataset
from gan3d_tpu.data.loader import Loader


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--data_path", type=str, default="test_lidc_128.npz")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)
    ds = open_dataset(a.data_path)
    batch = next(iter(Loader(ds, a.batch_size, seed=a.seed)))
    # reference keeps NCDHW in the dump (real_ims.py:13-15)
    name = a.data_path.split("_")[1] if "_" in a.data_path else "data"
    np.savez_compressed(f"{name}_real.npz", batch[:, None])
    print(f"saved {name}_real.npz {batch[:, None].shape}", flush=True)


if __name__ == "__main__":
    main()
