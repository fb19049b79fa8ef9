"""Split one .npz archive into per-index files (reference: make_dir_dataset.py)."""

from __future__ import annotations

import argparse

from gan3d_tpu.data.datasets import make_dir_dataset


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, default="train_lidc_128.npz")
    p.add_argument("--log_dir", type=str, default="log")
    a = p.parse_args(argv)
    n = make_dir_dataset(a.data_path, a.log_dir)
    print(f"wrote {n} samples to {a.log_dir}", flush=True)


if __name__ == "__main__":
    main()
