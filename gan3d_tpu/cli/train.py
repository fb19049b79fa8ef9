"""Training CLI (reference: main.py).

Example (reference run.sh equivalent):
    python -m gan3d_tpu.cli.train --log_dir=BRATS_GANs/BigGAN --biggan=True \
        --data_path=brats_train --filterD=64 --filterG=64 --hinge=True
"""

from __future__ import annotations

from gan3d_tpu.config import config_from_args
from gan3d_tpu.data.datasets import open_dataset
from gan3d_tpu.utils.platform import enable_compile_cache, force_platform


def main(argv=None) -> None:
    cfg = config_from_args(argv)
    force_platform(cfg.platform)
    enable_compile_cache()
    from gan3d_tpu.parallel.mesh import init_distributed

    init_distributed(cfg)
    from gan3d_tpu.train import Trainer

    print(cfg, flush=True)
    dataset = open_dataset(cfg.data_path)
    Trainer(dataset, cfg).train()


if __name__ == "__main__":
    main()
