"""One process of a multi-host (multi-process) CPU training demo.

Validates the DCN/multi-host path end-to-end without TPU pods: N processes
x 4 virtual CPU devices each, gloo collectives, jax.distributed.initialize
via gan3d_tpu.parallel.mesh.init_distributed, per-process data sharding
through put_global_batch, and distributed Orbax checkpointing.

Launched by scripts/demo_multihost_cpu.sh; run manually as:

    python scripts/multihost_worker.py --process_id=I --num_processes=N \
        --coordinator=127.0.0.1:12355 --data=/path/train.npz --log_dir=...
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--coordinator", default="127.0.0.1:12355")
    ap.add_argument("--data", required=True)
    ap.add_argument("--log_dir", required=True)
    ap.add_argument("--devices_per_process", type=int, default=4)
    ap.add_argument("--niters", type=int, default=3)
    a = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count="
        f"{a.devices_per_process}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gan3d_tpu.config import Config
    from gan3d_tpu.data.datasets import NpzDataset
    from gan3d_tpu.parallel.mesh import init_distributed

    cfg = Config(dcgan=True, resolution=16, z_size=16, filterG=8, filterD=8,
                 batch_size=4 * a.num_processes, niters=a.niters, iterD=2,
                 steps_per_log=1, steps_per_img_log=100, steps_per_ckpt=100,
                 compute_dtype="float32", data_loader_workers=1,
                 log_dir=a.log_dir, distributed=True,
                 coordinator_address=a.coordinator,
                 process_id=a.process_id, num_processes=a.num_processes)
    init_distributed(cfg)
    assert jax.process_count() == a.num_processes, jax.process_count()
    assert len(jax.devices()) == a.num_processes * a.devices_per_process

    from gan3d_tpu.train import Trainer

    t = Trainer(NpzDataset(a.data), cfg)
    t.train()
    if jax.process_index() == 0:
        import numpy as np

        assert np.isfinite(t.G_losses).all()
        print(f"MULTIHOST_OK processes={a.num_processes} "
              f"devices={len(jax.devices())} losses={t.G_losses}",
              flush=True)


if __name__ == "__main__":
    main()
