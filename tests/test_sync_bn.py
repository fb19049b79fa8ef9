"""sync vs per-replica BN semantics (SURVEY §5.8)."""

import numpy as np

import jax
import jax.numpy as jnp

from gan3d_tpu.config import Config
from gan3d_tpu.nn.norm import BatchNorm3d


def test_grouped_bn_matches_per_shard_stats():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 4, 4, 4, 3)).astype(np.float32)
    # global stats
    bn_sync = BatchNorm3d(3)
    v = bn_sync.init(jax.random.key(0), jnp.asarray(x))
    y_sync, _ = bn_sync.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    # per-group (2 groups of 4): must equal running BatchNorm on each half
    bn_grp = BatchNorm3d(3, num_groups=2)
    y_grp, upd = bn_grp.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    halves = []
    for h in (x[:4], x[4:]):
        yh, _ = bn_sync.apply(v, jnp.asarray(h), mutable=["batch_stats"])
        halves.append(np.asarray(yh))
    np.testing.assert_allclose(np.asarray(y_grp), np.concatenate(halves),
                               atol=1e-5, rtol=1e-5)
    # grouped differs from global when the halves differ
    assert not np.allclose(np.asarray(y_grp), np.asarray(y_sync), atol=1e-3)


def test_registry_plumbs_groups():
    from gan3d_tpu.models import build_models

    cfg = Config(dcgan=True, resolution=16, z_size=16, filterG=8, filterD=8,
                 batch_size=8, sync_bn=False, num_devices=2,
                 compute_dtype="float32")
    G, _ = build_models(cfg)
    assert G.bn_groups == 2
    cfg2 = cfg.replace(sync_bn=True)
    G2, _ = build_models(cfg2)
    assert G2.bn_groups == 1


def test_training_with_per_replica_bn(tmp_path):
    from gan3d_tpu.data.datasets import NpzDataset
    from gan3d_tpu.train import Trainer

    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, 16, 16, 16)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "d.npz")
    np.savez(p, X=x)
    cfg = Config(dcgan=True, resolution=16, z_size=16, filterG=8, filterD=8,
                 batch_size=8, niters=2, iterD=1, sync_bn=False,
                 num_devices=0, steps_per_log=5, steps_per_img_log=5,
                 steps_per_ckpt=5, log_dir=str(tmp_path / "log"),
                 compute_dtype="float32", data_loader_workers=1)
    t = Trainer(NpzDataset(p), cfg)
    t.train()
    assert np.isfinite(t.G_losses).all()
