"""256^3 spatial parallelism demonstration (SURVEY §5.7's design goal).

Depth sharding exists so volumes whose activations exceed one chip's HBM
can train across a mesh (the volumetric analog of context parallelism —
reference utils.py:22-45 is the attention SURVEY maps to this). Two modes:

--mode=cpu_parity (default; no TPU needed)
    One fused BigGAN-Deep G+D train step at 256^3 (tiny channels, batch 2)
    on a 4-virtual-device (data=1, space=4) CPU mesh, numerically checked
    against the identical step on one device. This executes the full
    sharded program — halo exchanges for every conv stencil, GSPMD
    reshards around the 32^3 attention, BN cross-shard statistics, both
    backward passes, optimizer updates.

--mode=tpu_infeasible
    AOT-compiles the UNSHARDED 256^3 step on the real chip and reports
    XLA's memory analysis — the record that the config does not fit one
    v5e (16 GB HBM), which is what the (data, space) mesh is for. Tries
    the production channel table first (filters 64), then tiny channels.

Results recorded in docs/PERF.md (round 5) / docs/ROUND5.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cfg(spatial: int, num_devices: int, filters: int = 4, batch: int = 2,
         fused: bool = True, remat: bool = False):
    import tempfile

    from gan3d_tpu.config import Config

    return Config(biggan=True, hinge=True, resolution=256, z_size=16,
                  filterG=filters, filterD=filters, batch_size=batch,
                  iterD=1, compute_dtype="float32", fused_step=fused,
                  remat=remat, remat_scope="stage" if remat else "block",
                  fid_in_loop=False, data_loader_workers=1,
                  num_devices=num_devices, spatial_devices=spatial,
                  log_dir=tempfile.mkdtemp(prefix="sp256_"))


class _Zeros:
    def __init__(self, n, res):
        self.n, self.res = n, res

    def __len__(self):
        return self.n

    def batch(self, idx):
        import numpy as np

        return np.zeros((len(idx), self.res, self.res, self.res), np.float32)


def _one_step(cfg, reals_np):
    """Build a Trainer, run ONE train step on the given reals, return
    (metrics dict of floats, state)."""
    import jax
    import numpy as np  # noqa: F401

    from gan3d_tpu.train.trainer import Trainer

    tr = Trainer(_Zeros(4 * cfg.batch_size, cfg.resolution), cfg)
    reals = jax.device_put(reals_np, tr._batch_in)
    t0 = time.time()
    state, metrics, _ = tr._step(tr.state, reals, tr._base_key, 0)
    m = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    dt = time.time() - t0
    tr.loader.close()
    return m, state, dt


def cpu_parity() -> None:
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=4")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    assert len(jax.devices()) == 4, jax.devices()
    rng = np.random.default_rng(0)
    reals = rng.normal(size=(1, 2, 256, 256, 256, 1)).astype(
        np.float32).clip(-1, 1)

    print("== sharded: (data=1, space=4) mesh ==", flush=True)
    m_sp, state_sp, dt_sp = _one_step(_cfg(spatial=4, num_devices=4), reals)
    print(f"sharded step: {m_sp} ({dt_sp:.1f}s incl. compile)", flush=True)

    print("== unsharded reference: one device ==", flush=True)
    from gan3d_tpu.ops.attention import set_attention_impl

    set_attention_impl(None)
    m_ref, state_ref, dt_ref = _one_step(_cfg(spatial=1, num_devices=1),
                                         reals)
    print(f"unsharded step: {m_ref} ({dt_ref:.1f}s incl. compile)",
          flush=True)

    import jax

    for k in ("d_real", "d_fake", "g_loss"):
        np.testing.assert_allclose(m_sp[k], m_ref[k], rtol=2e-3, atol=2e-3,
                                   err_msg=k)
    # parameter-update parity on a few leaves (covers both optimizers)
    leaves_sp = jax.tree.leaves(jax.device_get(state_sp.g_params))
    leaves_rf = jax.tree.leaves(jax.device_get(state_ref.g_params))
    checked = 0
    for a, b in zip(leaves_sp, leaves_rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)
        checked += 1
    print(f"PARITY OK: losses + {checked} G param leaves match "
          "(halo exchanges, attention reshard, sync-BN, backward, Adam)",
          flush=True)


def tpu_infeasible() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan3d_tpu.models import build_models
    from gan3d_tpu.train.state import TrainState, make_optimizer
    from gan3d_tpu.train.step import build_train_step

    print(jax.devices(), flush=True)
    for filters, batch, remat in ((64, 1, True), (16, 1, True),
                                  (4, 2, False)):
        cfg = _cfg(spatial=1, num_devices=1, filters=filters, batch=batch,
                   remat=remat)
        print(f"== unsharded 256^3 filters={filters} batch={batch} "
              f"remat={remat}: AOT memory analysis ==", flush=True)
        try:
            G, D = build_models(cfg)
            key = jax.random.key(0)
            z0 = jnp.zeros((batch, cfg.z_size), jnp.float32)
            x0 = jnp.zeros((batch, 256, 256, 256, 1), jnp.float32)
            with jax.default_device(jax.devices("cpu")[0]):
                g_vars = jax.jit(G.init)({"params": key}, z0)
                d_vars = jax.jit(D.init)({"params": key}, x0)
            g_tx = make_optimizer(cfg.lrG, cfg.adam_b1, cfg.adam_b2)
            d_tx = make_optimizer(cfg.lrD, cfg.adam_b1, cfg.adam_b2)
            gp = g_vars["params"]
            dp = d_vars["params"]
            state = TrainState(
                step=jnp.int32(0), g_params=gp,
                g_state={k: v for k, v in g_vars.items() if k != "params"},
                g_opt=g_tx.init(gp), d_params=dp,
                d_state={k: v for k, v in d_vars.items() if k != "params"},
                d_opt=d_tx.init(dp), ema_params=None, pl_mean=None)
            step_fn = build_train_step(cfg, G, D, g_tx, d_tx)
            reals = jnp.zeros((cfg.iterD, batch, 256, 256, 256, 1),
                              jnp.float32)
            t0 = time.time()
            lowered = jax.jit(step_fn, donate_argnums=(0,)).lower(
                state, reals, key)
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            print(f"compiled in {time.time() - t0:.0f}s; memory analysis: "
                  f"{ma}", flush=True)
        except Exception as e:  # noqa: BLE001 — the point is the record
            msg = str(e).split("\n")[0][:300]
            print(f"INFEASIBLE on one chip: {type(e).__name__}: {msg}",
                  flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="cpu_parity",
                   choices=["cpu_parity", "tpu_infeasible"])
    a = p.parse_args()
    if a.mode == "cpu_parity":
        cpu_parity()
    else:
        tpu_infeasible()


if __name__ == "__main__":
    main()
