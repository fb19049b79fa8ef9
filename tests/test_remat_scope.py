"""remat_scope="stage" (per-stage jax.checkpoint groups with the G out-head
and D input-conv folded in — config.remat_scope) must be a pure memory
knob: identical parameter trees and numerics vs remat off / per-block.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gan3d_tpu.config import Config
from gan3d_tpu.models import build_models


def _build(**kw):
    cfg = Config(biggan=True, hinge=True, resolution=16, filterG=8,
                 filterD=8, z_size=16, batch_size=2,
                 compute_dtype="float32", **kw)
    G, D = build_models(cfg)
    z = jax.random.normal(jax.random.key(1), (2, 16))
    gv = jax.jit(G.init)({"params": jax.random.key(0)}, z)
    fake = G.apply(gv, z, train=True,
                   mutable=["batch_stats", "spectral"])[0]
    dv = jax.jit(D.init)({"params": jax.random.key(0)}, fake)
    d_out = D.apply(dv, fake, mutable=["spectral"])[0]

    def loss(p, extra, zz):
        f, _ = G.apply({"params": p, **extra}, zz, train=True,
                       mutable=["batch_stats", "spectral"])
        return jnp.sum(f.astype(jnp.float32))

    extra = {k: v for k, v in gv.items() if k != "params"}
    grads = jax.jit(jax.grad(loss))(gv["params"], extra, z)
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b.astype(jnp.float32))), grads, 0.0))
    return (jax.tree_util.tree_structure(gv), jax.tree_util.tree_structure(dv),
            np.asarray(fake), np.asarray(d_out), gnorm)


def test_remat_scopes_identical_trees_and_numerics():
    ref = _build(remat=False)
    for scope in ("block", "stage"):
        got = _build(remat=True, remat_scope=scope)
        assert got[0] == ref[0], f"G param tree changed under {scope}"
        assert got[1] == ref[1], f"D param tree changed under {scope}"
        np.testing.assert_allclose(got[2], ref[2], atol=1e-6)
        np.testing.assert_allclose(got[3], ref[3], atol=1e-4)
        np.testing.assert_allclose(got[4], ref[4], rtol=1e-5)
