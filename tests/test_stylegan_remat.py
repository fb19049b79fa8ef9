"""StyleGAN2 cfg.remat (per-block nn.remat in SynthesisNetwork and
Discriminator) must be a pure memory knob: identical parameter trees,
forward numerics, and gradients vs remat off.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gan3d_tpu.config import Config
from gan3d_tpu.models import build_models


def _build(**kw):
    cfg = Config(stylegan2=True, resolution=16, z_size=16, filterG=128,
                 filterD=128, batch_size=2, compute_dtype="float32", **kw)
    G, D = build_models(cfg)
    z = jax.random.normal(jax.random.key(1), (2, 16))
    # const noise: deterministic forward regardless of rng lifting
    gv = jax.jit(G.init, static_argnames="noise_mode")(
        {"params": jax.random.key(0)}, z, noise_mode="const")
    fake, _ = G.apply(gv, z, train=True, noise_mode="const")
    dv = jax.jit(D.init)({"params": jax.random.key(0)}, fake)
    d_out = D.apply(dv, fake)

    g_extra = {k: v for k, v in gv.items() if k != "params"}

    def loss(gp, dp, zz):
        f, _ = G.apply({"params": gp, **g_extra}, zz, train=True,
                       noise_mode="const")
        return jnp.sum(D.apply({"params": dp}, f).astype(jnp.float32))

    g_grads, d_grads = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        gv["params"], dv["params"], z)
    gsum = lambda t: float(jax.tree_util.tree_reduce(  # noqa: E731
        lambda a, b: a + jnp.sum(jnp.abs(b.astype(jnp.float32))), t, 0.0))
    return (jax.tree_util.tree_structure(gv), jax.tree_util.tree_structure(dv),
            np.asarray(fake), np.asarray(d_out), gsum(g_grads), gsum(d_grads))


def test_stylegan_remat_identical_trees_and_numerics():
    ref = _build(remat=False)
    got = _build(remat=True)
    assert got[0] == ref[0], "G param tree changed under remat"
    assert got[1] == ref[1], "D param tree changed under remat"
    np.testing.assert_allclose(got[2], ref[2], atol=1e-6)
    np.testing.assert_allclose(got[3], ref[3], atol=1e-4)
    np.testing.assert_allclose(got[4], ref[4], rtol=1e-5)
    np.testing.assert_allclose(got[5], ref[5], rtol=1e-5)


def test_stylegan_remat_random_noise_runs():
    """nn.remat with a lifted per-layer noise rng must still trace/run."""
    cfg = Config(stylegan2=True, resolution=16, z_size=16, filterG=128,
                 filterD=128, batch_size=2, compute_dtype="float32",
                 remat=True)
    G, _ = build_models(cfg)
    z = jax.random.normal(jax.random.key(1), (2, 16))
    gv = jax.jit(G.init)({"params": jax.random.key(0)}, z)
    img, _ = G.apply(gv, z, train=True, noise_mode="random",
                     rngs={"noise": jax.random.key(2)})
    assert np.isfinite(np.asarray(img)).all()
