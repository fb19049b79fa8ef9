"""Spectral-norm power-iteration dynamics across the fused train step.

The reference updates SN state on EVERY train-mode forward (torch
parametrization hook): per full iteration with iterD=2 —
- G's u/v advance 3 times (one G forward per D step + one in the G phase),
- D's u/v advance 5 times (D(real) + D(fake) per D step + D(G(z)) in the
  G phase).
This test replays the power method manually from the initial state and
checks the fused step advanced the vectors exactly that many times.
(SURVEY §7 hard part 2.)
"""

import numpy as np

import jax
import jax.numpy as jnp

from gan3d_tpu.config import Config
from gan3d_tpu.models import build_models
from gan3d_tpu.nn.layers import _power_iter
from gan3d_tpu.train.state import TrainState, make_optimizer
from gan3d_tpu.train.step import build_train_step


def test_sn_update_counts_per_fused_step():
    cfg = Config(hinge=True, resolution=16, z_size=16, filterG=8, filterD=8,
                 batch_size=4, iterD=2, compute_dtype="float32")
    G, D = build_models(cfg)
    key = jax.random.key(0)
    z0 = jnp.zeros((4, 16))
    gv = jax.jit(G.init)({"params": key}, z0)
    x0 = jnp.zeros((4, 16, 16, 16, 1))
    dv = jax.jit(D.init)({"params": key}, x0)

    g_tx = make_optimizer(cfg.lrG, 0.0, 0.9)
    d_tx = make_optimizer(cfg.lrD, 0.0, 0.9)
    g_state = {k: v for k, v in gv.items() if k != "params"}
    # Re-randomize the SN vectors: init warm-starts them with 15 power
    # iterations (near-stationary), which would make 3 vs 4 steps
    # indistinguishable.
    def rerandom(tree, key):
        leaves, treedef = jax.tree.flatten(tree)
        keys = jax.random.split(key, len(leaves))
        new = [jax.random.normal(k, leaf.shape) /
               jnp.linalg.norm(jax.random.normal(k, leaf.shape))
               for k, leaf in zip(keys, leaves)]
        return jax.tree.unflatten(treedef, new)

    g_state["spectral"] = rerandom(g_state["spectral"], jax.random.key(7))
    # Replace the orthogonally-initialized linear kernel (equal singular
    # values make power iteration stationary after one step) with a random
    # matrix whose iterations are distinguishable.
    g_params = dict(gv["params"])
    g_params["linear"] = dict(g_params["linear"])
    g_params["linear"]["kernel"] = 0.1 * jax.random.normal(
        jax.random.key(9), gv["params"]["linear"]["kernel"].shape)
    gv = {**gv, "params": g_params}
    d_state = {k: v for k, v in dv.items() if k != "params"}
    d_state["spectral"] = rerandom(d_state["spectral"], jax.random.key(8))
    state = TrainState(
        step=jnp.int32(0),
        g_params=gv["params"],
        g_state=g_state,
        g_opt=g_tx.init(gv["params"]),
        d_params=dv["params"],
        d_state=d_state,
        d_opt=d_tx.init(dv["params"]),
    )
    step = jax.jit(build_train_step(cfg, G, D, g_tx, d_tx))
    reals = jnp.zeros((2, 4, 16, 16, 16, 1))
    new_state, _, _ = step(state, reals, jax.random.key(1))

    def check(net_tag, params, s0, s1, mod, expected_iters):
        w = params[mod]["kernel"]
        w_mat = jnp.transpose(w, (4, 3, 0, 1, 2)).reshape(w.shape[-1], -1) \
            if w.ndim == 5 else w.T
        u0 = s0["spectral"][mod]["u"]
        v0 = s0["spectral"][mod]["v"]
        u_exp, v_exp = _power_iter(w_mat.astype(jnp.float32), u0, v0,
                                   expected_iters)
        np.testing.assert_allclose(np.asarray(s1["spectral"][mod]["u"]),
                                   np.asarray(u_exp), atol=1e-5,
                                   err_msg=f"{net_tag}.{mod} u")
        # a clearly-wrong count must NOT match (power iteration converges
        # quickly on these low-rank kernels, so compare against 1 step)
        u_wrong, _ = _power_iter(w_mat.astype(jnp.float32), u0, v0, 1)
        assert not np.allclose(np.asarray(s1["spectral"][mod]["u"]),
                               np.asarray(u_wrong), atol=1e-6), \
            f"{net_tag}.{mod}: 1 iteration also matches (test insensitive)"

    # G's weights don't change during D phases, and the G-phase forward runs
    # BEFORE the G optimizer update — all 3 G-side SN iterations use the
    # original kernel. D's kernel changes after each D update, so exact
    # replay needs per-phase weights; we check the first D step's 2
    # iterations against the initial kernel via an iterD=0-style replay is
    # not possible here — instead assert D state moved and differs from any
    # pure-initial-weight replay count.
    check("G", state.g_params, state.g_state, new_state.g_state,
          "linear", expected_iters=3)
    # D's kernel changes between phases (optimizer updates), so only assert
    # its SN state moved. Use input_conv — the final linear has out=1 where
    # u is trivially +-1.
    d_u0 = state.d_state["spectral"]["input_conv"]["u"]
    d_u1 = new_state.d_state["spectral"]["input_conv"]["u"]
    assert not np.allclose(np.asarray(d_u0), np.asarray(d_u1), atol=1e-7)
