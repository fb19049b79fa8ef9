"""The b1=0 Adam specialization (train/state.py) is bit-identical to
optax.adam.

The reference trains every family with Adam(betas=(0., 0.9))
(trainer.py:77-78); make_optimizer exploits b1 == 0 by dropping the first
moment (mu == g exactly) — this pins that the update stream matches
optax.adam(b1=0) bitwise over many steps, and that b1 != 0 still routes to
optax.adam.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gan3d_tpu.train.state import make_optimizer


def _tree(seed):
    k = jax.random.key(seed)
    ks = jax.random.split(k, 4)
    return {
        "conv": {"kernel": jax.random.normal(ks[0], (3, 3, 3, 4, 8)),
                 "bias": jax.random.normal(ks[1], (8,))},
        "dense": {"kernel": jax.random.normal(ks[2], (16, 4)) * 10.0,
                  "bias": jax.random.normal(ks[3], (4,)) * 1e-3},
    }


@pytest.mark.parametrize("lr,b2", [(5e-5, 0.9), (1e-4, 0.999)])
def test_b1zero_bitwise_matches_optax_adam(lr, b2):
    params = _tree(0)
    ours = make_optimizer(lr, 0.0, b2)
    ref = optax.adam(learning_rate=lr, b1=0.0, b2=b2, eps=1e-8)
    s_ours, s_ref = ours.init(params), ref.init(params)
    p_ours = p_ref = params

    @jax.jit
    def step_ours(g, s, p):
        u, s = ours.update(g, s, p)
        return optax.apply_updates(p, u), s

    @jax.jit
    def step_ref(g, s, p):
        u, s = ref.update(g, s, p)
        return optax.apply_updates(p, u), s

    for i in range(1, 8):
        grads = jax.tree.map(
            lambda p, _i=i: p * (0.1 * _i) + jnp.sin(p * _i), params)
        p_ours, s_ours = step_ours(grads, s_ours, p_ours)
        p_ref, s_ref = step_ref(grads, s_ref, p_ref)
    for a, b in zip(jax.tree_util.tree_leaves(p_ours),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_b1zero_state_has_no_mu():
    params = _tree(1)
    tx = make_optimizer(1e-4, 0.0, 0.9)
    st = tx.init(params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    n_opt = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(st))
    # nu tree + count only: no second param-sized tree.
    assert n_opt == n_params + 1


def test_nonzero_b1_falls_back_to_adam():
    params = _tree(2)
    ours = make_optimizer(1e-4, 0.5, 0.9)
    ref = optax.adam(learning_rate=1e-4, b1=0.5, b2=0.9, eps=1e-8)
    grads = jax.tree.map(lambda p: p * 0.1, params)
    u1, _ = ours.update(grads, ours.init(params), params)
    u2, _ = ref.update(grads, ref.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(u1),
                    jax.tree_util.tree_leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_checkpoint_migrates_to_mu_free_state(tmp_path):
    """A checkpoint written with the pre-specialization optimizer state
    (optax.adam's ScaleByAdamState, WITH mu) must restore into the current
    AdamB1ZeroState template: mu is inert at b1=0, so resume is lossless."""
    from gan3d_tpu.train.checkpoint import CheckpointManager
    from gan3d_tpu.train.state import AdamB1ZeroState

    params = _tree(0)
    legacy_tx = optax.adam(learning_rate=1e-3, b1=0.0, b2=0.9, eps=1e-8)
    legacy_state = legacy_tx.init(params)
    # advance a few steps so count/nu are nonzero
    g = _tree(1)
    for _ in range(3):
        _, legacy_state = legacy_tx.update(g, legacy_state, params)
    mgr = CheckpointManager(str(tmp_path / "models"), async_save=False)
    mgr.save(7, {"opt": legacy_state, "params": params})
    mgr.wait()

    new_tx = make_optimizer(1e-3, 0.0, 0.9)
    template = {"opt": new_tx.init(params), "params": params}
    restored, _ = mgr.restore(template)
    mgr.close()

    moment = restored["opt"][0]
    assert isinstance(moment, AdamB1ZeroState)
    legacy_moment = legacy_state[0]
    assert int(moment.count) == int(legacy_moment.count)
    for a, b in zip(jax.tree.leaves(moment.nu),
                    jax.tree.leaves(legacy_moment.nu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the next update stream continues identically
    up_new, _ = new_tx.update(g, restored["opt"], params)
    up_old, _ = legacy_tx.update(g, legacy_state, params)
    for a, b in zip(jax.tree.leaves(up_new), jax.tree.leaves(up_old)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mu_free_false_forces_plain_adam():
    tx = make_optimizer(1e-3, 0.0, 0.9, mu_free=False)
    st = tx.init(_tree(0))
    assert isinstance(st[0], optax.ScaleByAdamState)
