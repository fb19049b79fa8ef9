"""Checkpoint / resume via Orbax.

Reference semantics (trainer.py:128-163): a single rolling checkpoint in
``log_dir/models/`` holding step, both model states, both optimizer states,
and the loss/FID histories; resume is automatic whenever a checkpoint
exists. Here the train-state pytree goes through Orbax (async-capable,
max_to_keep=1) and the scalar histories go to a JSON sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

HISTORY_FILE = "history.json"


def _legacy_adam_template(template: Any) -> Optional[Any]:
    """Rewrite AdamB1ZeroState leaves into optax.ScaleByAdamState (adding a
    zeros mu tree) so a pre-specialization checkpoint's structure matches.
    Returns None when the template contains no AdamB1ZeroState."""
    import jax
    import jax.numpy as jnp
    import optax

    from gan3d_tpu.train.state import AdamB1ZeroState

    found = []

    def conv(x):
        if isinstance(x, AdamB1ZeroState):
            found.append(True)
            return optax.ScaleByAdamState(
                count=x.count, mu=jax.tree.map(jnp.zeros_like, x.nu),
                nu=x.nu)
        return x

    out = jax.tree.map(conv, template,
                       is_leaf=lambda x: isinstance(x, AdamB1ZeroState))
    return out if found else None


def _drop_legacy_mu(state: Any) -> Any:
    """Inverse of _legacy_adam_template on a restored tree: mu is inert at
    b1 = 0, so ScaleByAdamState collapses to AdamB1ZeroState(count, nu)."""
    import jax
    import optax

    from gan3d_tpu.train.state import AdamB1ZeroState

    def conv(x):
        if isinstance(x, optax.ScaleByAdamState):
            return AdamB1ZeroState(count=x.count, nu=x.nu)
        return x

    return jax.tree.map(
        conv, state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))


class CheckpointManager:
    def __init__(self, models_dir: str, max_to_keep: int = 1,
                 async_save: bool = True):
        self.dir = os.path.abspath(models_dir)
        os.makedirs(self.dir, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True,
            enable_async_checkpointing=async_save)
        self._mngr = ocp.CheckpointManager(self.dir, options=opts)

    def save(self, step: int, state: Any, history: Optional[Dict] = None
             ) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if history is not None:
            import jax

            # Multi-process: Orbax coordinates the pytree save internally
            # (every process calls save with the same step); the JSON
            # sidecar is plain file IO, so only the primary writes it.
            if jax.process_index() == 0:
                with open(os.path.join(self.dir, HISTORY_FILE), "w") as f:
                    json.dump(history, f)

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, template: Any) -> Tuple[Optional[Any], Dict]:
        """Restore the latest checkpoint, or (None, {}) if none exists.

        Checkpoints written before the mu-free Adam specialization
        (train/state.py: AdamB1ZeroState) carry optax's full
        ScaleByAdamState (count, mu, nu). With b1 = 0 the stored mu is
        inert (the next update ignores it), so such checkpoints migrate
        losslessly: restore against the legacy template, drop mu.
        """
        step = self._mngr.latest_step()
        if step is None:
            return None, {}
        try:
            state = self._mngr.restore(
                step, args=ocp.args.StandardRestore(template))
        except Exception:
            legacy = _legacy_adam_template(template)
            if legacy is None:  # template has no AdamB1ZeroState leaves
                raise
            state = _drop_legacy_mu(self._mngr.restore(
                step, args=ocp.args.StandardRestore(legacy)))
        history: Dict = {}
        hpath = os.path.join(self.dir, HISTORY_FILE)
        if os.path.isfile(hpath):
            with open(hpath) as f:
                history = json.load(f)
        return state, history

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
