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
        """Restore the latest checkpoint, or (None, {}) if none exists."""
        step = self._mngr.latest_step()
        if step is None:
            return None, {}
        state = self._mngr.restore(step, args=ocp.args.StandardRestore(template))
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
