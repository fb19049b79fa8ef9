"""Optional energy/carbon estimation.

Reference: carbontracker is imported and wired but commented out
(reference: trainer.py:6, 93, 297, 304, 311). TPUs expose no public
per-process power counters, so this tracker estimates energy as
active-train-time x a per-chip power figure (configurable; defaults to
public TPU spec sheets' typical draw) and converts to CO2e with a
configurable grid intensity. Opt-in via cfg.track_energy; writes
``log_dir/energy.json`` alongside the checkpoints.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

# Typical per-chip power draw (W) — public spec-sheet figures.
CHIP_WATTS = {
    "tpu v4": 170.0,
    "tpu v5 lite": 140.0,   # v5e
    "tpu v5": 250.0,        # v5p
    "cpu": 65.0,
}
DEFAULT_WATTS = 200.0
DEFAULT_G_CO2_PER_KWH = 420.0  # world-average grid intensity


def _device_watts() -> float:
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # noqa: BLE001
        return DEFAULT_WATTS
    for key, w in CHIP_WATTS.items():
        if key in kind:
            return w
    return DEFAULT_WATTS


@dataclass
class EnergyTracker:
    enabled: bool = False
    n_chips: int = 1
    watts_per_chip: float = field(default_factory=_device_watts)
    g_co2_per_kwh: float = DEFAULT_G_CO2_PER_KWH
    _t0: float = 0.0
    _active_s: float = 0.0

    def epoch_start(self) -> None:
        if self.enabled:
            self._t0 = time.perf_counter()

    def epoch_end(self) -> None:
        if self.enabled and self._t0:
            self._active_s += time.perf_counter() - self._t0
            self._t0 = 0.0

    @property
    def kwh(self) -> float:
        return self._active_s * self.watts_per_chip * self.n_chips / 3.6e6

    def summary(self) -> dict:
        return {
            "active_seconds": round(self._active_s, 3),
            "chips": self.n_chips,
            "watts_per_chip_estimate": self.watts_per_chip,
            "kwh_estimate": round(self.kwh, 6),
            "g_co2e_estimate": round(self.kwh * self.g_co2_per_kwh, 3),
        }

    def write(self, log_dir: str) -> None:
        if self.enabled:
            with open(os.path.join(log_dir, "energy.json"), "w") as f:
                json.dump(self.summary(), f, indent=2)
