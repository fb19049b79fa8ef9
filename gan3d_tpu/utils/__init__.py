"""Shared utilities: PRNG threading, dtype policy, tree helpers."""

from gan3d_tpu.utils.prng import PRNG, fold_step
from gan3d_tpu.utils.policy import Policy

__all__ = ["PRNG", "fold_step", "Policy"]
