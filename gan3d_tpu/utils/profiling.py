"""Profiling hooks.

Reference: torch.autograd.profiler.record_function scopes inside the
StyleGAN2 code (stylegan.py:26, 43-94, 365-386) that light up only under an
external profiler (SURVEY §5.1). TPU equivalent: `jax.named_scope` at the
same phase boundaries (visible in XLA HLO and xprof traces) plus an
opt-in per-run trace window written by `jax.profiler`.

Usage: set cfg.profile_dir; the Trainer captures steps
[PROFILE_START, PROFILE_START + PROFILE_STEPS) into that directory, viewable
with xprof/tensorboard.
"""

from __future__ import annotations

import contextlib

import jax

PROFILE_START = 5
PROFILE_STEPS = 5


class StepProfiler:
    """Host-side trace window around a range of training steps."""

    def __init__(self, profile_dir: str, start: int = PROFILE_START,
                 num_steps: int = PROFILE_STEPS):
        self.dir = profile_dir
        self.start = start
        self.stop = start + num_steps
        self._active = False

    def step(self, i: int) -> None:
        if not self.dir:
            return
        if i == self.start and not self._active:
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif i >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def scope(name: str):
    """Named scope matching the reference's record_function boundaries."""
    return jax.named_scope(name)


@contextlib.contextmanager
def null_scope():
    yield
