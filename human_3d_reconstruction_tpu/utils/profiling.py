"""Profiling / timing / debugging harness (SURVEY.md section 5 "Tracing").

The reference logs wall-clock prints + optional TensorBoard scalars; here:
- `timeit`: steady-state timing with device sync via scalar READBACK — on
  the tunneled axon platform `block_until_ready` can return before the
  computation finishes (measured in bring-up: a 36 ms program "timed" at
  0.5 ms), so every timing in this framework syncs by pulling one scalar.
- `trace`: jax.profiler wrapper producing TensorBoard-loadable traces.
- `enable_nan_debugging`: dev-mode NaN checks (the race-detector equivalent
  for a single-process numerical program — SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


def sync(tree) -> float:
    """Force completion of a device computation; returns a scalar checksum."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    total = 0.0
    for leaf in leaves[:1]:  # one readback is enough to serialize
        total += float(jnp.asarray(leaf).ravel()[0])
    return total


@dataclass
class Timing:
    mean_s: float
    p50_s: float
    p90_s: float
    reps: int

    @property
    def mean_ms(self) -> float:
        return self.mean_s * 1e3


def timeit(fn: Callable[[], object], reps: int = 20, warmup: int = 3) -> Timing:
    """Steady-state latency of `fn` (readback-synced each rep)."""
    for _ in range(warmup):
        sync(fn())
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return Timing(
        mean_s=sum(samples) / reps,
        p50_s=samples[reps // 2],
        p90_s=samples[min(reps - 1, int(reps * 0.9))],
        reps=reps,
    )


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block (TensorBoard-loadable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging() -> None:
    """Fail fast on NaNs in every jitted computation (dev mode only —
    disables some fusion; never leave on in production runs)."""
    jax.config.update("jax_debug_nans", True)


def disable_nan_debugging() -> None:
    jax.config.update("jax_debug_nans", False)
