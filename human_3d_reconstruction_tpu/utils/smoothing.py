"""Temporal smoothing for video-stream mesh recovery (One-Euro filter).

Production-serving helper: per-frame HMR estimates jitter; the One-Euro
filter (Casiez et al. 2012) removes it with speed-adaptive cutoff — slow
motion gets heavy smoothing, fast motion follows instantly. Applied to the
85-d parameter stream (theta/beta/cam), not the mesh, so one filter state
per tracked person is tiny.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def _alpha(cutoff: np.ndarray | float, dt: float) -> np.ndarray:
    tau = 1.0 / (2.0 * np.pi * np.asarray(cutoff, np.float64))
    return (1.0 / (1.0 + tau / dt)).astype(np.float32)


@dataclasses.dataclass
class OneEuroFilter:
    """Vector One-Euro filter; call with successive samples."""

    min_cutoff: float = 1.0   # Hz; lower = smoother at rest
    beta: float = 0.3         # speed coefficient; higher = snappier
    d_cutoff: float = 1.0     # derivative smoothing cutoff
    _x_prev: Optional[np.ndarray] = None
    _dx_prev: Optional[np.ndarray] = None

    def reset(self) -> None:
        self._x_prev = None
        self._dx_prev = None

    def __call__(self, x: np.ndarray, dt: float = 1.0 / 30.0) -> np.ndarray:
        x = np.asarray(x, np.float32)
        if self._x_prev is None:
            self._x_prev = x
            self._dx_prev = np.zeros_like(x)
            return x

        dx = (x - self._x_prev) / dt
        a_d = _alpha(self.d_cutoff, dt)
        dx_hat = a_d * dx + (1 - a_d) * self._dx_prev

        cutoff = self.min_cutoff + self.beta * np.abs(dx_hat)
        a = _alpha(cutoff, dt)
        x_hat = a * x + (1 - a) * self._x_prev

        self._x_prev = x_hat
        self._dx_prev = dx_hat
        return x_hat


class ParamSmoother:
    """Per-person One-Euro smoothing of the (theta, beta, cam) stream.

    Track IDs are caller-assigned (detector/tracker side); unseen IDs get a
    fresh filter, stale IDs can be dropped with `forget`.
    """

    def __init__(self, min_cutoff: float = 1.0, beta: float = 0.3):
        self.min_cutoff = min_cutoff
        self.beta = beta
        self._filters: dict[int, OneEuroFilter] = {}

    def smooth(
        self, track_id: int, theta: np.ndarray, beta: np.ndarray, cam: np.ndarray,
        dt: float = 1.0 / 30.0,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        f = self._filters.setdefault(
            track_id, OneEuroFilter(min_cutoff=self.min_cutoff, beta=self.beta)
        )
        packed = np.concatenate([theta, beta, cam]).astype(np.float32)
        out = f(packed, dt=dt)
        return out[:72], out[72:82], out[82:85]

    def forget(self, track_id: int) -> None:
        self._filters.pop(track_id, None)
