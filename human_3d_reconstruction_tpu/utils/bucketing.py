"""Bucketed padding for variable person counts (SURVEY.md section 7
"Hard parts": variable N must not retrace/recompile per frame).

A frame with N detections is padded to the next bucket size; one compiled
program exists per bucket, and masks keep padded persons out of every
metric/loss. With the default buckets a video stream compiles at most 8
programs regardless of crowd size.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def bucket_size(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= n; raises when n exceeds the largest bucket.

    Callers that must serve arbitrary N chunk into largest-bucket batches
    (MeshRecoverySession does); silently capping here would hand back a
    mask shorter than the padded arrays.
    """
    if n <= 0:
        raise ValueError(f"need at least one person, got {n}")
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(
        f"{n} persons exceeds the largest bucket {buckets[-1]}; "
        "chunk the request into batches of at most that size"
    )


def pad_people(
    arrays: dict[str, np.ndarray],
    n_valid: int,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """Pad every array's leading (person) axis to the bucket size.

    Padding replicates person 0 (keeps values in-distribution so padded
    lanes can't produce NaNs that poison reductions); the returned mask is
    1.0 for real persons.
    """
    b = bucket_size(n_valid, buckets)
    out = {}
    for key, arr in arrays.items():
        arr = np.asarray(arr)
        if arr.shape[0] != n_valid:
            raise ValueError(f"{key}: leading dim {arr.shape[0]} != n_valid {n_valid}")
        if b > n_valid:
            pad = np.repeat(arr[:1], b - n_valid, axis=0)
            arr = np.concatenate([arr, pad], axis=0)
        out[key] = arr
    mask = np.zeros((b,), np.float32)
    mask[:n_valid] = 1.0
    return out, mask
