"""Batched-crop 2D reprojection evaluation (BASELINE config 3).

Scores weak-perspective keypoint reprojection on LSP/MPII-style 2D data:
mean L1 reprojection error (normalized crop units) and PCK@thresholds over
visible keypoints. The predictor contract matches the H36M protocol runner
so both evals share CLI plumbing.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.data.preprocess import transform_keypoints
from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
from human_3d_reconstruction_tpu.eval.metrics import keypoint_2d_pck


@dataclass
class Kp2DBatch:
    images: np.ndarray   # (B, H, W, 3) [0,255]
    centers: np.ndarray  # (B, 2)
    scales: np.ndarray   # (B,)
    kp2d: np.ndarray     # (B, 14, 3) source px + vis


@dataclass
class Kp2DReport:
    mean_l1: float
    pck: dict[str, float]
    num_samples: int

    def to_json(self) -> str:
        return json.dumps(
            {"mean_l1": self.mean_l1, "pck": self.pck, "num_samples": self.num_samples},
            indent=2,
        )


def run_kp2d_eval(
    predict_kp2d: Callable[[np.ndarray, np.ndarray, np.ndarray], jax.Array],
    batches: Iterator[Kp2DBatch],
    thresholds: Sequence[float] = (0.05, 0.1, 0.2),
    report_path: Optional[str | Path] = None,
) -> Kp2DReport:
    """predict_kp2d: (images, centers, scales) -> (B, 14, 2) keypoints in
    normalized crop coords ([-1, 1]); GT is mapped into the same frame with
    `transform_keypoints` so the comparison is exact."""
    l1_sum, vis_sum = 0.0, 0.0
    pck_hits = {t: 0.0 for t in thresholds}
    n = 0

    for batch in batches:
        pred = jnp.asarray(predict_kp2d(batch.images, batch.centers, batch.scales))
        gt = jax.vmap(transform_keypoints)(
            jnp.asarray(batch.kp2d[:, :, :2]),
            jnp.asarray(batch.centers),
            jnp.asarray(batch.scales),
        )
        vis = jnp.asarray(batch.kp2d[:, :, 2])
        assert pred.shape == gt.shape == (len(batch.images), NUM_KP, 2)

        err = jnp.sum(jnp.abs(pred - gt), axis=-1)
        mask = (vis > 0).astype(jnp.float32)
        l1_sum += float(jnp.sum(err * mask))
        vis_sum += float(jnp.sum(mask))
        for t in thresholds:
            pck_hits[t] += float(keypoint_2d_pck(pred, gt, vis=vis, threshold=t)) * float(
                jnp.sum(mask)
            )
        n += len(batch.images)

    report = Kp2DReport(
        mean_l1=l1_sum / max(vis_sum, 1.0),
        pck={f"pck@{t}": pck_hits[t] / max(vis_sum, 1.0) for t in thresholds},
        num_samples=n,
    )
    if report_path is not None:
        Path(report_path).write_text(report.to_json())
    return report


def kp2d_batches_from_dataset(dataset, batch_size: int = 64) -> Iterator[Kp2DBatch]:
    """Stream any AnnotationDataset / SyntheticImageDataset as eval batches."""
    from human_3d_reconstruction_tpu.data.datasets import collate

    for start in range(0, len(dataset), batch_size):
        recs = [dataset[i] for i in range(start, min(start + batch_size, len(dataset)))]
        batch = collate(recs)
        yield Kp2DBatch(
            images=batch.images, centers=batch.centers, scales=batch.scales, kp2d=batch.kp2d
        )
