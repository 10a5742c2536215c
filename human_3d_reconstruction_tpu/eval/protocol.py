"""Human3.6M-style evaluation protocol (BASELINE config 4).

Reference parity (SURVEY.md section 3.4): per-frame batched inference over
the eval set, 14-joint LSP-subset comparison, root-aligned MPJPE and
Procrustes-aligned PA-MPJPE in millimetres, aggregated per action and
overall. The whole scoring path (projection-free; 3D only) runs on device;
only decode/batching is host-side.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
from human_3d_reconstruction_tpu.eval.metrics import (
    auc3d,
    joint_errors_mm,
    mpjpe,
    pa_mpjpe,
    pck3d,
    pelvis_align,
)

H36M_EVAL_ACTIONS = (
    "Directions", "Discussion", "Eating", "Greeting", "Phoning", "Photo",
    "Posing", "Purchases", "Sitting", "SittingDown", "Smoking", "Waiting",
    "WalkDog", "Walking", "WalkTogether",
)


def unflip_joints3d(joints: jax.Array) -> jax.Array:
    """Map LSP-14 3D joints predicted from a horizontally MIRRORED crop back
    to the original frame: negate x (the weak-perspective camera aligns
    model x with crop x) and swap left/right joint labels. Involution:
    unflip(unflip(j)) == j. The flip-averaged eval (cli.eval --flip_eval,
    the HMR/SPIN-family test-time trick) averages the direct prediction
    with the un-flipped mirrored one."""
    from human_3d_reconstruction_tpu.data.skeleton import LSP_FLIP_MAP

    signs = jnp.asarray([-1.0, 1.0, 1.0], joints.dtype)
    return joints[..., jnp.asarray(LSP_FLIP_MAP), :] * signs


@dataclass
class EvalBatch:
    images: np.ndarray    # (B, H, W, 3) [0,255] raw frames
    centers: np.ndarray   # (B, 2)
    scales: np.ndarray    # (B,)
    gt_joints3d: np.ndarray  # (B, 14, 3) meters, root-relative
    actions: np.ndarray   # (B,) int indices into the action table
    kp2d: Optional[np.ndarray] = None  # (B, 14, 3) source px + vis; enables
    # SMPLify-style test-time refinement during eval (--fit_steps)
    n_valid: Optional[int] = None  # real frames; the tail batch of an eval
    # set is padded to the full batch size so ONE compiled program serves
    # the whole run (a recompile costs minutes on the tunneled platform)


@dataclass
class EvalReport:
    mpjpe_mm: float
    pa_mpjpe_mm: float
    per_action: dict[str, dict[str, float]]
    num_frames: int
    # MPI-INF-3DHP protocol metrics (computed over the same stream):
    pck3d_150: float = float("nan")
    auc3d: float = float("nan")
    # Bridging metric: the r1-r3 LEGACY rooting (LSP-14 joint 0 = right
    # ankle) scored in the same pass, so any checkpoint's pelvis-rooted
    # headline stays comparable to the pre-r4 BASELINE history. Never the
    # headline — published protocols are pelvis-rooted.
    mpjpe_ankle_rooted_mm: float = float("nan")

    def to_json(self) -> str:
        return json.dumps(
            {
                "mpjpe_mm": self.mpjpe_mm,
                "pa_mpjpe_mm": self.pa_mpjpe_mm,
                "pck3d_150": self.pck3d_150,
                "auc3d": self.auc3d,
                "mpjpe_ankle_rooted_mm": self.mpjpe_ankle_rooted_mm,
                "per_action": self.per_action,
                "num_frames": self.num_frames,
            },
            indent=2,
        )

    def table(self) -> str:
        """Human-readable per-action table (the reference prints one)."""
        lines = [f"{'action':<14} {'MPJPE(mm)':>10} {'PA-MPJPE(mm)':>13} {'frames':>7}"]
        for name, row in sorted(self.per_action.items()):
            lines.append(
                f"{name:<14} {row['mpjpe_mm']:>10.1f} {row['pa_mpjpe_mm']:>13.1f} "
                f"{int(row['frames']):>7}"
            )
        lines.append(
            f"{'ALL':<14} {self.mpjpe_mm:>10.1f} {self.pa_mpjpe_mm:>13.1f} "
            f"{self.num_frames:>7}"
        )
        lines.append(
            f"3DHP protocol: PCK3D@150mm {self.pck3d_150:.3f}  AUC {self.auc3d:.3f}"
        )
        lines.append(
            "bridge (legacy r1-r3 ankle rooting): MPJPE "
            f"{self.mpjpe_ankle_rooted_mm:.1f} mm"
        )
        return "\n".join(lines)


def run_protocol(
    predict_joints: Callable[..., jax.Array],
    batches: Iterator[EvalBatch],
    actions: Sequence[str] = H36M_EVAL_ACTIONS,
    report_path: Optional[str | Path] = None,
) -> EvalReport:
    """Score a predictor over an eval stream.

    Args:
        predict_joints: (images, centers, scales) -> (B, 14, 3) predicted
            3D joints (meters) — typically preprocess+HMR+SMPL jitted. A
            predictor may also accept a keyword-only `batch` (the full
            EvalBatch) for test-time refinement against its 2D keypoints;
            it is passed when the callable declares it.
        batches: EvalBatch iterator (one pass).
    """
    import inspect

    wants_batch = "batch" in inspect.signature(predict_joints).parameters
    per_action_err: dict[int, list[tuple[float, float, int]]] = {}
    all_joint_errs: list[np.ndarray] = []
    all_ankle: list[float] = []
    total_frames = 0

    # Per-sample device metric fns (jitted once; shapes are static per batch).
    @jax.jit
    def score(pred, gt):
        # per-sample errors so action bucketing stays exact. Root alignment
        # is at the pelvis proxy (LSP-14 hip midpoint, metrics.pelvis_align)
        # per the published H36M/3DHP protocols — LSP-14 index 0 is the
        # right ankle, and ankle-rooting inflates distal-joint errors
        # differently from every published number (ADVICE r3). PA-MPJPE is
        # alignment-invariant (Procrustes re-centers).
        def one(p, g):
            p_pel, g_pel = pelvis_align(p), pelvis_align(g)
            return (
                mpjpe(p_pel[None], g_pel[None], root_index=None) * 1000.0,
                pa_mpjpe(p[None], g[None]) * 1000.0,
                joint_errors_mm(p_pel, g_pel, root_index=None),  # (K,) -> 3DHP
                # legacy ankle rooting (joint 0) — the bridging metric only
                mpjpe(p[None], g[None], root_index=0) * 1000.0,
            )

        return jax.vmap(one)(pred, gt)

    for batch in batches:
        if wants_batch:
            pred = predict_joints(batch.images, batch.centers, batch.scales, batch=batch)
        else:
            pred = predict_joints(batch.images, batch.centers, batch.scales)
        pred = jnp.asarray(pred)
        gt = jnp.asarray(batch.gt_joints3d)
        assert pred.shape == gt.shape == (len(batch.actions), NUM_KP, 3), (
            pred.shape,
            gt.shape,
        )
        e_mpjpe, e_pa, e_joints, e_ankle = jax.device_get(score(pred, gt))
        n = len(batch.actions) if batch.n_valid is None else batch.n_valid
        for i, act in enumerate(batch.actions[:n]):
            per_action_err.setdefault(int(act), []).append(
                (float(e_mpjpe[i]), float(e_pa[i]), 1)
            )
        all_joint_errs.append(np.asarray(e_joints[:n]))
        all_ankle.extend(float(x) for x in e_ankle[:n])
        total_frames += n

    per_action = {}
    all_mpjpe, all_pa = [], []
    for act_idx, rows in sorted(per_action_err.items()):
        m = float(np.mean([r[0] for r in rows]))
        p = float(np.mean([r[1] for r in rows]))
        name = actions[act_idx] if act_idx < len(actions) else f"action{act_idx}"
        per_action[name] = {"mpjpe_mm": m, "pa_mpjpe_mm": p, "frames": len(rows)}
        all_mpjpe.extend(r[0] for r in rows)
        all_pa.extend(r[1] for r in rows)

    if all_joint_errs:
        errs = np.concatenate(all_joint_errs)  # (N, K) mm
        pck = float(np.asarray(pck3d(errs)))
        auc = float(np.asarray(auc3d(errs)))
    else:
        pck = auc = float("nan")
    report = EvalReport(
        mpjpe_mm=float(np.mean(all_mpjpe)) if all_mpjpe else float("nan"),
        pa_mpjpe_mm=float(np.mean(all_pa)) if all_pa else float("nan"),
        per_action=per_action,
        num_frames=total_frames,
        pck3d_150=pck,
        auc3d=auc,
        mpjpe_ankle_rooted_mm=(
            float(np.mean(all_ankle)) if all_ankle else float("nan")
        ),
    )
    if report_path is not None:
        Path(report_path).write_text(report.to_json())
    return report


def synthetic_eval_batches(
    smpl_model, num_batches: int = 4, batch_size: int = 8, seed: int = 0
) -> Iterator[EvalBatch]:
    """Synthetic H36M-style eval stream (no real data in this image)."""
    from human_3d_reconstruction_tpu.data.datasets import SyntheticImageDataset

    ds = SyntheticImageDataset(
        smpl_model, n=num_batches * batch_size, frame_hw=(256, 256), seed=seed
    )
    rng = np.random.default_rng(seed)
    for b in range(num_batches):
        idx = range(b * batch_size, (b + 1) * batch_size)
        recs = [ds[i] for i in idx]
        yield EvalBatch(
            images=np.stack([r.image for r in recs]),
            centers=np.stack([r.center for r in recs]),
            scales=np.stack([r.scale for r in recs]),
            gt_joints3d=np.stack([r.joints3d for r in recs]),
            actions=rng.integers(0, len(H36M_EVAL_ACTIONS), size=batch_size),
            kp2d=np.stack([r.kp2d for r in recs]),
        )


def load_eval_batches(
    index_path: str | Path, batch_size: int = 64
) -> Iterator[EvalBatch]:
    """Stream eval batches from an h36m-style npz index (see datasets.py)."""
    from human_3d_reconstruction_tpu.data.datasets import Human36MDataset, collate

    ds = Human36MDataset(index_path)
    z = np.load(str(index_path), allow_pickle=True)
    actions = (
        z["actions"].astype(np.int64)
        if "actions" in z
        else np.zeros(len(ds), np.int64)
    )
    for start in range(0, len(ds), batch_size):
        idx = list(range(start, min(start + batch_size, len(ds))))
        recs = [ds[i] for i in idx]
        n_valid = len(recs)
        # Pad the ragged tail to the full batch (replicating the last record
        # keeps values in-distribution) so the predictor and scorer compile
        # exactly once for the whole eval set; run_protocol drops the pads.
        recs.extend(recs[-1] for _ in range(batch_size - n_valid))
        batch = collate(recs)
        acts = actions[idx]
        acts = np.concatenate([acts, np.repeat(acts[-1:], batch_size - n_valid)])
        yield EvalBatch(
            images=batch.images,
            centers=batch.centers,
            scales=batch.scales,
            gt_joints3d=batch.joints3d,
            actions=acts,
            kp2d=batch.kp2d,
            n_valid=n_valid,
        )
