"""3D pose evaluation metrics, pure JAX (jit/vmap-able, TPU-resident).

Reference parity: the reference's eval harness computes MPJPE (root-aligned,
mm) and PA-MPJPE (after per-sample Procrustes alignment) on the Human3.6M
protocol — `compute_error` / `compute_error_pa` (SURVEY.md section 2 "Eval
harness", section 3.4). Here both metrics run batched on device: the
Procrustes solve is a closed-form similarity-transform fit via one 3x3 SVD
per sample (vmapped), so whole-eval-set scoring is a single jitted program.

All math f32 with HIGHEST matmul precision — metric values feed the 1e-3
parity bar.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def root_align(joints: jax.Array, root_index: int = 0) -> jax.Array:
    """Subtract the root joint: (..., J, 3) -> root-relative coordinates."""
    return joints - joints[..., root_index : root_index + 1, :]


# LSP-14 hip slots (data/skeleton.py::LSP_14: 2=r_hip, 3=l_hip). Their
# midpoint is the standard pelvis proxy for root alignment when the joint
# set carries no explicit pelvis — LSP-14 index 0 is the RIGHT ANKLE, so
# rooting there deviates from the published H36M/3DHP protocols (which
# align at the pelvis) and inflates distal-joint errors asymmetrically.
LSP14_HIP_INDICES = (2, 3)


def pelvis_align(
    joints: jax.Array, hip_indices: tuple[int, int] = LSP14_HIP_INDICES
) -> jax.Array:
    """Subtract the hip midpoint (pelvis proxy): (..., J, 3) -> pelvis-relative."""
    l, r = hip_indices
    pelvis = (
        joints[..., l : l + 1, :] + joints[..., r : r + 1, :]
    ) * 0.5
    return joints - pelvis


def mpjpe(
    pred: jax.Array,
    gt: jax.Array,
    mask: Optional[jax.Array] = None,
    root_index: Optional[int] = 0,
) -> jax.Array:
    """Mean per-joint position error.

    Args:
        pred, gt: (..., J, 3) joint positions (same unit; we keep meters —
            multiply by 1000 for the conventional mm report).
        mask: optional (..., J) validity mask (1 = count this joint).
        root_index: joint index for root alignment, or None to skip.

    Returns:
        scalar mean error over all valid joints in the batch.
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    if root_index is not None:
        pred = root_align(pred, root_index)
        gt = root_align(gt, root_index)
    err = jnp.linalg.norm(pred - gt, axis=-1)  # (..., J)
    if mask is None:
        return jnp.mean(err)
    mask = mask.astype(jnp.float32)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _procrustes_single(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Closed-form similarity transform: align pred (J,3) onto gt (J,3).

    Umeyama's method: center both, take SVD of the 3x3 cross-covariance,
    fix reflection via det sign, scale = trace(DS)/var(pred).
    Returns the aligned prediction (J, 3).
    """
    mu_p = jnp.mean(pred, axis=0, keepdims=True)
    mu_g = jnp.mean(gt, axis=0, keepdims=True)
    xp = pred - mu_p
    xg = gt - mu_g

    var_p = jnp.sum(xp * xp)
    K = jnp.matmul(xp.T, xg, precision=_HI)  # (3, 3)
    U, S, Vt = jnp.linalg.svd(K)
    # Reflection guard: force det(R) = +1.
    sign = jnp.sign(jnp.linalg.det(jnp.matmul(Vt.T, U.T, precision=_HI)))
    D = jnp.diag(jnp.stack([1.0, 1.0, sign]).astype(jnp.float32))
    R = jnp.matmul(jnp.matmul(Vt.T, D, precision=_HI), U.T, precision=_HI)
    scale = jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_p, 1e-12)
    t = mu_g - scale * jnp.matmul(mu_p, R.T, precision=_HI)
    return scale * jnp.matmul(pred, R.T, precision=_HI) + t


def procrustes_align(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Batched similarity alignment of pred onto gt: (..., J, 3) each."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    batch_shape = pred.shape[:-2]
    flat_p = pred.reshape(-1, *pred.shape[-2:])
    flat_g = gt.reshape(-1, *gt.shape[-2:])
    aligned = jax.vmap(_procrustes_single)(flat_p, flat_g)
    return aligned.reshape(*batch_shape, *pred.shape[-2:])


def pa_mpjpe(
    pred: jax.Array, gt: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """Procrustes-aligned MPJPE (a.k.a. reconstruction error)."""
    aligned = procrustes_align(pred, gt)
    return mpjpe(aligned, gt, mask=mask, root_index=None)


def keypoint_2d_pck(
    pred2d: jax.Array,
    gt2d: jax.Array,
    vis: Optional[jax.Array] = None,
    threshold: float = 0.05,
) -> jax.Array:
    """PCK: fraction of visible 2D keypoints within `threshold` (crop units).

    Used by the batched-crop reprojection eval (BASELINE config 3).
    """
    dist = jnp.linalg.norm(pred2d - gt2d, axis=-1)  # (..., K)
    correct = (dist < threshold).astype(jnp.float32)
    if vis is None:
        return jnp.mean(correct)
    vis = vis.astype(jnp.float32)
    return jnp.sum(correct * vis) / jnp.maximum(jnp.sum(vis), 1.0)


def joint_errors_mm(
    pred: jax.Array, gt: jax.Array, root_index: Optional[int] = 0
) -> jax.Array:
    """Per-joint position errors in mm: (..., J, 3) meters -> (..., J).

    Root-aligned like MPJPE; the per-joint form feeds the MPI-INF-3DHP
    protocol's threshold metrics below.
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    if root_index is not None:
        pred = root_align(pred, root_index)
        gt = root_align(gt, root_index)
    return jnp.linalg.norm(pred - gt, axis=-1) * 1000.0


def pck3d(errors_mm: jax.Array, threshold_mm: float = 150.0) -> jax.Array:
    """MPI-INF-3DHP 3D-PCK: fraction of joints with error < threshold.

    Reference parity: the reference family evaluates 3DHP with
    PCK3D@150mm and its AUC (SURVEY §2 "Eval harness" names the 3DHP
    source; the 150 mm threshold is the dataset's standard protocol).
    For comparability with published 3DHP numbers, feed errors computed
    after `pelvis_align` (the official protocol roots at the pelvis) —
    eval/protocol.py does this.
    """
    return jnp.mean((errors_mm < threshold_mm).astype(jnp.float32))


def auc3d(
    errors_mm: jax.Array, max_threshold_mm: float = 150.0, steps: int = 30
) -> jax.Array:
    """3DHP AUC: mean PCK3D over the official threshold grid 0:5:150.

    The reference protocol (mpii_compute_3d_pck) averages over the
    `steps`+1 thresholds {0, 5, ..., max} INCLUDING t=0, whose strict
    `<` comparison contributes exactly 0 — so a perfect reconstruction
    scores steps/(steps+1), not 1.0. Matching the grid keeps reported
    AUC comparable to published 3DHP numbers.
    """
    ts = jnp.linspace(0.0, max_threshold_mm, steps + 1)
    return jnp.mean(
        (errors_mm[..., None] < ts).astype(jnp.float32)
    )


def accel_error_mm(
    pred: jax.Array, gt: Optional[jax.Array] = None, align_pelvis: bool = True
) -> jax.Array:
    """Acceleration error over a joint sequence — the video-HMR smoothness
    metric (mm/frame^2, the convention of the VIBE/"3D poses in the wild"
    line of work the reference family's video successors report).

    pred: (F, J, 3) joint sequence in METERS (frames first).
    gt:   optional (F, J, 3) ground truth; with gt the metric is
          mean_t,j ||a_pred - a_gt||, without it mean_t,j ||a_pred||
          (absolute jerkiness), where a = x_{t+1} - 2 x_t + x_{t-1}.
    align_pelvis: root each frame at the hip midpoint first (the same
          rooting the MPJPE protocol uses), so global box jitter from the
          crop tracker doesn't read as body acceleration.

    Returns a scalar; needs F >= 3 (fewer frames have no second
    difference — callers guard). jit/vmap-safe.
    """
    p = jnp.asarray(pred, jnp.float32)
    if align_pelvis:
        p = pelvis_align(p)
    acc_p = p[2:] - 2.0 * p[1:-1] + p[:-2]  # (F-2, J, 3)
    if gt is None:
        return jnp.mean(jnp.linalg.norm(acc_p, axis=-1)) * 1000.0
    g = jnp.asarray(gt, jnp.float32)
    if align_pelvis:
        g = pelvis_align(g)
    acc_g = g[2:] - 2.0 * g[1:-1] + g[:-2]
    return jnp.mean(jnp.linalg.norm(acc_p - acc_g, axis=-1)) * 1000.0
