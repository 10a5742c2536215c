"""SMPL pose-parameter transforms under image-space augmentation.

When the trainer flips or rotates a training image, every ground-truth
annotation must move with it. 2D keypoints and 3D joints transform as
points; the SMPL pose GT (theta) transforms in *parameter space*:

- Horizontal flip mirrors the body about the image's vertical axis. In
  SMPL terms this is (i) the left/right joint permutation of the 24
  axis-angle triplets (body symmetry) and (ii) per-triplet conjugation by
  the x-mirror: an axis-angle a = (ax, ay, az) becomes (ax, -ay, -az),
  because for the mirror F = diag(-1, 1, 1), F R(a) F = R(ax, -ay, -az).
- In-plane rotation by the augmentation angle left-composes the image
  rotation into the ROOT orientation only: R_root' = Rz(phi) R_root where
  phi matches the keypoint-side transform (data/preprocess.py
  `transform_keypoints` rotates points by -rot, so phi = -rot).

Reference parity: HMR-family trainers apply exactly this pair of
transforms on the host when a mosh-annotated sample is flipped/rotated
(SURVEY.md section 2 "Dataset loaders": flip/aug semantics; section 3.1
training recipe). Here it runs on device inside the fused train step.

Composition order matters and mirrors the image/keypoint path: rotation
first, then flip — `transform_keypoints` applies the inverse rotation and
THEN the mirror, so theta must compose as flip(rotate(theta)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Left/right mirror permutation over SMPL's 24 joints
# (smpl/model_file.py::SMPL_JOINT_NAMES): pelvis/spines/neck/head are their
# own mirror; hips, knees, ankles, feet, collars, shoulders, elbows,
# wrists, hands swap l<->r.
SMPL_POSE_FLIP_PERM = np.array(
    [0, 2, 1, 3, 5, 4, 6, 8, 7, 9, 11, 10, 12, 14, 13, 15, 17, 16, 19, 18, 21, 20, 23, 22],
    dtype=np.int32,
)

# Axis-angle component signs under the x-mirror conjugation.
_FLIP_SIGNS = np.array([1.0, -1.0, -1.0], dtype=np.float32)


def flip_pose(theta: jax.Array) -> jax.Array:
    """Mirror a batch of SMPL poses for a horizontal image flip.

    Args:
        theta: (..., 72) or (..., 24, 3) axis-angle, root first.

    Returns:
        Same shape: joint-permuted, y/z-negated pose of the mirrored body.
    """
    flat = theta.shape[-1] == 72
    t = theta.reshape(*theta.shape[:-1], 24, 3) if flat else theta
    t = t[..., SMPL_POSE_FLIP_PERM, :] * jnp.asarray(_FLIP_SIGNS, t.dtype)
    return t.reshape(*theta.shape) if flat else t


def _quat_from_axis_angle(aa: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 4) unit quaternion (w, x, y, z).

    Stable at the identity: sin(|a|/2)/|a| is evaluated through sinc.
    """
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)  # (..., 1)
    half = angle / 2.0
    w = jnp.cos(half)
    # sin(h)/|a| = 0.5 * sinc(h / pi); exact and finite at |a| = 0.
    xyz = aa * (0.5 * jnp.sinc(half / jnp.pi))
    return jnp.concatenate([w, xyz], axis=-1)


def _axis_angle_from_quat(q: jax.Array) -> jax.Array:
    """(..., 4) unit quaternion -> (..., 3) axis-angle, shortest arc."""
    # Canonicalize sign so w >= 0 (angle <= pi) before extracting.
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = q[..., 0]
    v = q[..., 1:]
    s = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(s, w)
    # aa = v * (angle / s); near the identity s -> 0 with w -> 1, where
    # angle/s -> 2/w. Guard the division, not the result.
    scale = jnp.where(s > 1e-6, angle / jnp.maximum(s, 1e-12), 2.0 / jnp.maximum(w, 1e-6))
    return v * scale[..., None]


def _quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of (..., 4) quaternions (w, x, y, z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def rotate_root_pose(theta: jax.Array, rot: jax.Array) -> jax.Array:
    """Compose the in-plane augmentation rotation into the root orientation.

    Args:
        theta: (..., 72) or (..., 24, 3) axis-angle pose.
        rot:   (...) augmentation angle in radians, SAME sign convention as
               `affine_crop`/`transform_keypoints` — points transform by
               Rz(-rot), so the root becomes Rz(-rot) @ R_root.

    Returns:
        Pose with only the root triplet changed.
    """
    flat = theta.shape[-1] == 72
    t = theta.reshape(*theta.shape[:-1], 24, 3) if flat else theta
    root = t[..., 0, :]  # (..., 3)

    phi = -jnp.asarray(rot, root.dtype)  # image points rotate by Rz(-rot)
    half = phi / 2.0
    zeros = jnp.zeros_like(half)
    q_img = jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)

    q_root = _quat_from_axis_angle(root)
    new_root = _axis_angle_from_quat(_quat_mul(q_img, q_root))

    t = t.at[..., 0, :].set(new_root)
    return t.reshape(*theta.shape) if flat else t


def template_mirror_error(smpl_params: dict) -> float:
    """Max rest-pose mirror residual of the LSP-14 eval joints (meters).

    Every label-space flip in the stack — `flip_pose` (theta GT), the
    trainer's j3d/kp2d/vis permutations, `eval.protocol.unflip_joints3d` —
    assumes the body template is bilaterally symmetric under LSP_FLIP_MAP
    (real SMPL is, to ~mm). A template that fails this (e.g. a random
    synthetic stand-in, measured 1.2 m max here) makes mirrored supervision
    targets UNREACHABLE by the decoder: flip augmentation then teaches
    contradictions, which round-5 measured as a 461 mm flipped-branch eval
    on a model whose direct branch scored 56 mm. Callers gate flip features
    on this diagnostic (train.trainer.gate_flip_aug).

    One jitted call — never run SMPL math eagerly on the tunneled device.
    """
    import numpy as np

    from human_3d_reconstruction_tpu.data.skeleton import LSP_FLIP_MAP
    from human_3d_reconstruction_tpu.smpl.forward import smpl_forward

    @jax.jit
    def _rest_eval_joints():
        out = smpl_forward(
            smpl_params, jnp.zeros((1, 72)), jnp.zeros((1, 10))
        )
        return out.eval_joints[0, :14]

    j = np.asarray(_rest_eval_joints())
    j = j - j.mean(axis=0)
    mirrored = j[np.asarray(LSP_FLIP_MAP)] * np.array([-1.0, 1.0, 1.0], j.dtype)
    return float(np.abs(mirrored - j).max())


def augment_pose(
    theta: jax.Array, rot: jax.Array, flip: jax.Array
) -> jax.Array:
    """Full image-augmentation transform of GT pose: rotate, then flip.

    Args:
        theta: (B, 72) axis-angle poses.
        rot:   (B,) in-plane angles (radians; 0 = no rotation).
        flip:  (B,) > 0 where the sample was mirrored.

    Matches the image/keypoint path exactly: `transform_keypoints` applies
    the inverse rotation first and the mirror second.
    """
    rotated = rotate_root_pose(theta, rot)
    flipped = flip_pose(rotated)
    return jnp.where(jnp.asarray(flip)[..., None] > 0, flipped, rotated)
