"""Geometric-invariance tests for SMPL GT pose under image augmentation.

The defining property (VERDICT r2 item 1): whatever the trainer does to the
image/keypoints/3D-joints of a sample, decoding the (transformed) GT theta
through `smpl_forward` must land on the (transformed) GT joints. Before the
round-3 fix, flips/rotations transformed kp2d/j3d but left theta untouched,
so `test_trainer_augmented_theta_matches_augmented_joints` fails on that
code by construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_3d_reconstruction_tpu.data.skeleton import LSP_FLIP_MAP, NUM_KP
from human_3d_reconstruction_tpu.smpl.forward import kinematic_chain, smpl_forward
from human_3d_reconstruction_tpu.smpl.pose_aug import (
    SMPL_POSE_FLIP_PERM,
    augment_pose,
    flip_pose,
    rotate_root_pose,
)
from human_3d_reconstruction_tpu.utils.geometry import rodrigues

pytestmark = pytest.mark.fast  # pre-commit lane: `pytest -m fast` (<5 min warm)

F_MIRROR = np.diag([-1.0, 1.0, 1.0]).astype(np.float32)

# Left/right-symmetric 24-joint skeleton on the SMPL tree (x mirrored across
# the midline), used where exact mirror geometry is required.
SYM_SKELETON = np.array(
    [
        [0.00, 0.00, 0.00], [0.09, -0.08, 0.01], [-0.09, -0.08, 0.01],
        [0.00, 0.11, -0.01], [0.10, -0.48, 0.02], [-0.10, -0.48, 0.02],
        [0.00, 0.25, 0.00], [0.10, -0.88, -0.03], [-0.10, -0.88, -0.03],
        [0.00, 0.31, 0.01], [0.12, -0.94, 0.10], [-0.12, -0.94, 0.10],
        [0.00, 0.46, 0.00], [0.07, 0.39, 0.01], [-0.07, 0.39, 0.01],
        [0.00, 0.55, 0.02], [0.17, 0.41, 0.00], [-0.17, 0.41, 0.00],
        [0.43, 0.40, -0.02], [-0.43, 0.40, -0.02], [0.68, 0.40, 0.00],
        [-0.68, 0.40, 0.00], [0.76, 0.40, 0.01], [-0.76, 0.40, 0.01],
    ],
    dtype=np.float32,
)

# LSP-14 -> SMPL joint selector (r_ankle..head_top), flip-consistent with
# LSP_FLIP_MAP under SMPL_POSE_FLIP_PERM.
LSP14_FROM_SMPL = np.array([8, 5, 2, 1, 4, 7, 21, 19, 17, 16, 18, 20, 12, 15])


def _mirror_symmetric_smpl_params() -> dict:
    """Minimal exactly-mirror-symmetric SMPL params: one vertex per joint,
    identity regressor/weights, zero blendshapes — posed vertices ARE the
    chain joints, and the eval regressor selects the LSP-14 subset."""
    J = 24
    eye = np.eye(J, dtype=np.float32)
    jr = np.zeros((NUM_KP, J), dtype=np.float32)
    jr[np.arange(NUM_KP), LSP14_FROM_SMPL] = 1.0
    return {
        "v_template": SYM_SKELETON.copy(),
        "shapedirs": np.zeros((J, 3, 10), np.float32),
        "posedirs": np.zeros((J, 3, 207), np.float32),
        "J_regressor": eye,
        "weights": eye,
        "kintree_parents": np.array(
            [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
            np.int32,
        ),
        "faces": np.zeros((1, 3), np.int32),
        "joint_regressor": jr,
    }


def test_flip_pose_is_mirror_conjugation(rng):
    """R(flip(a)) == F R(a) F per joint — the defining axis-angle identity."""
    theta = rng.normal(scale=0.6, size=(4, 72)).astype(np.float32)
    R = np.asarray(rodrigues(jnp.asarray(theta).reshape(4, 24, 3)))
    Rf = np.asarray(rodrigues(flip_pose(jnp.asarray(theta)).reshape(4, 24, 3)))
    expected = np.einsum("ij,bkjl,lm->bkim", F_MIRROR, R[:, SMPL_POSE_FLIP_PERM], F_MIRROR)
    np.testing.assert_allclose(Rf, expected, atol=1e-6)


def test_flip_pose_involution(rng):
    theta = jnp.asarray(rng.normal(scale=0.5, size=(3, 72)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(flip_pose(flip_pose(theta))), np.asarray(theta), atol=1e-6)


def test_flip_pose_chain_joints_mirror(rng):
    """On a symmetric skeleton, chain joints of the flipped pose are the
    mirrored, joint-permuted chain joints of the original pose."""
    B = 3
    theta = jnp.asarray(rng.normal(scale=0.5, size=(B, 72)).astype(np.float32))
    rest = jnp.broadcast_to(jnp.asarray(SYM_SKELETON), (B, 24, 3))
    parents = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21]

    def chain_joints(t):
        Rm = rodrigues(t.reshape(B, 24, 3))
        return kinematic_chain(Rm, rest, parents)[:, :, :3, 3]

    j = np.asarray(chain_joints(theta))
    jf = np.asarray(chain_joints(flip_pose(theta)))
    np.testing.assert_allclose(jf, j[:, SMPL_POSE_FLIP_PERM] @ F_MIRROR.T, atol=1e-5)


def test_rotate_root_pose_geometry(smpl_model, rng):
    """Decoded joints of the rotated pose == Rz(-rot) of the decoded joints,
    root-relative — exact for ANY model (only the root orientation moves)."""
    B = 4
    params = {k: jnp.asarray(v) for k, v in smpl_model.as_dict().items()}
    theta = jnp.asarray(rng.normal(scale=0.4, size=(B, 72)).astype(np.float32))
    beta = jnp.asarray(rng.normal(scale=0.5, size=(B, 10)).astype(np.float32))
    rot = jnp.asarray(rng.uniform(-0.6, 0.6, size=(B,)).astype(np.float32))

    base = smpl_forward(params, theta, beta)
    out = smpl_forward(params, rotate_root_pose(theta, rot), beta)

    c, s = np.cos(-np.asarray(rot)), np.sin(-np.asarray(rot))
    Rz = np.zeros((B, 3, 3), np.float32)
    Rz[:, 0, 0], Rz[:, 0, 1] = c, -s
    Rz[:, 1, 0], Rz[:, 1, 1] = s, c
    Rz[:, 2, 2] = 1.0

    for field in ("joints", "eval_joints"):
        j = np.asarray(getattr(base, field))
        jr = np.asarray(getattr(out, field))
        jc = j - j.mean(axis=1, keepdims=True)
        jrc = jr - jr.mean(axis=1, keepdims=True)
        np.testing.assert_allclose(jrc, np.einsum("bij,bkj->bki", Rz, jc), atol=2e-5)


def test_rotate_root_pose_small_angles():
    """Near-identity roots and tiny angles stay finite and exact."""
    theta = jnp.zeros((3, 72), jnp.float32)
    theta = theta.at[1, :3].set(jnp.asarray([1e-8, 0.0, 0.0]))
    theta = theta.at[2, :3].set(jnp.asarray([0.0, 3.1, 0.0]))  # near pi
    rot = jnp.asarray([0.0, 1e-9, 0.5], jnp.float32)
    out = rotate_root_pose(theta, rot)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(theta[0]), atol=1e-7)
    # Non-root joints never change.
    np.testing.assert_allclose(np.asarray(out[:, 3:]), np.asarray(theta[:, 3:]), atol=0)


def test_rotate_root_pose_near_pi_composition(rng):
    """Roots at/near angle pi (the axis-angle chart boundary): the composed
    rotation must still equal Rz(-rot) @ R_root as MATRICES (the axis-angle
    vector itself may re-canonicalize to the opposite chart), and gradients
    stay finite."""
    B = 5
    axes = rng.normal(size=(B, 3)).astype(np.float32)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = np.array(
        [np.pi, np.pi - 1e-7, np.pi - 1e-3, -np.pi + 1e-6, np.pi / 2],
        np.float32,
    )
    theta = np.zeros((B, 72), np.float32)
    theta[:, :3] = axes * angles[:, None]
    rot = jnp.asarray(rng.uniform(-0.6, 0.6, size=(B,)).astype(np.float32))

    out = rotate_root_pose(jnp.asarray(theta), rot)
    assert np.all(np.isfinite(np.asarray(out)))

    c, s = np.cos(-np.asarray(rot)), np.sin(-np.asarray(rot))
    Rz = np.zeros((B, 3, 3), np.float32)
    Rz[:, 0, 0], Rz[:, 0, 1] = c, -s
    Rz[:, 1, 0], Rz[:, 1, 1] = s, c
    Rz[:, 2, 2] = 1.0
    want = Rz @ np.asarray(rodrigues(jnp.asarray(theta[:, :3])))
    got = np.asarray(rodrigues(out[:, :3]))
    np.testing.assert_allclose(got, want, atol=3e-5)

    g = jax.grad(
        lambda t: jnp.sum(rotate_root_pose(t, rot) ** 2)
    )(jnp.asarray(theta))
    assert np.all(np.isfinite(np.asarray(g)))


def test_trainer_augmented_theta_matches_augmented_joints(rng):
    """THE invariance test (VERDICT r2 item 1): run the trainer's on-device
    preprocessing with flips AND rotations active, then decode the GT theta
    it emits and require the decoded (root-relative) LSP-14 joints to match
    the augmented joints3d it emits. Fails on pre-round-3 code, where theta
    passed through untransformed."""
    from human_3d_reconstruction_tpu.train import trainer as T

    B = 8
    params_np = _mirror_symmetric_smpl_params()
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    theta = rng.normal(scale=0.5, size=(B, 72)).astype(np.float32)
    beta = np.zeros((B, 10), np.float32)

    decoded = smpl_forward(params, jnp.asarray(theta), jnp.asarray(beta))
    j3d = np.asarray(decoded.eval_joints)  # (B, 14, 3)
    j3d = (j3d - j3d.mean(axis=1, keepdims=True)).astype(np.float32)

    batch = {
        "images": rng.uniform(0, 255, (B, 48, 48, 3)).astype(np.float32),
        "centers": np.tile([[24.0, 24.0]], (B, 1)).astype(np.float32),
        "scales": np.full((B,), 40.0, np.float32),
        "kp2d": np.concatenate(
            [rng.uniform(4, 44, (B, NUM_KP, 2)), np.ones((B, NUM_KP, 1))], axis=2
        ).astype(np.float32),
        "joints3d": j3d,
        "has_3d": np.ones((B,), np.float32),
        "theta": theta,
        "beta": beta,
        "has_smpl": np.ones((B,), np.float32),
    }
    config = T.TrainConfig(crop_size=32, aug_rot_max=0.4, aug_flip=True)
    out = T._device_preprocess(config, {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.key(7))
    if len(out) == 4:  # pre-fix signature: theta was never augmented
        crops, kp2d, vis, j3d_aug = out
        theta_aug = jnp.asarray(theta)
    else:
        crops, kp2d, vis, j3d_aug, theta_aug = out

    redecoded = smpl_forward(params, theta_aug, jnp.asarray(beta))
    pred = np.asarray(redecoded.eval_joints)
    pred = pred - pred.mean(axis=1, keepdims=True)
    target = np.asarray(j3d_aug)
    target = target - target.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(pred, target, atol=1e-4)


def test_augment_pose_composition_order(rng):
    """augment_pose == flip(rotate(theta)) exactly where flip is set."""
    B = 6
    theta = jnp.asarray(rng.normal(scale=0.5, size=(B, 72)).astype(np.float32))
    rot = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B,)).astype(np.float32))
    flip = jnp.asarray((rng.uniform(size=B) < 0.5).astype(np.float32))
    out = np.asarray(augment_pose(theta, rot, flip))
    rotated = rotate_root_pose(theta, rot)
    expected = np.where(
        np.asarray(flip)[:, None] > 0,
        np.asarray(flip_pose(rotated)),
        np.asarray(rotated),
    )
    np.testing.assert_allclose(out, expected, atol=0)


def test_trainer_sample_mode_invariance(rng):
    """aug_rot_mode='sample' (the reference-faithful per-sample gather
    path) must satisfy the same augmented-theta/joints consistency."""
    from human_3d_reconstruction_tpu.train import trainer as T

    B = 6
    params_np = _mirror_symmetric_smpl_params()
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    theta = rng.normal(scale=0.5, size=(B, 72)).astype(np.float32)
    beta = np.zeros((B, 10), np.float32)
    decoded = smpl_forward(params, jnp.asarray(theta), jnp.asarray(beta))
    j3d = np.asarray(decoded.eval_joints)
    j3d = (j3d - j3d.mean(axis=1, keepdims=True)).astype(np.float32)

    batch = {
        "images": rng.uniform(0, 255, (B, 48, 48, 3)).astype(np.float32),
        "centers": np.tile([[24.0, 24.0]], (B, 1)).astype(np.float32),
        "scales": np.full((B,), 40.0, np.float32),
        "kp2d": np.concatenate(
            [rng.uniform(4, 44, (B, NUM_KP, 2)), np.ones((B, NUM_KP, 1))], axis=2
        ).astype(np.float32),
        "joints3d": j3d,
        "has_3d": np.ones((B,), np.float32),
        "theta": theta,
        "beta": beta,
        "has_smpl": np.ones((B,), np.float32),
    }
    config = T.TrainConfig(
        crop_size=32, aug_rot_max=0.4, aug_flip=True, aug_rot_mode="sample"
    )
    crops, kp2d, vis, j3d_aug, theta_aug = T._device_preprocess(
        config, {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.key(9)
    )
    redecoded = smpl_forward(params, theta_aug, jnp.asarray(beta))
    pred = np.asarray(redecoded.eval_joints)
    pred = pred - pred.mean(axis=1, keepdims=True)
    target = np.asarray(j3d_aug)
    target = target - target.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(pred, target, atol=1e-4)
    # per-sample mode: the drawn angles must actually differ across samples
    j_in = batch["joints3d"]
    angs = []
    for b in range(B):
        a, o = j_in[b, :, :2], target[b, :, :2]
        if np.asarray(jnp.sum(jnp.abs(jnp.asarray(a)))) < 1e-6:
            continue
        num = np.sum(a[:, 0] * o[:, 1] - a[:, 1] * o[:, 0])
        den = np.sum(a[:, 0] * o[:, 0] + a[:, 1] * o[:, 1])
        angs.append(np.arctan2(num, den))
    assert np.ptp(angs) > 1e-3, angs
