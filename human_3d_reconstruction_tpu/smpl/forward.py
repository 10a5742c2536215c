"""Pure-JAX SMPL forward: (theta, beta) -> (mesh, joints).

This is the XLA reference path (the "twin" every Pallas kernel is tested
against) and is itself TPU-shaped:

- The two big blendshape contractions are expressed as (B, K) @ (K, V*3)
  matmuls so XLA tiles them straight onto the MXU.
- The kinematic chain — the only serial dependency in the whole model
  (SURVEY.md section 3.3) — is a statically unrolled 24-step composition of
  batched 4x4 matmuls (depth <= 8 along the tree; unrolling beats lax.scan
  at this size because each step is tiny and XLA fuses the unrolled chain).
- LBS is a (V, J) @ (B, J, 16) contraction followed by a fused affine apply.

All math is float32 (``preferred_element_type``) regardless of input dtype:
bf16 breaks mm-scale parity (SURVEY.md section 7 "Hard parts").

Reference parity: implements sub-steps (a)-(g) of the reference SMPL layer
(SURVEY.md section 2 "SMPL layer"; call stack section 3.3).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.smpl.model_file import NUM_JOINTS, SMPL_PARENTS
from human_3d_reconstruction_tpu.utils.geometry import rodrigues


def resolve_parents(params: dict, parents=None) -> list[int]:
    """Static kinematic-tree parents for the unrolled chain.

    The tree is model *topology*, not data — it must be concrete at trace
    time. Resolution order: explicit `parents` arg > concrete
    params["kintree_parents"] > the canonical SMPL tree (used when the
    params dict is a traced jit argument; every published SMPL model file
    uses this exact tree, and `load_smpl_model` preserves the stored one
    for callers who pass it explicitly).
    """
    if parents is not None:
        return [int(p) for p in parents]
    kp = params.get("kintree_parents")
    if kp is not None and not isinstance(kp, jax.core.Tracer):
        return [int(p) for p in jax.device_get(kp)]
    return [int(p) for p in SMPL_PARENTS]


class SMPLOutput(NamedTuple):
    """Everything the public API exposes from one SMPL evaluation."""

    verts: jax.Array          # (B, V, 3) posed mesh vertices
    joints: jax.Array         # (B, 24, 3) posed skeleton joints (kinematic chain)
    eval_joints: jax.Array    # (B, K, 3) regressed eval keypoints (= joints if no regressor)
    rest_joints: jax.Array    # (B, 24, 3) shaped rest-pose joints
    rotations: jax.Array      # (B, 24, 3, 3) per-joint local rotations
    transforms: jax.Array     # (B, 24, 4, 4) global joint transforms (posed)


def _f32(x: jax.Array) -> jax.Array:
    return jnp.asarray(x, dtype=jnp.float32)


def blend_shapes(coeffs: jax.Array, dirs_flat: jax.Array) -> jax.Array:
    """(B, K) coefficients x (K, V*3) basis -> (B, V, 3) displacement.

    One MXU matmul; callers pre-flatten the basis once outside jit when
    possible (params dict stores (V, 3, K), we reshape here — XLA folds the
    transpose/reshape into the dot).
    """
    disp = jnp.dot(coeffs, dirs_flat, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return disp.reshape(coeffs.shape[0], -1, 3)


def kinematic_chain(
    rotations: jax.Array,
    rest_joints: jax.Array,
    parents: Sequence[int],
) -> jax.Array:
    """Compose global 4x4 joint transforms along the (static) kinematic tree.

    Args:
        rotations:   (B, J, 3, 3) local joint rotations.
        rest_joints: (B, J, 3) shaped rest joints.
        parents:     length-J static python ints, parents[0] == -1.

    Returns:
        (B, J, 4, 4) world transforms G with the rest-pose offset NOT yet
        removed (G maps rest-frame points rooted at each joint).

    Statically unrolled: parents must be concrete python ints, never traced.
    """
    B = rotations.shape[0]
    J = len(parents)
    bottom = jnp.tile(
        jnp.array([[[0.0, 0.0, 0.0, 1.0]]], dtype=jnp.float32), (B, 1, 1)
    )  # (B, 1, 4)

    def local_tf(k: int) -> jax.Array:
        parent = parents[k]
        t = rest_joints[:, k] if parent < 0 else rest_joints[:, k] - rest_joints[:, parent]
        top = jnp.concatenate([rotations[:, k], t[:, :, None]], axis=-1)  # (B, 3, 4)
        return jnp.concatenate([top, bottom], axis=1)  # (B, 4, 4)

    world = [local_tf(0)]
    for k in range(1, J):
        world.append(
            jnp.matmul(world[parents[k]], local_tf(k), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        )
    return jnp.stack(world, axis=1)  # (B, J, 4, 4)


def remove_rest_offset(transforms: jax.Array, rest_joints: jax.Array) -> jax.Array:
    """G -> A: subtract the transformed rest-joint so A acts on rest vertices.

    A_k = G_k - [0 | G_k[:, :3, :3] @ J_k] (only the last column changes).
    """
    RJ = jnp.einsum(
        "bjpq,bjq->bjp", transforms[:, :, :3, :3], rest_joints,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # (B, J, 3)
    correction = jnp.concatenate([RJ, jnp.zeros_like(RJ[..., :1])], axis=-1)  # (B, J, 4)
    return transforms - jnp.pad(correction[..., None], ((0, 0), (0, 0), (0, 0), (3, 0)))


def linear_blend_skinning(
    weights: jax.Array, transforms_rel: jax.Array, v_posed: jax.Array
) -> jax.Array:
    """LBS: per-vertex blend of joint transforms, applied to rest vertices.

    Args:
        weights:        (V, J) skinning weights.
        transforms_rel: (B, J, 4, 4) rest-offset-removed transforms (A).
        v_posed:        (B, V, 3) blendshaped rest vertices.

    Returns:
        (B, V, 3) posed vertices.

    Computed as (V, J) @ (B, J, 16) — one MXU matmul per batch element — then
    a fused affine apply (3x3 rotate + translate) instead of forming
    homogeneous coordinates, saving a V-wide concat.
    """
    B = transforms_rel.shape[0]
    A_flat = transforms_rel.reshape(B, transforms_rel.shape[1], 16)
    T = jnp.einsum("vj,bjf->bvf", weights, A_flat, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    T = T.reshape(B, -1, 4, 4)
    rotated = jnp.einsum(
        "bvpq,bvq->bvp", T[:, :, :3, :3], v_posed,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return rotated + T[:, :, :3, 3]


def smpl_forward(
    params: dict,
    pose: jax.Array,
    betas: jax.Array,
    trans: Optional[jax.Array] = None,
    parents: Optional[Sequence[int]] = None,
) -> SMPLOutput:
    """Full SMPL forward, batched.

    Args:
        params: dict from ``SMPLModel.as_dict()`` (device or host arrays;
            may be a traced jit argument — see `resolve_parents`).
        pose:  (B, 72) or (B, 24, 3) axis-angle, root first.
        betas: (B, num_betas) shape coefficients.
        trans: optional (B, 3) global translation added to verts and joints.
        parents: optional static kinematic tree override.

    Returns:
        SMPLOutput, all float32.
    """
    v_template = _f32(params["v_template"])        # (V, 3)
    shapedirs = _f32(params["shapedirs"])          # (V, 3, nb)
    posedirs = _f32(params["posedirs"])            # (V, 3, P)
    J_regressor = _f32(params["J_regressor"])      # (J, V)
    weights = _f32(params["weights"])              # (V, J)
    parents = resolve_parents(params, parents)

    pose = _f32(pose).reshape(pose.shape[0], NUM_JOINTS, 3)
    betas = _f32(betas)
    B = pose.shape[0]
    V = v_template.shape[0]

    # (a)+(b) shape blendshapes — (B, nb) @ (nb, V*3) on the MXU.
    shape_basis = shapedirs.reshape(V * 3, -1).T  # (nb, V*3)
    v_shaped = v_template[None] + blend_shapes(betas, shape_basis)  # (B, V, 3)

    # (d) rest joints from the shaped mesh.
    rest_joints = jnp.einsum(
        "jv,bvc->bjc", J_regressor, v_shaped,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # (B, 24, 3)

    # (a) Rodrigues for all 24 joints at once.
    rotations = rodrigues(pose)  # (B, 24, 3, 3)

    # (c) pose-corrective blendshapes from vec(R_k - I), k=1..23.
    eye = jnp.eye(3, dtype=jnp.float32)
    pose_feature = (rotations[:, 1:] - eye).reshape(B, -1)  # (B, 207)
    pose_basis = posedirs.reshape(V * 3, -1).T  # (207, V*3)
    v_posed = v_shaped + blend_shapes(pose_feature, pose_basis)

    # (e) kinematic chain (statically unrolled).
    transforms = kinematic_chain(rotations, rest_joints, parents)  # (B, 24, 4, 4)
    transforms_rel = remove_rest_offset(transforms, rest_joints)

    # (f) LBS.
    verts = linear_blend_skinning(weights, transforms_rel, v_posed)  # (B, V, 3)

    # (g) joints of the posed body: chain translations + optional regressor.
    joints = transforms[:, :, :3, 3]  # (B, 24, 3)
    if "joint_regressor" in params:
        eval_joints = jnp.einsum(
            "kv,bvc->bkc", _f32(params["joint_regressor"]), verts,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
    else:
        eval_joints = joints

    if trans is not None:
        t = _f32(trans)[:, None, :]
        verts = verts + t
        joints = joints + t
        eval_joints = eval_joints + t

    return SMPLOutput(
        verts=verts,
        joints=joints,
        eval_joints=eval_joints,
        rest_joints=rest_joints,
        rotations=rotations,
        transforms=transforms,
    )
