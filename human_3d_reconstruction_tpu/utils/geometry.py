"""Batched 3D geometry primitives (pure JAX, f32).

Reference parity: these are the TPU-native equivalents of the reference's
``batch_rodrigues`` / ``batch_orth_proj`` / rotation utilities (SURVEY.md
section 2 "SMPL layer" key symbols and "Weak-perspective projection" row).
All functions are shape-polymorphic over leading batch dims via vmap-friendly
vectorized math — no Python loops over batch.

Precision note: SMPL-space math must stay float32 on TPU — bf16 matmuls break
the 1e-3 mm-scale parity bar (SURVEY.md section 7 "Hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rodrigues(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle -> rotation matrices, batched over any leading dims.

    Args:
        axis_angle: (..., 3) rotation vectors; angle = ||v||, axis = v/||v||.

    Returns:
        (..., 3, 3) rotation matrices, float32.

    Uses the numerically-stable small-angle form: sin(t)/t and (1-cos t)/t^2
    are evaluated through their Taylor limits at t -> 0 so the function (and
    its gradient) is exact at the identity.
    """
    aa = axis_angle.astype(jnp.float32)
    theta_sq = jnp.sum(aa * aa, axis=-1, keepdims=True)  # (..., 1)

    # sin(t)/t, (1-cos(t))/t^2 with series fallbacks near 0. The non-small
    # branch runs on inputs clamped to the branch's own selection region
    # (>= 1e-8): jnp.where saves only the VALUE — autodiff still
    # differentiates the unselected branch, and at theta_sq = 0 the
    # quotient rule divides by maximum(theta_sq, 1e-24)^2, which
    # UNDERFLOWS f32 to 0 -> inf, and 0 * inf = NaN through the where
    # (observed: NaN d(joints)/d(theta) for any exactly-zero axis-angle,
    # e.g. an un-fitted global rotation in fitting.refine_params).
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.maximum(theta_sq, 1e-8)
    theta = jnp.sqrt(theta_sq_safe)
    sin_over = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    one_minus_cos_over = jnp.where(
        small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq_safe
    )

    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zero = jnp.zeros_like(x)
    # K = [v]_x (cross-product matrix), built batched.
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 3)
    eye = jnp.eye(3, dtype=jnp.float32)
    eye = jnp.broadcast_to(eye, K.shape)
    # HIGHEST: TPU default matmul precision is bf16, which wrecks rotation
    # accuracy (~1e-2); SMPL-space math must be true f32 (SURVEY.md sec. 7).
    KK = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    s = sin_over[..., None]
    c = one_minus_cos_over[..., None]
    return eye + s * K + c * KK


def rotation_matrix_to_axis_angle(R: jax.Array) -> jax.Array:
    """Inverse Rodrigues: (..., 3, 3) -> (..., 3). Stable away from theta=pi."""
    R = R.astype(jnp.float32)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)[..., None]
    scale = jnp.where(
        jnp.abs(sin_t) < 1e-6, 0.5 + theta[..., None] ** 2 / 12.0, theta[..., None] / (2.0 * sin_t)
    )
    return v * scale


def rot6d_to_matrix(x: jax.Array) -> jax.Array:
    """Continuous 6D rotation representation -> (..., 3, 3) (Zhou et al. 2019).

    Provided as a drop-in pose parameterization alternative used by newer
    HMR-family heads; axis-angle remains the default for reference parity.
    """
    x = x.astype(jnp.float32).reshape(*x.shape[:-1], 3, 2)
    a1, a2 = x[..., 0], x[..., 1]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-8)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / (jnp.linalg.norm(b2, axis=-1, keepdims=True) + 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def orthographic_project(points3d: jax.Array, camera: jax.Array) -> jax.Array:
    """Weak-perspective projection: x2d = s * (x3d[..., :2] + t).

    Reference twin of ``batch_orth_proj`` (SURVEY.md section 2): camera is
    (..., 3) = [s, tx, ty] per sample, points3d is (..., N, 3); returns
    (..., N, 2) in normalized image coordinates ([-1, 1] crop space).
    """
    points3d = points3d.astype(jnp.float32)
    camera = camera.astype(jnp.float32)
    cam = camera[..., None, :]  # broadcast over the point axis
    return cam[..., 0:1] * (points3d[..., :2] + cam[..., 1:3])


def with_zeros(R: jax.Array, t: jax.Array) -> jax.Array:
    """Pack rotation (..., 3, 3) + translation (..., 3) into (..., 4, 4)."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_rot6d(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6), the exact inverse layout of `rot6d_to_matrix`
    (which reshapes the 6-vector to (3, 2) columns): interleave the first
    two matrix columns. Round-trip is exact for rotation matrices."""
    return jnp.stack([R[..., :, 0], R[..., :, 1]], axis=-1).reshape(
        *R.shape[:-2], 6
    )
