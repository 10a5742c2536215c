"""Camera conversions around the weak-perspective model.

Reference parity: HMR-family code converts the regressed weak-perspective
camera [s, tx, ty] into a full-perspective translation for rendering/export
(t_z = 2*f / (img_size * s)); provided here so downstream users can feed
standard 3D viewers/renderers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weak_perspective_to_translation(
    cam: jax.Array, focal_length: float = 5000.0, img_size: float = 224.0
) -> jax.Array:
    """[s, tx, ty] -> camera-frame translation (..., 3) = [tx, ty, tz].

    Places the (orthographically-projected) body at the depth where a
    pinhole camera with `focal_length` (pixels) reproduces the same scale
    on an `img_size` crop: tz = 2 * f / (img_size * s).
    """
    cam = jnp.asarray(cam, jnp.float32)
    s = jnp.maximum(jnp.abs(cam[..., 0]), 1e-6) * jnp.sign(
        jnp.where(cam[..., 0] == 0, 1.0, cam[..., 0])
    )
    tz = 2.0 * focal_length / (img_size * s)
    return jnp.stack([cam[..., 1], cam[..., 2], tz], axis=-1)


def perspective_project(
    points3d: jax.Array,
    translation: jax.Array,
    focal_length: float = 5000.0,
    img_size: float = 224.0,
) -> jax.Array:
    """Full pinhole projection of (..., N, 3) + (..., 3) translation into
    crop pixel coordinates (principal point at the crop center)."""
    pts = jnp.asarray(points3d, jnp.float32) + jnp.asarray(translation, jnp.float32)[..., None, :]
    z = jnp.maximum(pts[..., 2], 1e-6)
    x = focal_length * pts[..., 0] / z + img_size / 2.0
    y = focal_length * pts[..., 1] / z + img_size / 2.0
    return jnp.stack([x, y], axis=-1)
