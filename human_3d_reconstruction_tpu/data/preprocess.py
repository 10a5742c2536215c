"""On-device image preprocessing: crop / resize / rotate / flip / normalize.

One primitive does all the geometry: `affine_crop` samples the source image
through an inverse affine map (center/scale/rotation/flip) with bilinear
interpolation, producing a fixed-size crop. It is pure gather + FMA math —
jit/vmap/grad-friendly, static output shape, no host round-trips — so the
whole "N person boxes -> N normalized crops" stage (BASELINE configs 3/5)
is a single device program fused into the encoder's program.

Reference parity: replaces the reference's host-side cv2 crop/resize/warp
utilities (`crop`, `flip_kp`, `transform` — SURVEY.md section 2 "Dataset
loaders"); the keypoint-side transform is `transform_keypoints`, the exact
inverse of the image-side map, so image and annotations stay aligned.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

CROP_SIZE = 224
# ImageNet-style normalization is NOT used by the HMR family; the reference
# normalizes to [-1, 1] (pixel/255 * 2 - 1). Kept as the default here.
PIXEL_SCALE = 2.0 / 255.0
PIXEL_BIAS = -1.0


def _crop_to_source_matrix(
    center: jax.Array, scale: jax.Array, rot: jax.Array, flip: jax.Array, out_size: int
) -> tuple[jax.Array, jax.Array]:
    """Inverse map: crop pixel (x, y) -> source pixel, as (2x2 M, 2 t).

    The crop covers a source square of side `scale` (pixels) centered at
    `center`, rotated by `rot` radians, optionally mirrored horizontally.
    """
    s = scale / out_size  # source pixels per crop pixel
    cos_r = jnp.cos(rot)
    sin_r = jnp.sin(rot)
    fx = jnp.where(flip > 0, -1.0, 1.0)
    # Column-action matrix: src = M @ (crop - out_size/2) + center
    M = s * jnp.stack(
        [
            jnp.stack([cos_r * fx, -sin_r]),
            jnp.stack([sin_r * fx, cos_r]),
        ]
    )  # (2, 2)
    t = center  # (2,)
    return M, t


def _bilinear_gather(image: jax.Array, sx: jax.Array, sy: jax.Array) -> jax.Array:
    """Sample image (H, W, C) at float coords (sx, sy), zero padding outside."""
    H, W = image.shape[0], image.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        v = image[yi_c, xi_c]  # gather: (h, w, C)
        return v * valid[..., None].astype(image.dtype)

    top = tap(y0, x0) * (1 - wx)[..., None] + tap(y0, x0 + 1) * wx[..., None]
    bot = tap(y0 + 1, x0) * (1 - wx)[..., None] + tap(y0 + 1, x0 + 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def affine_crop(
    image: jax.Array,
    center: jax.Array,
    scale: jax.Array,
    rot: jax.Array | float = 0.0,
    flip: jax.Array | float = 0.0,
    out_size: int = CROP_SIZE,
) -> jax.Array:
    """Crop-with-augmentation by inverse affine sampling.

    Args:
        image:  (H, W, C) float source image (any range; passthrough).
        center: (2,) [cx, cy] person-box center in source pixels.
        scale:  () box side length in source pixels (square crop).
        rot:    () in-plane rotation (radians, augmentation).
        flip:   () >0 mirrors horizontally (augmentation).
        out_size: static crop resolution.

    Returns:
        (out_size, out_size, C) float crop, zero-padded outside the source.
    """
    image = jnp.asarray(image, dtype=jnp.float32)
    center = jnp.asarray(center, dtype=jnp.float32)
    scale = jnp.asarray(scale, dtype=jnp.float32)
    rot = jnp.asarray(rot, dtype=jnp.float32)
    flip = jnp.asarray(flip, dtype=jnp.float32)

    M, t = _crop_to_source_matrix(center, scale, rot, flip, out_size)
    # Crop-pixel grid, centered.
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_size, out_size), 0) - out_size / 2 + 0.5
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_size, out_size), 1) - out_size / 2 + 0.5
    sx = M[0, 0] * xs + M[0, 1] * ys + t[0]
    sy = M[1, 0] * xs + M[1, 1] * ys + t[1]
    return _bilinear_gather(image, sx, sy)


def transform_keypoints(
    keypoints: jax.Array,
    center: jax.Array,
    scale: jax.Array,
    rot: jax.Array | float = 0.0,
    flip: jax.Array | float = 0.0,
    flip_map: Optional[jax.Array] = None,
    out_size: int = CROP_SIZE,
) -> jax.Array:
    """Map source-pixel keypoints (K, 2) into normalized crop coords [-1, 1].

    Exact inverse of `affine_crop`'s image map, so kp/image stay aligned
    under any augmentation. `flip_map` is the left/right joint permutation
    applied when `flip > 0` (reference's `flip_kp`).
    """
    kp = jnp.asarray(keypoints, dtype=jnp.float32)
    center = jnp.asarray(center, dtype=jnp.float32)
    scale = jnp.asarray(scale, dtype=jnp.float32)
    rot = jnp.asarray(rot, dtype=jnp.float32)
    flip = jnp.asarray(flip, dtype=jnp.float32)

    d = kp - center
    cos_r = jnp.cos(-rot)
    sin_r = jnp.sin(-rot)
    # Inverse rotation, then inverse flip, then scale to crop units.
    x = cos_r * d[:, 0] - sin_r * d[:, 1]
    y = sin_r * d[:, 0] + cos_r * d[:, 1]
    fx = jnp.where(flip > 0, -1.0, 1.0)
    x = x * fx
    crop_xy = jnp.stack([x, y], axis=1) / (scale / 2.0)  # [-1, 1] over the box

    if flip_map is not None:
        flipped = crop_xy[flip_map]
        crop_xy = jnp.where(flip > 0, flipped, crop_xy)
    return crop_xy


def normalize_image(images: jax.Array) -> jax.Array:
    """uint8/float [0, 255] -> float32 [-1, 1] (reference's convention)."""
    return jnp.asarray(images, dtype=jnp.float32) * PIXEL_SCALE + PIXEL_BIAS


def _interp_matrix(src_coords: jax.Array, src_size: int) -> jax.Array:
    """Rows of bilinear interpolation weights: (out, src_size).

    Row i holds hat-function weights centered at src_coords[i]; coordinates
    outside [0, src_size-1] naturally get (partially) zero rows, matching
    the gather path's zero padding.
    """
    grid = jax.lax.broadcasted_iota(jnp.float32, (src_coords.shape[0], src_size), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src_coords[:, None] - grid))


def separable_crop(
    image: jax.Array,
    center: jax.Array,
    scale: jax.Array,
    flip: jax.Array | float = 0.0,
    out_size: int = CROP_SIZE,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Axis-aligned crop+resize(+mirror) as two 1-D interpolation MATMULS.

    Bilinear resampling without rotation is separable: out = Ry @ img @ Rx^T
    with per-sample (out, H)/(out, W) hat-weight matrices. This moves the
    hot inference preprocessing from 4-tap gathers (VPU-bound, ~135 ms for
    64x224x224 in bring-up) onto the MXU (~10 GFLOP, sub-ms). Exactly
    matches `affine_crop` with rot=0 (same map, same zero padding).

    dtype=bfloat16 is the serving fast path: single-pass bf16 matmuls and
    bf16 intermediates. Measured worst-case pixel error vs the f32 path is
    ~2.5e-2 of the [-1, 1] range (pinned in tests/test_preprocess.py —
    interp sums of bf16-rounded pixels, ~10x one bf16 input rounding), so
    it is only used when the consumer is a bf16 encoder, whose mm-scale
    output drift is separately pinned at the metric level (tpu_checks);
    f32 keeps HIGH-precision (3-pass bf16) accumulation and stays the
    exact/training path.
    """
    fast = dtype == jnp.bfloat16
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGH
    image = jnp.asarray(image, dtype)
    H, W = image.shape[0], image.shape[1]
    s = jnp.asarray(scale, jnp.float32) / out_size
    c = jnp.asarray(center, jnp.float32)
    fx = jnp.where(jnp.asarray(flip, jnp.float32) > 0, -1.0, 1.0)

    offs = (
        jax.lax.broadcasted_iota(jnp.float32, (out_size, 1), 0).squeeze(-1)
        - out_size / 2
        + 0.5
    )
    src_x = c[0] + s * offs * fx  # (out,)
    src_y = c[1] + s * offs

    Ry = _interp_matrix(src_y, H).astype(dtype)  # (out, H)
    Rx = _interp_matrix(src_x, W).astype(dtype)  # (out, W)
    tmp = jnp.einsum("oh,hwc->owc", Ry, image, precision=precision)
    return jnp.einsum("pw,owc->opc", Rx, tmp, precision=precision)


def _shear_x(img: jax.Array, offsets: jax.Array) -> jax.Array:
    """Per-row horizontal 1-D bilinear shift as ONE banded matmul.

    img (B, S, S, C); offsets (S,) source-x shift per row (shared across
    the batch — the batch-shared-rotation contract). out(b, y, o, c) =
    sum_x hat(x - o - offsets[y]) img(b, y, x, c).
    """
    S = img.shape[1]
    x = jax.lax.broadcasted_iota(jnp.float32, (S, S, S), 1)
    o = jax.lax.broadcasted_iota(jnp.float32, (S, S, S), 2)
    W = jnp.maximum(0.0, 1.0 - jnp.abs(x - o - offsets[:, None, None]))
    return jnp.einsum("yxo,byxc->byoc", W, img, precision=jax.lax.Precision.HIGH)


def shear_rotate(crops: jax.Array, rot: jax.Array) -> jax.Array:
    """Rotate square crops by ONE shared angle via Paeth's 3-shear identity.

    R(rot) = Shear_x(a) . Shear_y(sin rot) . Shear_x(a), a = -tan(rot/2):
    three per-row/per-column 1-D resamples, each a banded (S, S, S) x
    (B, S, S, C) einsum on the MXU — no gathers. Convention matches
    `affine_crop`: output pixel o samples source R(-rot)-rotated coords
    about the crop center (i.e. the image content rotates by `rot`).

    Why: per-pixel gathers cost ~0.72 ms/image/tap on v5e (measured; 4-tap
    bilinear = 2.9 ms/image, 87% of an aug-on train step), and the cost is
    the gather itself — a flat-index reformulation saved only 8%. With the
    angle shared per batch (fresh each step; the augmentation DISTRIBUTION
    over training is unchanged, only within-batch correlation appears) the
    shear weights are (S, S, S) constants of the step and the whole
    rotation runs at matmul speed.

    Resampling note: three chained bilinear passes blur slightly more than
    the single-pass `affine_crop` gather; exact on piecewise-linear
    content (any chain of bilinear resamples reproduces affine images
    exactly — pinned in tests), geometry identical.
    """
    rot = jnp.asarray(rot, jnp.float32)
    S = crops.shape[1]
    c = (S - 1) / 2.0
    ys = jnp.arange(S, dtype=jnp.float32) - c
    a = -jnp.tan(rot / 2.0)
    b = jnp.sin(rot)
    out = _shear_x(crops, a * ys)
    out = jnp.swapaxes(_shear_x(jnp.swapaxes(out, 1, 2), b * ys), 1, 2)
    return _shear_x(out, a * ys)


def _rot_window_size(out_size: int, margin: float) -> int:
    """Oversized-window side for the shear-rotate crops.

    Must satisfy Sp >= out_size * margin AND (Sp - out_size) even: the
    final center-crop offset is (Sp - S) // 2, and `shear_rotate` rotates
    about (Sp - 1) / 2 — an odd difference would put the S-window 0.5 px
    off the rotation center, silently misaligning the image against the
    keypoint/theta transforms (which rotate about the exact crop center).
    """
    import math

    extra = max(0, math.ceil(out_size * margin) - out_size)
    return out_size + extra + (extra % 2)


def rotated_separable_crop(
    images: jax.Array,
    centers: jax.Array,
    scales: jax.Array,
    rot: jax.Array,
    flips: jax.Array,
    out_size: int = CROP_SIZE,
    margin: float = 1.30,
) -> jax.Array:
    """MXU rotation-augmentation crop: separable crop to an oversized
    window, 3-shear rotate by the batch-shared angle, center-crop.

    The window side is `ceil(out * margin)` with same-parity padding
    (margin 1.30 covers |rot| <= ~0.45 rad: cos + sin <= 1.296) so rotated
    corners stay inside resampled content and the center-crop lands
    exactly on the rotation center for even AND odd out_size. Matches
    `affine_crop`'s geometry (same source box, same zero padding) with
    multi-pass bilinear resampling.

    Flip does not commute with rotation, and flips are per-sample while
    the shear angle is batch-shared — so the crop runs UNflipped, and the
    mirror is applied as an exact column reversal at the end (mirroring
    about the crop center is an integer-index reverse).
    """
    S = out_size
    Sp = _rot_window_size(S, margin)
    big = jax.vmap(partial(separable_crop, out_size=Sp))(
        images, centers, scales * (Sp / S), jnp.zeros_like(scales)
    )
    rot_big = shear_rotate(big, rot)
    lo = (Sp - S) // 2
    out = rot_big[:, lo : lo + S, lo : lo + S, :]
    flip_mask = (jnp.asarray(flips, jnp.float32) > 0)[:, None, None, None]
    return jnp.where(flip_mask, out[:, :, ::-1, :], out)


def bucket_rotated_separable_crop(
    images: jax.Array,
    centers: jax.Array,
    scales: jax.Array,
    bucket_angles: jax.Array,
    assign: jax.Array,
    flips: jax.Array,
    out_size: int = CROP_SIZE,
    margin: float = 1.30,
) -> jax.Array:
    """PER-SAMPLE rotation angles at MXU speed: K angle buckets.

    Each sample's angle is one of the K static `bucket_angles`; the batch
    is 3-shear-rotated once per bucket (shared-angle weights -> banded
    matmuls) and each sample selects its bucket's result. Cost is K x the
    batch-shared rotation (~K * 2-3 ms @B=128) — between 'batch' (one
    angle/step, 4.4 ms prep) and 'sample' (exact continuous angles via
    gathers, 395 ms). Accumulated as sum_k mask_k * rot_k so peak memory
    stays at two crop buffers, not K.

    Args:
        bucket_angles: (K,) the static-count bucket centers (values may be
            traced). assign: (B,) int32 bucket index per sample.
    """
    S = out_size
    Sp = _rot_window_size(S, margin)
    big = jax.vmap(partial(separable_crop, out_size=Sp))(
        images, centers, scales * (Sp / S), jnp.zeros_like(scales)
    )
    lo = (Sp - S) // 2
    K = bucket_angles.shape[0]
    out = jnp.zeros((images.shape[0], S, S, images.shape[-1]), jnp.float32)
    for k in range(K):  # static unroll over buckets
        rot_k = shear_rotate(big, bucket_angles[k])[:, lo : lo + S, lo : lo + S, :]
        mask = (assign == k).astype(jnp.float32)[:, None, None, None]
        out = out + mask * rot_k
    flip_mask = (jnp.asarray(flips, jnp.float32) > 0)[:, None, None, None]
    return jnp.where(flip_mask, out[:, :, ::-1, :], out)


@partial(jax.jit, static_argnames=("out_size", "dtype"))
def preprocess_crops(
    images: jax.Array,
    centers: jax.Array,
    scales: jax.Array,
    rots: Optional[jax.Array] = None,
    flips: Optional[jax.Array] = None,
    out_size: int = CROP_SIZE,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Batched on-device preprocessing: N boxes -> N normalized crops.

    Args:
        images:  (N, H, W, C) raw frames in [0, 255] (one per box — for the
                 multi-person single-frame path, broadcast the frame first;
                 XLA keeps it as one buffer).
        centers: (N, 2), scales: (N,), rots/flips: (N,) optional.
        dtype:   crop compute/output dtype. bfloat16 is the serving fast
                 path for bf16 encoders (see `separable_crop`); float32 is
                 the exact path (training / parity eval).

    Returns:
        (N, out_size, out_size, C) normalized crops in [-1, 1], `dtype`.

    Fast path: without rotation (rots is None — a STATIC choice) the crop
    is separable and runs as MXU matmuls (`separable_crop`); the general
    gather path only serves rotation augmentation in training.
    """
    N = images.shape[0]
    if rots is None:
        flips = jnp.zeros((N,), jnp.float32) if flips is None else flips
        crops = jax.vmap(partial(separable_crop, out_size=out_size, dtype=dtype))(
            images, centers, scales, flips
        )
        return (crops * jnp.asarray(PIXEL_SCALE, dtype) + jnp.asarray(PIXEL_BIAS, dtype)).astype(dtype)
    flips = jnp.zeros((N,), jnp.float32) if flips is None else flips
    crops = jax.vmap(partial(affine_crop, out_size=out_size))(
        images, centers, scales, rots, flips
    )
    return normalize_image(crops).astype(dtype)
