"""2D keypoint heatmap head: an independent keypoint source on the encoder.

The reference family's hybrid pipelines (regress, then SMPLify against 2D
keypoints — SURVEY.md §1 L5 "external detector") depend on a SEPARATE 2D
pose network at test time. This head makes that source self-contained: a
SimpleBaseline-style deconvolution stack on the encoder's spatial feature
map predicts K Gaussian heatmaps, decoded to sub-pixel coordinates with a
normalized spatial expectation. Because heatmap decoding is a different
estimator than IEF parameter regression (dense spatial evidence vs a global
feature vector), its keypoints carry independent signal the SMPLify
refinement can usefully pull toward — the literature-standard justification
for hybrid regression+fitting.

TPU-first choices:
- Targets are rendered ON DEVICE as separable Gaussians (two (B, K, S)
  vectors outer-product via einsum -> (B, H, W, K)) — no scatter, no
  gather, MXU-shaped (cf. the gather-cost findings in BASELINE.md).
- Decoding is a relu-normalized spatial expectation ("soft-argmax"):
  two axis reductions + two small dot products per joint — again no
  argmax/gather. For an MSE-trained symmetric Gaussian peak the
  expectation equals the peak location, so the decode is unbiased.
- GroupNorm (not BatchNorm) in the head: no running statistics, so the
  serving rewrite (fold_bn) and batch-1 latency path need no special
  cases, and train/eval behavior is identical.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.data.skeleton import NUM_KP


class KeypointHead(nn.Module):
    """Encoder spatial map (B, h, w, C) -> heatmaps (B, h*2^d, w*2^d, K)."""

    num_keypoints: int = NUM_KP
    filters: int = 256
    num_deconv: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i in range(self.num_deconv):
            x = nn.ConvTranspose(
                self.filters, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"deconv{i + 1}",
            )(x)
            x = nn.GroupNorm(
                num_groups=32, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"gn{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.Conv(
            self.num_keypoints, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="out",
        )(x)
        return x.astype(jnp.float32)


def _axis_centers(n: int) -> jnp.ndarray:
    """Cell-center coordinates of an n-cell axis in normalized [-1, 1]."""
    return (jnp.arange(n, dtype=jnp.float32) + 0.5) / n * 2.0 - 1.0


def soft_argmax(heatmaps: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Heatmaps (B, H, W, K) -> (coords (B, K, 2) in [-1, 1] xy, conf (B, K)).

    Relu-normalized spatial expectation: coords_x = E[x] under
    p = relu(h) / sum(relu(h)). Confidence is the clipped peak value —
    MSE training drives the peak of a confident prediction toward the
    Gaussian target's 1.0. No gather/argmax anywhere (TPU gathers cost
    ~0.7 ms/img/tap on v5e; two reductions + two dots are free by
    comparison).
    """
    B, H, W, K = heatmaps.shape
    p = nn.relu(heatmaps)
    norm = jnp.sum(p, axis=(1, 2)) + 1e-6                      # (B, K)
    ey = jnp.einsum("bhwk,h->bk", p, _axis_centers(H)) / norm  # rows -> y
    ex = jnp.einsum("bhwk,w->bk", p, _axis_centers(W)) / norm  # cols -> x
    conf = jnp.clip(jnp.max(heatmaps, axis=(1, 2)), 0.0, 1.0)
    return jnp.stack([ex, ey], axis=-1), conf


def soft_argmax_windowed(
    heatmaps: jnp.ndarray, window_px: float = 5.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Peak-localized soft-argmax: expectation restricted to a window.

    The global expectation (`soft_argmax`) is unbiased for a clean single
    Gaussian, but any secondary mode — the symmetric-limb ambiguity 2D pose
    heads notoriously produce — drags the coordinate toward the average of
    the modes. This decode first locates the dominant peak with reductions
    only (an equality mask against the per-map max; ties average), then
    takes the relu-normalized expectation over a `window_px`-radius box
    around it, so secondary modes outside the window contribute nothing.
    Still zero gathers: two max-reductions + broadcast comparisons + the
    same two einsum dots as the global decode.

    Sub-pixel bias note: the window is centered on the DISCRETE peak cell,
    which sits within half a cell of the true mode; with window_px=5 and
    the training sigma of 2 px the truncated-Gaussian asymmetry this causes
    is far below one cell (pinned in tests against the global decode on
    clean maps).
    """
    B, H, W, K = heatmaps.shape
    ys = _axis_centers(H)
    xs = _axis_centers(W)
    gmax = jnp.max(heatmaps, axis=(1, 2))                        # (B, K)
    peak = (heatmaps >= gmax[:, None, None, :]).astype(jnp.float32)
    pn = jnp.sum(peak, axis=(1, 2))                              # (B, K)
    py = jnp.einsum("bhwk,h->bk", peak, ys) / pn                 # (B, K)
    px = jnp.einsum("bhwk,w->bk", peak, xs) / pn
    ry = window_px * 2.0 / H
    rx = window_px * 2.0 / W
    win_y = (jnp.abs(ys[None, :, None] - py[:, None, :]) <= ry)  # (B, H, K)
    win_x = (jnp.abs(xs[None, :, None] - px[:, None, :]) <= rx)  # (B, W, K)
    win = win_y[:, :, None, :] & win_x[:, None, :, :]            # (B, H, W, K)
    p = nn.relu(heatmaps) * win.astype(heatmaps.dtype)
    norm = jnp.sum(p, axis=(1, 2)) + 1e-6
    ey = jnp.einsum("bhwk,h->bk", p, ys) / norm
    ex = jnp.einsum("bhwk,w->bk", p, xs) / norm
    conf = jnp.clip(gmax, 0.0, 1.0)
    return jnp.stack([ex, ey], axis=-1), conf


def gaussian_heatmap_targets(
    kp2d: jnp.ndarray,
    vis: jnp.ndarray,
    height: int,
    width: int,
    sigma_px: float = 2.0,
) -> jnp.ndarray:
    """Render (B, H, W, K) Gaussian targets from normalized [-1, 1] kp2d.

    Separable construction: per-axis Gaussian vectors (B, K, H) / (B, K, W)
    outer-product into the map via one einsum — dense elementwise + matmul,
    no scatter. `sigma_px` is the standard deviation in HEATMAP pixels
    (SimpleBaseline's convention); invisible joints render all-zero maps.
    """
    sig_y = sigma_px * 2.0 / height
    sig_x = sigma_px * 2.0 / width
    ys = _axis_centers(height)
    xs = _axis_centers(width)
    gy = jnp.exp(-0.5 * ((ys[None, None, :] - kp2d[:, :, 1:2]) / sig_y) ** 2)
    gx = jnp.exp(-0.5 * ((xs[None, None, :] - kp2d[:, :, 0:1]) / sig_x) ** 2)
    target = jnp.einsum("bkh,bkw->bhwk", gy, gx)
    return target * vis[:, None, None, :]


def heatmap_loss(
    heatmaps: jnp.ndarray,
    kp2d: jnp.ndarray,
    vis: jnp.ndarray,
    sigma_px: float = 2.0,
) -> jnp.ndarray:
    """Visibility-masked MSE against on-device Gaussian targets.

    Per-joint mean-squared map error, averaged over VISIBLE joints only —
    an occluded (or aug-cropped-out) joint contributes no gradient, exactly
    like the 2D reprojection loss's visibility mask.
    """
    B, H, W, K = heatmaps.shape
    target = gaussian_heatmap_targets(kp2d, vis, H, W, sigma_px=sigma_px)
    per_joint = jnp.mean((heatmaps - target) ** 2, axis=(1, 2))  # (B, K)
    return jnp.sum(per_joint * vis) / jnp.maximum(jnp.sum(vis), 1.0)
