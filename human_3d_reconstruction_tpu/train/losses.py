"""HMR training losses, pure JAX.

Reference parity (SURVEY.md section 2 "Trainer"; HMR paper section 3):

    L_G = lambda_kp * L1(2D reprojection, visibility-masked)
        + lambda_3d * MSE(3D joints, root-centered, has_3d-masked)
        + lambda_param * MSE(theta-as-rotmats, beta; has_smpl-masked)
        + lambda_adv * sum_k (D_k(fake) - 1)^2          (LSGAN)
    L_D = sum_k (D_k(real) - 1)^2 + D_k(fake)^2

Notes vs the reference:
- theta supervision compares ROTATION MATRICES, not raw axis-angle —
  axis-angle is multivalued (theta and theta + 2*pi*axis are the same
  rotation); the rotmat distance is what HMR-family trainers actually use.
- every mask reduction divides by the mask count, not the batch size, so
  mixed 2D/3D batches don't dilute the 3D gradient.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.utils.geometry import rodrigues


@dataclasses.dataclass(frozen=True)
class LossWeights:
    kp2d: float = 60.0
    joints3d: float = 60.0
    smpl_params: float = 60.0
    adversarial: float = 1.0
    shape_reg: float = 0.0  # optional beta L2 when no adversarial prior
    # GMM pose-prior NLL on the final predicted theta (smpl/pose_prior.py);
    # active when make_train_step receives a pose_prior. The
    # likelihood-based alternative to the adversarial prior.
    pose_prior: float = 0.0
    # 2D keypoint heatmap MSE (models/keypoint_head.py); active when the
    # model config has kp_head=True. Gaussian-map MSE values are ~1e-2
    # scale, so weights around 100 put it on par with the other terms.
    kp_heatmap: float = 0.0
    # SPIN-style in-the-loop fitting supervision (Kolotouros et al. 2019):
    # param loss against SMPLify pseudo-ground-truth fitted IN-GRAPH from
    # the network's own prediction (trainer.TrainConfig.spin_fit_steps).
    # Same scale as smpl_params; active only for samples WITHOUT real SMPL
    # GT whose fit passes the quality gate.
    spin: float = 0.0


def _masked_mean(err: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of err over entries where mask > 0 (safe for empty masks).

    The mask is binarized: visibility/has-GT flags are predicates, not
    weights — fractional or negative annotation values must not scale or
    flip the loss.
    """
    mask = (mask > 0).astype(jnp.float32)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def keypoint_2d_loss(pred2d: jax.Array, gt2d: jax.Array, vis: jax.Array) -> jax.Array:
    """L1 reprojection loss in normalized crop coords.

    pred2d (B, K, 2); gt2d (B, K, 2); vis (B, K).
    """
    err = jnp.sum(jnp.abs(pred2d - gt2d), axis=-1)  # (B, K)
    return _masked_mean(err, vis)


def joints_3d_loss(
    pred3d: jax.Array, gt3d: jax.Array, has_3d: jax.Array
) -> jax.Array:
    """MSE on root-centered 3D joints; has_3d (B,) masks samples without GT."""
    pred_c = pred3d - jnp.mean(pred3d, axis=1, keepdims=True)
    gt_c = gt3d - jnp.mean(gt3d, axis=1, keepdims=True)
    err = jnp.mean(jnp.sum((pred_c - gt_c) ** 2, axis=-1), axis=-1)  # (B,)
    return _masked_mean(err, has_3d)


def smpl_param_loss(
    pred_theta: jax.Array,
    pred_beta: jax.Array,
    gt_theta: jax.Array,
    gt_beta: jax.Array,
    has_smpl: jax.Array,
) -> jax.Array:
    """MSE over (rotmat(theta), beta) for samples with SMPL GT."""
    B = pred_theta.shape[0]
    pred_R = rodrigues(pred_theta.reshape(B, 24, 3))
    gt_R = rodrigues(gt_theta.reshape(B, 24, 3))
    rot_err = jnp.mean((pred_R - gt_R) ** 2, axis=(1, 2, 3))  # (B,)
    beta_err = jnp.mean((pred_beta - gt_beta) ** 2, axis=-1)  # (B,)
    return _masked_mean(rot_err + beta_err, has_smpl)


def adversarial_g_loss(fake_scores: jax.Array) -> jax.Array:
    """LSGAN generator term: push D(fake) -> 1. fake_scores (B, 25)."""
    return jnp.mean(jnp.sum((fake_scores - 1.0) ** 2, axis=1))


def adversarial_d_loss(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    """LSGAN discriminator term: D(real) -> 1, D(fake) -> 0."""
    real_term = jnp.mean(jnp.sum((real_scores - 1.0) ** 2, axis=1))
    fake_term = jnp.mean(jnp.sum(fake_scores**2, axis=1))
    return real_term + fake_term
