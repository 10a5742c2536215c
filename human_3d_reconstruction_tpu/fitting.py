"""Test-time parameter refinement (SMPLify-style), fully jitted.

Refines the regressor's (theta, beta, cam) against observed 2D keypoints by
gradient descent through the differentiable SMPL decode — the classic
optimization stage HMR replaced, offered here as an optional post-process
(hybrid regression+fitting is standard in the family; cf. "Learnable
SMPLify", PAPERS.md). The whole optimization is one `lax.scan` inside jit:
no host round-trips, batched over persons.

Objective per sample:
    lambda_kp * L1(project(joints3d, cam), kp2d; vis)
  + lambda_prior_theta * ||theta - theta_init||^2     (stay near regression)
  + lambda_prior_beta  * ||beta||^2                   (shape prior)
  [+ lambda_pose_prior * GMM_NLL(theta_body)]         (optional — SMPLify's
     mixture pose prior, smpl/pose_prior.py; evaluated as K quadratics
     + logsumexp inside the same jitted scan)
  [+ lambda_mask * (1 - IoU(soft_silhouette, target_mask))]  (optional —
     SMPLify-with-silhouettes; the mask renders on device through the
     differentiable viz/device_raster.py::soft_silhouette, ~30 ms/step
     per body at 224^2 on the v5e, cheaper at smaller mask sizes)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
from human_3d_reconstruction_tpu.smpl.forward import smpl_forward
from human_3d_reconstruction_tpu.utils.geometry import orthographic_project


class FitResult(NamedTuple):
    theta: jax.Array        # (B, 72) refined pose
    beta: jax.Array         # (B, 10) refined shape
    cam: jax.Array          # (B, 3) refined camera
    loss_history: jax.Array # (steps,) objective per iteration (batch mean)


def refine_params(
    smpl_params: dict,
    theta: jax.Array,
    beta: jax.Array,
    cam: jax.Array,
    kp2d: jax.Array,
    vis: jax.Array,
    num_steps: int = 50,
    lr: float = 0.02,
    lambda_kp: float = 1.0,
    lambda_prior_theta: float = 0.1,
    lambda_prior_beta: float = 0.01,
    fit_beta: bool = True,
    fit_cam: bool = True,
    pose_prior=None,
    lambda_pose_prior: float = 1e-3,
    pose_prior_mode: str = "logsumexp",
    lambda_angle_prior: float = 0.0,
    parents: Optional[list[int]] = None,
    masks: Optional[jax.Array] = None,
    lambda_mask: float = 1.0,
    mask_sharpness: float = 2.0,
    mask_raster: str = "dense",
    mask_tile_cap: int = 2048,
    mask_tile_span: int = 0,
) -> FitResult:
    """Refine (theta, beta, cam) to the observed 2D keypoints.

    Args:
        smpl_params: SMPL param dict (raw; needs `joint_regressor` whose
            first 14 rows follow the LSP-14 convention).
        theta/beta/cam: (B, ...) initial estimates (e.g. HMR output).
        kp2d: (B, 14, 2) observed keypoints in normalized crop coords.
        vis:  (B, 14) visibility.
        fit_beta/fit_cam: freeze those variables when False.
        pose_prior: optional `smpl.pose_prior.PosePrior` (GMM over the
            69-d body pose); adds `lambda_pose_prior * NLL` to the
            objective. `pose_prior_mode='min'` uses SMPLify's
            min-of-quadratics bound instead of the exact mixture NLL.
        lambda_angle_prior: > 0 adds SMPLify's knee/elbow hyperextension
            penalty (`smpl.pose_prior.angle_prior`).
        masks: optional (B, Hm, Wm) target silhouettes over the crop
            ([-1, 1] maps to the mask edges); adds a soft-IoU term
            rendered through the differentiable device rasterizer.
        mask_raster: 'dense' (default; exact pixels-x-triangles lattice,
            correct for ANY topology including the synthetic test model's
            random-triple faces) or 'tiled' (two-level binned rasterizer —
            ~an order of magnitude faster for spatially-local meshes like
            real SMPL topology; no dense fallback since the render is
            vmapped over persons, so `mask_tile_cap` must cover the
            densest screen tile — generous at 2048 for SMPL).
        mask_tile_span: max face-bbox extent in tiles for the tiled
            binning; 0 (default) = the full tile grid, which makes
            silent span-truncation impossible for ANY triangle size at a
            measured ~14% step cost (v5e, B=2 @224^2, same session:
            1.44 vs 1.26 s/body). Set 3 for the fast path when the
            projected faces are known small (a few px + the 8 px soft
            band) — faces wider than span tiles would be silently
            truncated.

    Returns FitResult; jit-safe (static num_steps).
    """
    theta0 = jnp.asarray(theta, jnp.float32)
    beta0 = jnp.asarray(beta, jnp.float32)
    cam0 = jnp.asarray(cam, jnp.float32)
    kp2d = jnp.asarray(kp2d, jnp.float32)
    # Continuous observation weights: 0/1 GT visibility behaves exactly as
    # before, while heatmap-head confidences (the self-refined path feeds
    # kp_conf here) genuinely down-weight uncertain detections instead of
    # being binarized away.
    mask = jnp.maximum(jnp.asarray(vis, jnp.float32), 0.0)
    if masks is not None:
        masks = jnp.asarray(masks, jnp.float32)
        faces_arr = jnp.asarray(smpl_params["faces"], jnp.int32)
        Hm, Wm = int(masks.shape[1]), int(masks.shape[2])
        if mask_raster == "tiled":
            from functools import partial

            from human_3d_reconstruction_tpu.viz.tiled_raster import (
                soft_silhouette_tiled,
            )

            # chunk == cap: one scan step per render. Measured on v5e
            # (224^2, 13.8k faces, B=2, grad): cap1024/chunk256 32.7
            # ms/step vs cap1024/chunk1024 17.8 vs cap512/chunk512 11.8 —
            # the backward of a multi-step scan costs more than the larger
            # single-step lattice. span covers the FULL tile grid: with
            # the dense fallback off (vmap over persons), a face bbox
            # wider than span tiles would otherwise be silently truncated
            # to its first span x span tiles (e.g. close-up torso
            # triangles, or a transiently exploded cam mid-optimization);
            # full span makes cap the only overflow source, and that one
            # is sized by `mask_tile_cap`.
            from human_3d_reconstruction_tpu.viz.tiled_raster import DEFAULT_TILE

            span = mask_tile_span or max(
                -(-Hm // DEFAULT_TILE), -(-Wm // DEFAULT_TILE)
            )
            render_sil = partial(
                soft_silhouette_tiled,
                cap=mask_tile_cap,
                chunk=mask_tile_cap,
                fallback=False,
                span=span,
            )
        else:
            from human_3d_reconstruction_tpu.viz.device_raster import soft_silhouette

            render_sil = soft_silhouette

    def objective(params):
        th, be, cm = params["theta"], params["beta"], params["cam"]
        be_eff = be if fit_beta else jax.lax.stop_gradient(be)
        cm_eff = cm if fit_cam else jax.lax.stop_gradient(cm)
        out = smpl_forward(smpl_params, th, be_eff, parents=parents)
        pred2d = orthographic_project(out.eval_joints[:, :NUM_KP], cm_eff)
        err = jnp.sum(jnp.abs(pred2d - kp2d), axis=-1)  # (B, 14)
        l_kp = jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        l_pt = jnp.mean(jnp.sum((th - theta0) ** 2, axis=-1))
        l_pb = jnp.mean(jnp.sum(be_eff**2, axis=-1))
        total = lambda_kp * l_kp + lambda_prior_theta * l_pt + lambda_prior_beta * l_pb
        if pose_prior is not None:
            from human_3d_reconstruction_tpu.smpl.pose_prior import pose_nll

            total = total + lambda_pose_prior * jnp.mean(
                pose_nll(pose_prior, th, mode=pose_prior_mode)
            )
        if lambda_angle_prior > 0.0:
            from human_3d_reconstruction_tpu.smpl.pose_prior import angle_prior

            total = total + lambda_angle_prior * jnp.mean(angle_prior(th))
        if masks is not None:
            # project all verts to mask-pixel space and render soft
            # silhouettes (differentiable w.r.t. theta/beta/cam)
            v2d = orthographic_project(out.verts, cm_eff)  # (B, V, 2) in [-1, 1]
            vpx = jnp.stack(
                [
                    (v2d[..., 0] + 1.0) * 0.5 * Wm,
                    (v2d[..., 1] + 1.0) * 0.5 * Hm,
                    out.verts[..., 2],
                ],
                axis=-1,
            )
            sil = jax.vmap(
                lambda v: render_sil(v, faces_arr, Hm, Wm, sharpness=mask_sharpness)
            )(vpx)
            inter = jnp.sum(sil * masks, axis=(1, 2))
            union = jnp.sum(sil + masks, axis=(1, 2)) - inter
            l_mask = jnp.mean(1.0 - inter / jnp.maximum(union, 1.0))
            total = total + lambda_mask * l_mask
        return total

    tx = optax.adam(lr)
    params = {"theta": theta0, "beta": beta0, "cam": cam0}
    opt_state = tx.init(params)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=num_steps)
    return FitResult(
        theta=params["theta"],
        beta=params["beta"] if fit_beta else beta0,
        cam=params["cam"] if fit_cam else cam0,
        loss_history=losses,
    )


def refine_clip_params(
    smpl_params: dict,
    theta: jax.Array,
    beta: jax.Array,
    cam: jax.Array,
    kp2d: Optional[jax.Array] = None,
    vis: Optional[jax.Array] = None,
    num_steps: int = 30,
    lr: float = 0.02,
    lambda_kp: float = 1.0,
    lambda_data: float = 0.1,
    lambda_prior_beta: float = 0.01,
    lambda_vel: float = 2.0,
    lambda_accel: float = 200.0,
    lambda_cam_vel: float = 0.5,
    shared_beta: bool = True,
    pose_prior=None,
    lambda_pose_prior: float = 1e-3,
    parents: Optional[list[int]] = None,
) -> FitResult:
    """Temporal bundle refinement of one tracked person's clip stream.

    The video line of the HMR family smooths per-frame regressions with a
    causal filter (utils/smoothing.py One-Euro — what cli.video streams
    through). This is the OPTIMIZATION-based alternative (VIBE/SmoothNet-
    style offline smoothing, done as SMPLify over the whole window): all F
    frames enter ONE jitted lax.scan as a batch, and the objective couples
    them with

      lambda_data  * ||theta_t - theta_t^init||^2 (+ cam and beta data
                     terms; the beta anchor matters because adam's
                     scale-free steps would otherwise walk the shape
                     toward the zero-prior on negligible gradients)
      lambda_vel   * mean_t ||theta_t - theta_{t-1}||^2
      lambda_accel * mean_t ||j3d_{t+1} - 2 j3d_t + j3d_{t-1}||^2
                     (second difference of MODEL-SPACE eval joints, meters
                     — penalizing exactly what the accel-error metric in
                     eval/metrics.py::accel_error_mm measures)
      lambda_prior_beta * ||beta_shared||^2
      [+ lambda_kp * L1 reprojection when kp2d observations are given]
      [+ lambda_pose_prior * GMM NLL (smpl/pose_prior.py)]

    Unlike frame-wise filtering this (a) estimates ONE shape for the whole
    clip (`shared_beta`; a person's beta does not change frame to frame —
    per-frame regression noise on beta becomes jitter in limb lengths that
    no pose filter can remove), and (b) smooths in model space through the
    SMPL decode, so the result stays on the body manifold instead of being
    a per-channel signal filter.

    Args:
        theta/beta/cam: (F, 72)/(F, 10)/(F, 3) per-frame regressions of ONE
            tracked person (callers loop or vmap persons).
        kp2d/vis: optional (F, 14, 2)/(F, 14) observations in normalized
            crop coords (e.g. a kp_head model's detections); None = pure
            temporal smoothing anchored to the regression by the data term.
        shared_beta: optimize one (10,) shape broadcast to all frames
            (returned tiled to (F, 10)); False keeps per-frame betas free.

    Returns FitResult with (F, ...) arrays; jit-safe (static num_steps).
    """
    theta0 = jnp.asarray(theta, jnp.float32)
    cam0 = jnp.asarray(cam, jnp.float32)
    beta0_frames = jnp.asarray(beta, jnp.float32)
    F = theta0.shape[0]
    beta_init = (
        jnp.mean(beta0_frames, axis=0) if shared_beta else beta0_frames
    )
    if kp2d is not None:
        kp2d = jnp.asarray(kp2d, jnp.float32)
        # Continuous weights (confidences) — see refine_params.
        kmask = jnp.maximum(jnp.asarray(vis, jnp.float32), 0.0)

    def objective(params):
        th, be, cm = params["theta"], params["beta"], params["cam"]
        be_frames = jnp.broadcast_to(be, (F, be.shape[-1])) if shared_beta else be
        out = smpl_forward(smpl_params, th, be_frames, parents=parents)
        j3d = out.eval_joints[:, :NUM_KP]  # (F, 14, 3) model space

        l_data = (
            jnp.mean(jnp.sum((th - theta0) ** 2, axis=-1))
            + jnp.mean(jnp.sum((cm - cam0) ** 2, axis=-1))
            # Anchor shape to the per-frame regressions: in shared mode the
            # minimizer of sum_t ||b - beta0_t||^2 is their mean — the best
            # shape estimate absent image evidence.
            + jnp.mean(jnp.sum((be_frames - beta0_frames) ** 2, axis=-1))
        )
        l_vel = jnp.mean(jnp.sum((th[1:] - th[:-1]) ** 2, axis=-1))
        acc = j3d[2:] - 2.0 * j3d[1:-1] + j3d[:-2]
        l_accel = jnp.mean(jnp.sum(acc**2, axis=(-2, -1)))
        l_cam = jnp.mean(jnp.sum((cm[1:] - cm[:-1]) ** 2, axis=-1))
        l_beta = jnp.mean(jnp.sum(jnp.atleast_2d(be) ** 2, axis=-1))
        total = (
            lambda_data * l_data
            + lambda_vel * l_vel
            + lambda_accel * l_accel
            + lambda_cam_vel * l_cam
            + lambda_prior_beta * l_beta
        )
        if kp2d is not None:
            pred2d = orthographic_project(j3d, cm)
            err = jnp.sum(jnp.abs(pred2d - kp2d), axis=-1)  # (F, 14)
            total = total + lambda_kp * jnp.sum(err * kmask) / jnp.maximum(
                jnp.sum(kmask), 1.0
            )
        if pose_prior is not None:
            from human_3d_reconstruction_tpu.smpl.pose_prior import pose_nll

            total = total + lambda_pose_prior * jnp.mean(pose_nll(pose_prior, th))
        return total

    tx = optax.adam(lr)
    params = {"theta": theta0, "beta": beta_init, "cam": cam0}
    opt_state = tx.init(params)

    # Best-objective-so-far (including the INIT): adam's first steps move
    # every coordinate by ~lr regardless of gradient size (m-hat/sqrt(v-hat)
    # = +-1), so a short run on an already-smooth stream injects a transient
    # it never re-converges from. Returning the best visited iterate makes
    # the refinement no-worse-than-input by construction — on a stream with
    # nothing to fix it returns (almost exactly) the input.
    def step(carry, _):
        params, opt_state, best_loss, best_params = carry
        loss, grads = jax.value_and_grad(objective)(params)
        better = loss < best_loss
        best_loss = jnp.where(better, loss, best_loss)
        best_params = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), params, best_params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, best_loss, best_params), loss

    last, losses = jax.lax.scan(
        step, (params, opt_state, jnp.inf, params), None, length=num_steps
    )
    params_final, _, best_loss, params = last
    # The post-update final iterate can beat every pre-update one.
    final_better = objective(params_final) < best_loss
    params = jax.tree.map(
        lambda new, old: jnp.where(final_better, new, old), params_final, params
    )
    be = params["beta"]
    return FitResult(
        theta=params["theta"],
        beta=jnp.broadcast_to(be, (F, be.shape[-1])) if shared_beta else be,
        cam=params["cam"],
        loss_history=losses,
    )
