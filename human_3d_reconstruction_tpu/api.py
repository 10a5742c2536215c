"""Public mesh-recovery API — the reference-parity surface.

BASELINE north_star: "Match the reference's public API (image in, SMPL
theta/beta + mesh + 2D/3D joints out)". One call:

    out = recover_mesh(variables, smpl_params, images)

where `images` are normalized NHWC 224x224 crops. Everything — encoder, IEF
loop, SMPL decode, weak-perspective projection — runs as ONE jitted device
program with no host round-trips (north_star requirement). The SMPL decode
path is selectable: "xla" (pure-JAX twin) or "pallas" (fused kernels).

Reference call-stack twin: demo.py main (SURVEY.md section 3.2).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax

from human_3d_reconstruction_tpu.models.hmr import HMRModel, HMROutput
from human_3d_reconstruction_tpu.smpl.forward import smpl_forward
from human_3d_reconstruction_tpu.utils.geometry import orthographic_project


class MeshRecoveryOutput(NamedTuple):
    """The reference's public outputs (SURVEY.md section 3.2 last line)."""

    theta: jax.Array      # (B, 72) SMPL pose
    beta: jax.Array       # (B, 10) SMPL shape
    cam: jax.Array        # (B, 3) weak-perspective camera [s, tx, ty]
    verts: jax.Array      # (B, 6890, 3) mesh vertices
    joints3d: jax.Array   # (B, 24, 3) skeleton joints
    eval_joints3d: jax.Array  # (B, K, 3) regressed eval keypoints
    joints2d: jax.Array   # (B, K, 2) projected keypoints (crop coords, [-1,1])
    # Heatmap-head detections — present only for kp_head models (None
    # otherwise). Unlike joints2d (the SMPL reprojection) these are an
    # INDEPENDENT observation of the image, usable as fitting anchors.
    kp2d_det: jax.Array | None = None  # (B, 14, 2) crop coords [-1, 1]
    kp_conf: jax.Array | None = None   # (B, 14) peak confidence [0, 1]


def decode_params(
    smpl_params: dict, theta: jax.Array, beta: jax.Array, cam: jax.Array,
    smpl_path: str = "xla",
) -> MeshRecoveryOutput:
    """(theta, beta, cam) -> full mesh-recovery output (pure function)."""
    if smpl_path == "pallas":
        from human_3d_reconstruction_tpu.ops.fused_smpl import smpl_forward_fused

        smpl_out = smpl_forward_fused(smpl_params, theta, beta)
    else:
        smpl_out = smpl_forward(smpl_params, theta, beta)
    joints2d = orthographic_project(smpl_out.eval_joints, cam)
    return MeshRecoveryOutput(
        theta=theta,
        beta=beta,
        cam=cam,
        verts=smpl_out.verts,
        joints3d=smpl_out.joints,
        eval_joints3d=smpl_out.eval_joints,
        joints2d=joints2d,
    )


def recover_mesh_fn(
    model: HMRModel,
    variables: Any,
    smpl_params: dict,
    images: jax.Array,
    smpl_path: str = "xla",
) -> MeshRecoveryOutput:
    """Un-jitted body: images (B, 224, 224, 3) -> MeshRecoveryOutput."""
    if getattr(model.config, "fused_stages", False):
        # Serving schedule: Pallas-fused ResNet stages 1-2 (same weights,
        # same math — models/fused_encoder.py).
        from human_3d_reconstruction_tpu.models.fused_encoder import (
            hmr_forward_fused,
        )

        net_out: HMROutput = hmr_forward_fused(model, variables, images)
    else:
        net_out = model.apply(variables, images, train=False)
    out = decode_params(smpl_params, net_out.theta, net_out.beta, net_out.cam, smpl_path)
    det = getattr(net_out, "kp2d_det", None)
    if det is not None:  # kp_head models also surface their detections
        out = out._replace(kp2d_det=det, kp_conf=net_out.kp_conf)
    return out


def make_recover_mesh(model: HMRModel, smpl_path: str = "xla"):
    """Build the jitted flagship entry: (variables, smpl_params, images) -> out.

    variables/smpl_params are jit-traced arguments (donated nothing), so one
    compiled program serves any checkpoint.
    """
    fn = partial(recover_mesh_fn, model, smpl_path=smpl_path)
    return jax.jit(fn)


def _preprocess_dtype_for(model: HMRModel, override=None):
    """bf16 crops for bf16 encoders; f32 exact path otherwise.

    The bf16 crop path's worst-case pixel error is ~2.5e-2 of [-1, 1]
    (pinned in tests/test_preprocess.py) — larger than one bf16 input
    rounding, but the end-to-end mm-scale drift of the bf16 serving config
    is what's actually pinned (tpu_checks metric-level parity). Measured
    0.64 -> 0.40 ms @B=128. Pass `override` to force either dtype."""
    import jax.numpy as jnp

    if override is not None:
        return override
    return (
        jnp.bfloat16
        if model.config.encoder_dtype == jnp.bfloat16
        else jnp.float32
    )


def make_recover_from_frames(
    model: HMRModel, smpl_path: str = "xla", crop_size: int = 224,
    preprocess_dtype=None,
):
    """Full-fusion entry: raw frames + boxes -> mesh recovery, ONE program.

    Fuses the on-device preprocessing (crop/resize/normalize) into the same
    XLA program as the encoder/IEF/SMPL decode — the north star's "single
    jit'd device program with no host round-trips", and one dispatch fewer
    per step than preprocess_crops + recover_mesh.

    Returns jitted fn(variables, smpl_params, frames, centers, scales) ->
    MeshRecoveryOutput; frames (B, H, W, 3) in [0, 255].
    """
    from human_3d_reconstruction_tpu.data.preprocess import preprocess_crops

    dtype = _preprocess_dtype_for(model, preprocess_dtype)

    def fn(variables, smpl_params, frames, centers, scales):
        crops = preprocess_crops(
            frames, centers, scales, out_size=crop_size, dtype=dtype
        )
        return recover_mesh_fn(model, variables, smpl_params, crops, smpl_path=smpl_path)

    return jax.jit(fn)


def make_recover_from_single_frame(
    model: HMRModel, smpl_path: str = "xla", crop_size: int = 224,
    preprocess_dtype=None,
):
    """Serving entry: ONE frame + N boxes -> mesh recovery, ONE program.

    The frame is passed once (H, W, 3) and broadcast to the person axis
    *inside* the trace, so XLA keeps a single HBM buffer instead of
    materializing B identical copies (a 1080p frame at bucket 128 would
    otherwise cost ~3.2 GB).

    Returns jitted fn(variables, smpl_params, frame, centers, scales) ->
    MeshRecoveryOutput; frame (H, W, 3) in [0, 255], centers (B, 2),
    scales (B,).
    """
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.data.preprocess import preprocess_crops

    dtype = _preprocess_dtype_for(model, preprocess_dtype)

    def fn(variables, smpl_params, frame, centers, scales):
        B = centers.shape[0]
        frames = jnp.broadcast_to(frame[None], (B, *frame.shape))
        crops = preprocess_crops(
            frames, centers, scales, out_size=crop_size, dtype=dtype
        )
        return recover_mesh_fn(model, variables, smpl_params, crops, smpl_path=smpl_path)

    return jax.jit(fn)


def make_refined_recover_from_single_frame(
    model: HMRModel,
    smpl_path: str = "xla",
    crop_size: int = 224,
    refine_steps: int = 30,
    refine_lr: float = 0.02,
    preprocess_dtype=None,
    pose_prior=None,
    lambda_pose_prior: float = 1e-3,
    lambda_angle_prior: float = 0.0,
):
    """Hybrid regression+fitting serving entry, ONE device program.

    The literature-standard hybrid (regress, then SMPLify against detector
    keypoints) as a single jitted program: preprocess -> encoder/IEF ->
    `fitting.refine_params` scan -> final SMPL decode. No host round-trips
    between the regressor and the fit (on tunneled hosts each would cost
    ~27 ms/dispatch).

    Returns jitted fn(variables, smpl_params, raw_smpl, frame, centers,
    scales, kp2d, vis) -> MeshRecoveryOutput; kp2d (B, K, 2) observed
    keypoints in FRAME pixel coords (transformed to crop coords inside the
    trace), vis (B, K) visibility. `raw_smpl` is the unprepared SMPL dict
    the differentiable fit runs through (the final decode still uses
    `smpl_path`'s params, e.g. the Pallas-prepared set).
    """
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.data.preprocess import (
        preprocess_crops,
        transform_keypoints,
    )
    from human_3d_reconstruction_tpu.fitting import refine_params

    dtype = _preprocess_dtype_for(model, preprocess_dtype)

    def fn(variables, smpl_params, raw_smpl, frame, centers, scales, kp2d, vis):
        B = centers.shape[0]
        frames = jnp.broadcast_to(frame[None], (B, *frame.shape))
        crops = preprocess_crops(
            frames, centers, scales, out_size=crop_size, dtype=dtype
        )
        net = recover_mesh_fn(model, variables, smpl_params, crops, smpl_path=smpl_path)
        kp_crop = jax.vmap(transform_keypoints)(kp2d, centers, scales)
        fit = refine_params(
            raw_smpl, net.theta, net.beta, net.cam, kp_crop, vis,
            num_steps=refine_steps, lr=refine_lr,
            pose_prior=pose_prior, lambda_pose_prior=lambda_pose_prior,
            lambda_angle_prior=lambda_angle_prior,
        )
        return decode_params(smpl_params, fit.theta, fit.beta, fit.cam, smpl_path)

    return jax.jit(fn)


def make_self_refined_recover_from_single_frame(
    model: HMRModel,
    smpl_path: str = "xla",
    crop_size: int = 224,
    refine_steps: int = 30,
    refine_lr: float = 0.02,
    preprocess_dtype=None,
    pose_prior=None,
    lambda_pose_prior: float = 1e-3,
    lambda_angle_prior: float = 0.0,
):
    """Self-contained hybrid serving entry: NO external keypoints needed.

    Same hybrid regression+fitting pipeline as
    `make_refined_recover_from_single_frame`, but the 2D observations come
    from the model's OWN heatmap head (config.kp_head=True,
    models/keypoint_head.py): preprocess -> encoder -> {IEF params,
    heatmap keypoints} -> SMPLify scan pulling the regressed pose toward
    the head's keypoints, weighted by their per-joint confidence. One
    device program; the head's decode is already in crop coords, so no
    keypoint transform is needed.

    Returns jitted fn(variables, smpl_params, raw_smpl, frame, centers,
    scales) -> MeshRecoveryOutput.
    """
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.data.preprocess import preprocess_crops
    from human_3d_reconstruction_tpu.fitting import refine_params

    if not getattr(model.config, "kp_head", False):
        raise ValueError(
            "self-refined recovery needs a model with config.kp_head=True "
            "(otherwise pass kp2d explicitly via the refined entry)"
        )
    dtype = _preprocess_dtype_for(model, preprocess_dtype)

    def fn(variables, smpl_params, raw_smpl, frame, centers, scales):
        B = centers.shape[0]
        frames = jnp.broadcast_to(frame[None], (B, *frame.shape))
        crops = preprocess_crops(
            frames, centers, scales, out_size=crop_size, dtype=dtype
        )
        net: HMROutput = model.apply(variables, crops, train=False)
        if net.kp2d_det is None:  # trace-time check (e.g. int8 model class)
            raise ValueError(
                "model forward returned no detected keypoints — the "
                "self-refined path needs the standard HMRModel with kp_head"
            )
        fit = refine_params(
            raw_smpl, net.theta, net.beta, net.cam, net.kp2d_det, net.kp_conf,
            num_steps=refine_steps, lr=refine_lr,
            pose_prior=pose_prior, lambda_pose_prior=lambda_pose_prior,
            lambda_angle_prior=lambda_angle_prior,
        )
        return decode_params(smpl_params, fit.theta, fit.beta, fit.cam, smpl_path)

    return jax.jit(fn)


def make_recover_from_clip(
    model: HMRModel, smpl_path: str = "xla", crop_size: int = 224,
    preprocess_dtype=None,
):
    """Clip entry: F frames x N boxes each -> mesh recovery, ONE program.

    Amortizes the per-call dispatch (on tunneled/remote hosts ~27 ms — see
    CLAUDE.md) over a whole clip: all F*N crops run the encoder/IEF/SMPL as
    one batched program. Each frame broadcasts to its N boxes inside the
    trace (per-frame single HBM buffer, as in the single-frame entry).

    Returns jitted fn(variables, smpl_params, frames, centers, scales) ->
    MeshRecoveryOutput with leading axes (F, N); frames (F, H, W, 3) in
    [0, 255], centers (F, N, 2), scales (F, N).
    """
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.data.preprocess import preprocess_crops

    dtype = _preprocess_dtype_for(model, preprocess_dtype)

    def fn(variables, smpl_params, frames, centers, scales):
        F, N = scales.shape

        def per_frame(frame, c, s):
            fr = jnp.broadcast_to(frame[None], (N, *frame.shape))
            return preprocess_crops(fr, c, s, out_size=crop_size, dtype=dtype)

        crops = jax.vmap(per_frame)(frames, centers, scales)
        crops = crops.reshape(F * N, *crops.shape[2:])
        out = recover_mesh_fn(model, variables, smpl_params, crops, smpl_path=smpl_path)
        return jax.tree.map(lambda x: x.reshape(F, N, *x.shape[1:]), out)

    return jax.jit(fn)
