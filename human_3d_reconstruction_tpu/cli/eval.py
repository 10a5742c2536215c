"""Evaluation CLI: Human3.6M protocol, MPJPE / PA-MPJPE (BASELINE config 4).

Usage:
    python -m human_3d_reconstruction_tpu.cli.eval h36m_eval \
        [--eval.index_path=h36m_val.npz --checkpoint=dir] [overrides]

Without --eval.index_path a synthetic eval stream is used (bring-up mode).
Prints the per-action table to stderr and the summary JSON to stdout;
writes the full report to --eval.report_path.

Reference call-stack twin: eval.py (SURVEY.md section 3.4).
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp


def main(argv: list[str]) -> None:
    from human_3d_reconstruction_tpu.api import make_recover_mesh
    from human_3d_reconstruction_tpu.cli.common import (
        build_model,
        build_smpl,
        echo,
        init_variables,
        restore_checkpoint_variables,
        smpl_device_params,
    )
    from human_3d_reconstruction_tpu.config import load_config
    from human_3d_reconstruction_tpu.data.preprocess import preprocess_crops
    from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
    from human_3d_reconstruction_tpu.eval.protocol import (
        load_eval_batches,
        run_protocol,
        synthetic_eval_batches,
    )

    from human_3d_reconstruction_tpu.cli.common import split_own_args

    own, overrides = split_own_args(argv, ("checkpoint", "checkpoint_step"))
    config = load_config(overrides)

    smpl_model = build_smpl(config)
    model = build_model(config, own)
    variables = init_variables(config, model)
    variables = restore_checkpoint_variables(own, variables)
    from human_3d_reconstruction_tpu.cli.common import apply_serving_rewrite

    model, variables = apply_serving_rewrite(model, variables)
    smpl_params = smpl_device_params(config, smpl_model)
    recover = make_recover_mesh(model, smpl_path=config.smpl_path)

    def run_model(images, centers, scales):
        crops = preprocess_crops(
            jnp.asarray(images), jnp.asarray(centers), jnp.asarray(scales),
            out_size=config.data.crop_size,
        )
        return recover(variables, smpl_params, crops)

    if config.preset == "batched_crops":
        # BASELINE config 3: 2D reprojection / PCK eval on LSP/MPII-style data.
        from human_3d_reconstruction_tpu.data.datasets import (
            DATASET_REGISTRY,
            SyntheticImageDataset,
        )
        from human_3d_reconstruction_tpu.eval.kp2d import (
            kp2d_batches_from_dataset,
            run_kp2d_eval,
        )

        if config.eval.index_path:
            ds = DATASET_REGISTRY["lsp"](config.eval.index_path)
            echo(f"kp2d eval on {config.eval.index_path}")
        else:
            ds = SyntheticImageDataset(smpl_model, n=32)
            echo("no --eval.index_path: synthetic kp2d eval")
        report = run_kp2d_eval(
            lambda i, c, s: run_model(i, c, s).joints2d[:, :NUM_KP],
            kp2d_batches_from_dataset(ds, config.eval.batch_size),
            report_path=config.eval.report_path,
        )
        echo(f"mean L1 {report.mean_l1:.4f}  " + "  ".join(f"{k}={v:.3f}" for k, v in report.pck.items()))
        print(report.to_json())
        return

    if config.flip_eval and config.fit_steps > 0:
        raise SystemExit(
            "error: --flip_eval composes only with plain regression eval "
            "(--fit_steps would need mirrored observations too); pick one"
        )
    if config.fit_steps > 0:
        # SMPLify-style test-time refinement: fit (theta, beta, cam) to the
        # dataset's 2D keypoints (as a detector stand-in), then score 3D.
        # The WHOLE predict — preprocess + HMR + fit scan + final decode —
        # is ONE jitted program: with tail-padded batches an entire eval run
        # compiles exactly two programs (predict + score), and no SMPL math
        # ever runs eagerly (the ~27 ms/op tunnel dispatch trap).
        from human_3d_reconstruction_tpu.api import recover_mesh_fn
        from human_3d_reconstruction_tpu.data.preprocess import transform_keypoints
        from human_3d_reconstruction_tpu.fitting import refine_params
        from human_3d_reconstruction_tpu.smpl.forward import smpl_forward

        raw_smpl = jax.tree.map(jnp.asarray, smpl_model.as_dict())
        echo(f"test-time refinement ON: {config.fit_steps} steps/batch "
             f"(keypoint source: {config.fit_source})")

        # Optional GMM pose prior in the refinement objective. 'mosh' fits
        # from the configured pool (or the synthetic stand-in) at startup;
        # the fitted prior is a small pytree the jitted program closes over.
        pose_prior = None
        if config.fit_pose_prior:
            from human_3d_reconstruction_tpu.smpl.pose_prior import (
                resolve_pose_prior,
            )

            mosh = None
            if config.fit_pose_prior == "mosh":
                from human_3d_reconstruction_tpu.data.datasets import (
                    MoshParamSource,
                )

                mosh = (
                    MoshParamSource.from_npz(config.data.mosh_path)
                    if config.data.mosh_path
                    else MoshParamSource.synthetic(
                        np.random.default_rng(config.seed)
                    )
                )
            pose_prior = resolve_pose_prior(config.fit_pose_prior, mosh=mosh)
            echo(
                f"pose prior ON ({config.fit_pose_prior}, "
                f"K={pose_prior.means.shape[0]}, "
                f"weight={config.fit_prior_weight})"
            )

        from functools import partial

        if config.fit_source not in ("gt", "self"):
            raise SystemExit(
                f"error: --fit_source must be 'gt' or 'self', got "
                f"{config.fit_source!r}"
            )
        if config.fit_source == "self" and not getattr(
            model.config, "kp_head", False
        ):
            raise SystemExit(
                "error: --fit_source=self needs a keypoint-head model "
                "(--train.hmr.kp_head=true, matching the checkpoint)"
            )

        @partial(jax.jit, static_argnames=("fit_steps",))
        def fit_predict(variables, images, centers, scales, kp2d, *, fit_steps):
            crops = preprocess_crops(
                images, centers, scales, out_size=config.data.crop_size
            )
            out = recover_mesh_fn(
                model, variables, smpl_params, crops, smpl_path=config.smpl_path
            )
            kp_crop = jax.vmap(transform_keypoints)(kp2d[:, :, :2], centers, scales)
            result = refine_params(
                raw_smpl, out.theta, out.beta, out.cam,
                kp_crop, kp2d[:, :, 2], num_steps=fit_steps,
                pose_prior=pose_prior,
                lambda_pose_prior=config.fit_prior_weight,
            )
            refined = smpl_forward(raw_smpl, result.theta, result.beta)
            return refined.eval_joints[:, :NUM_KP]

        @partial(jax.jit, static_argnames=("fit_steps",))
        def fit_predict_self(variables, images, centers, scales, *, fit_steps):
            # Self-contained refinement: the model's OWN heatmap-head
            # detections (confidence-weighted) replace the dataset kp2d —
            # no GT leakage into the fit, works on unannotated streams.
            crops = preprocess_crops(
                images, centers, scales, out_size=config.data.crop_size
            )
            net = model.apply(variables, crops, train=False)
            result = refine_params(
                raw_smpl, net.theta, net.beta, net.cam,
                net.kp2d_det, net.kp_conf, num_steps=fit_steps,
                pose_prior=pose_prior,
                lambda_pose_prior=config.fit_prior_weight,
            )
            refined = smpl_forward(raw_smpl, result.theta, result.beta)
            return refined.eval_joints[:, :NUM_KP]

        def predict_joints(images, centers, scales, batch=None):
            if config.fit_source == "self":
                return fit_predict_self(
                    variables,
                    jnp.asarray(images),
                    jnp.asarray(centers),
                    jnp.asarray(scales),
                    fit_steps=config.fit_steps,
                )
            if batch is None or batch.kp2d is None:
                return run_model(images, centers, scales).eval_joints3d[:, :NUM_KP]
            return fit_predict(
                variables,
                jnp.asarray(images),
                jnp.asarray(centers),
                jnp.asarray(scales),
                jnp.asarray(batch.kp2d),
                fit_steps=config.fit_steps,
            )
    elif config.flip_eval:
        # Flip-averaged evaluation (HMR/SPIN-family test-time trick): ONE
        # jitted program runs the predictor on the crop and its horizontal
        # mirror, un-mirrors the second prediction, and averages.
        from functools import partial

        from human_3d_reconstruction_tpu.api import recover_mesh_fn
        from human_3d_reconstruction_tpu.eval.protocol import unflip_joints3d

        echo("flip-averaged eval ON (2x predictor FLOPs, one program)")
        # Flip averaging assumes a mirror-symmetric body template (real
        # SMPL). On an asymmetric one the mirrored branch is out-of-model
        # — measured 461 mm vs the direct branch's 56 mm on the synthetic
        # stand-in — so warn loudly instead of silently averaging it in.
        from human_3d_reconstruction_tpu.smpl.pose_aug import (
            template_mirror_error,
        )

        _tme = template_mirror_error(smpl_params)
        if _tme > 0.03:
            echo(
                f"WARNING: body template mirror residual {_tme:.3f} m > "
                "0.03 m — flip averaging will DEGRADE results on this "
                "template (see smpl/pose_aug.py::template_mirror_error)"
            )

        @jax.jit
        def flip_avg_predict(variables, images, centers, scales):
            crops = preprocess_crops(
                images, centers, scales, out_size=config.data.crop_size
            )
            fwd = partial(
                recover_mesh_fn, model, variables, smpl_params,
                smpl_path=config.smpl_path,
            )
            j = fwd(crops).eval_joints3d[:, :NUM_KP]
            j_flip = fwd(crops[:, :, ::-1, :]).eval_joints3d[:, :NUM_KP]
            return 0.5 * (j + unflip_joints3d(j_flip))

        def predict_joints(images, centers, scales):
            return flip_avg_predict(
                variables, jnp.asarray(images), jnp.asarray(centers),
                jnp.asarray(scales),
            )
    else:
        def predict_joints(images, centers, scales):
            return run_model(images, centers, scales).eval_joints3d[:, :NUM_KP]

    if config.eval.index_path:
        batches = load_eval_batches(config.eval.index_path, config.eval.batch_size)
        echo(f"evaluating {config.eval.index_path}")
    else:
        batches = synthetic_eval_batches(smpl_model, num_batches=4, batch_size=8)
        echo("no --eval.index_path: synthetic eval stream")

    report = run_protocol(predict_joints, batches, report_path=config.eval.report_path)
    echo(report.table())
    echo(f"report written to {config.eval.report_path}")
    print(report.to_json())


if __name__ == "__main__":
    main(sys.argv[1:])
