"""CLI entry-point smoke tests (subprocess, CPU, tiny shapes).

These guard the user-facing surfaces end-to-end: argument parsing, config
overrides, output files. Kept cheap with 48-px crops; each runs a real
`python -m ...` subprocess with the CPU backend forced.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def run_cli(module: str, args: list[str], cwd: Path, timeout: int = 600):
    env = os.environ.copy()
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    # Force CPU inside the subprocess (sitecustomize overrides JAX_PLATFORMS,
    # so go through a -c shim that uses jax.config before importing the CLI).
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import sys; from human_3d_reconstruction_tpu.cli.{module} import main; "
        f"main({args!r})"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
class TestCLISmoke:
    def test_smpl_forward_cli(self, tmp_path):
        r = run_cli(
            "smpl_forward",
            ["smpl_only", f"--obj={tmp_path}/m.obj"],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        blob = json.loads(r.stdout)
        assert blob["verts_shape"] == [1, 6890, 3]
        assert (tmp_path / "m.obj").exists()

    def test_demo_cli_multi_person(self, tmp_path):
        (tmp_path / "boxes.json").write_text("[[100,100,80],[200,150,90]]")
        r = run_cli(
            "demo",
            [
                "single_image",
                f"--boxes={tmp_path}/boxes.json",
                f"--out={tmp_path}/ov.png",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        blob = json.loads(r.stdout)
        assert blob["num_persons"] == 2
        assert (tmp_path / "ov.png").exists()

    def test_demo_cli_auto_proposal_zero_side_inputs(self, tmp_path):
        """Self-contained multi-person demo (VERDICT r3 #3): a raw frame
        with rendered bodies, NO boxes argument — the on-device proposal
        supplies them."""
        import cv2

        from tests.test_person_proposal import _body_frame

        frame = _body_frame(
            [(64.0, 96.0, 90.0), (192.0, 96.0, 90.0)], frame_hw=(192, 256)
        )
        cv2.imwrite(
            str(tmp_path / "scene.png"), cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
        )
        r = run_cli(
            "demo",
            [
                "single_image",
                f"--image={tmp_path}/scene.png",
                f"--out={tmp_path}/ov.png",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "auto person proposal" in r.stderr
        blob = json.loads(r.stdout)
        assert blob["num_persons"] >= 1
        assert (tmp_path / "ov.png").exists()

    def test_demo_cli_self_refine(self, tmp_path):
        """--refine_steps with a kp_head model: hybrid regression+fitting
        against the model's OWN heatmap keypoints, zero side inputs."""
        (tmp_path / "boxes.json").write_text("[[100,100,80]]")
        r = run_cli(
            "demo",
            [
                "single_image",
                f"--boxes={tmp_path}/boxes.json",
                f"--out={tmp_path}/ov.png",
                "--data.crop_size=48",
                "--train.hmr.kp_head=true",
                "--refine_steps=2",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "hybrid refinement" in r.stderr
        blob = json.loads(r.stdout)
        assert blob["num_persons"] == 1
        assert (tmp_path / "ov.png").exists()

    def test_demo_cli_refine_needs_kp_head(self, tmp_path):
        (tmp_path / "boxes.json").write_text("[[100,100,80]]")
        r = run_cli(
            "demo",
            [
                "single_image",
                f"--boxes={tmp_path}/boxes.json",
                "--data.crop_size=48",
                "--refine_steps=2",
            ],
            cwd=tmp_path,
        )
        assert r.returncode != 0
        assert "kp_head" in r.stderr

    def test_eval_cli_synthetic(self, tmp_path):
        r = run_cli(
            "eval",
            [
                "h36m_eval",
                f"--eval.report_path={tmp_path}/rep.json",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        blob = json.loads(r.stdout)
        assert "mpjpe_mm" in blob and np.isfinite(blob["mpjpe_mm"])
        assert (tmp_path / "rep.json").exists()

    def test_eval_cli_flip_averaged(self, tmp_path):
        """--flip_eval: flip-averaged prediction scores through the same
        protocol (one extra program), and is rejected alongside --fit_steps."""
        r = run_cli(
            "eval",
            [
                "h36m_eval",
                "--flip_eval=true",
                f"--eval.report_path={tmp_path}/rep.json",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        blob = json.loads(r.stdout)
        assert np.isfinite(blob["mpjpe_mm"])
        r2 = run_cli(
            "eval",
            [
                "h36m_eval", "--flip_eval=true", "--fit_steps=3",
                f"--eval.report_path={tmp_path}/rep2.json",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r2.returncode != 0 and "flip_eval" in r2.stderr

    def test_eval_cli_with_fit_steps(self, tmp_path):
        """--fit_steps: the fully-jitted refine path end-to-end."""
        r = run_cli(
            "eval",
            [
                "h36m_eval",
                "--fit_steps=2",
                f"--eval.report_path={tmp_path}/rep.json",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        blob = json.loads(r.stdout)
        assert "mpjpe_mm" in blob and np.isfinite(blob["mpjpe_mm"])
        assert "refinement ON" in r.stderr

    def test_eval_cli_with_fit_source_self(self, tmp_path):
        """--fit_source=self: refinement against the model's own heatmap
        detections (no GT keypoints enter the fit)."""
        r = run_cli(
            "eval",
            [
                "h36m_eval",
                "--fit_steps=2",
                "--fit_source=self",
                "--train.hmr.kp_head=true",
                f"--eval.report_path={tmp_path}/rep.json",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        blob = json.loads(r.stdout)
        assert "mpjpe_mm" in blob and np.isfinite(blob["mpjpe_mm"])
        assert "keypoint source: self" in r.stderr

    def test_eval_cli_fit_source_self_needs_kp_head(self, tmp_path):
        r = run_cli(
            "eval",
            ["h36m_eval", "--fit_steps=2", "--fit_source=self",
             "--data.crop_size=48"],
            cwd=tmp_path,
        )
        assert r.returncode != 0
        assert "kp_head" in r.stderr

    def test_eval_cli_with_fit_pose_prior(self, tmp_path):
        """--fit_pose_prior=mosh: GMM prior fit at startup, used in the
        jitted refinement objective."""
        r = run_cli(
            "eval",
            [
                "h36m_eval",
                "--fit_steps=2",
                "--fit_pose_prior=mosh",
                "--fit_prior_weight=0.001",
                f"--eval.report_path={tmp_path}/rep.json",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        blob = json.loads(r.stdout)
        assert "mpjpe_mm" in blob and np.isfinite(blob["mpjpe_mm"])
        assert "pose prior ON (mosh, K=8" in r.stderr

    def test_convert_annotations_usage_error(self, tmp_path):
        r = run_cli("convert_annotations", ["nope"], cwd=tmp_path)
        assert r.returncode == 2

    def test_demo_bad_image_clean_error(self, tmp_path):
        r = run_cli(
            "demo",
            ["single_image", "--image=/nope/missing.jpg", "--data.crop_size=48"],
            cwd=tmp_path,
        )
        assert r.returncode != 0
        assert "cannot read image" in r.stderr

    def test_demo_bad_boxes_clean_error(self, tmp_path):
        (tmp_path / "bad.json").write_text("[[1, 2]]")  # wrong width
        r = run_cli(
            "demo",
            ["single_image", f"--boxes={tmp_path}/bad.json", "--data.crop_size=48"],
            cwd=tmp_path,
        )
        assert r.returncode != 0
        assert "cx, cy, scale" in r.stderr

    def test_demo_save_meshes(self, tmp_path):
        r = run_cli(
            "demo",
            [
                "single_image",
                f"--save_meshes={tmp_path}/meshes",
                f"--out={tmp_path}/ov.png",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert (tmp_path / "meshes" / "person0.obj").exists()

    def test_video_cli_synthetic(self, tmp_path):
        """Video pipeline: synthetic clip -> tracked, smoothed overlays."""
        r = run_cli(
            "video",
            [
                "single_image",
                "--synthetic_frames=3",
                f"--out={tmp_path}/vout",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        blob = json.loads(r.stdout)
        assert blob["num_frames"] == 3 and blob["smoothed"] and blob["tracked"]
        assert (tmp_path / "vout" / "frame_00002.png").exists()
        rows = [
            json.loads(line)
            for line in (tmp_path / "vout" / "params.jsonl").read_text().splitlines()
        ]
        assert len(rows) == 3
        assert np.isfinite(np.asarray(rows[-1]["theta"])).all()
        # tracking moved the box off the initial full-frame default
        assert rows[0]["boxes"] != rows[-1]["boxes"]

    def test_video_cli_clip_refine(self, tmp_path):
        """--clip_refine_steps: temporal-bundle pass re-renders overlays and
        reports per-slot accel before/after (never catastrophically worse —
        the fit returns its best-objective iterate, including the init)."""
        r = run_cli(
            "video",
            [
                "--synthetic_frames=4",
                f"--out={tmp_path}/vout",
                "--clip_refine_steps=4",
                "--data.crop_size=48",
                "--train.hmr.encoder=resnet18",
                "--train.hmr.hidden_size=64",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        blob = json.loads(r.stdout)
        assert blob["num_frames"] == 4
        delta = blob["clip_refined"]
        assert delta and {"accel_before_mm", "accel_after_mm"} <= set(delta[0])
        assert delta[0]["accel_after_mm"] <= delta[0]["accel_before_mm"] * 1.25
        refined = [
            json.loads(line)
            for line in (tmp_path / "vout" / "params_refined.jsonl")
            .read_text()
            .splitlines()
        ]
        assert len(refined) == 4
        assert np.isfinite(np.asarray(refined[-1]["theta"])).all()
        assert (tmp_path / "vout" / "frame_00003.png").exists()

    def test_video_cli_clip_refine_kp_anchored(self, tmp_path):
        """--clip_refine_kp: the bundle fit anchors to the kp_head model's
        own per-frame detections inside the same pass (temporal hybrid)."""
        r = run_cli(
            "video",
            [
                "--synthetic_frames=3",
                f"--out={tmp_path}/vout",
                "--clip_refine_steps=3",
                "--clip_refine_kp",
                "--data.crop_size=48",
                "--train.hmr.encoder=resnet18",
                "--train.hmr.hidden_size=64",
                "--train.hmr.kp_head=true",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        blob = json.loads(r.stdout)
        assert blob["clip_refined"] and blob["num_frames"] == 3
        refined = [
            json.loads(line)
            for line in (tmp_path / "vout" / "params_refined.jsonl")
            .read_text()
            .splitlines()
        ]
        assert np.isfinite(np.asarray(refined[-1]["theta"])).all()
        # headless model + --clip_refine_kp must fail with a clear error
        r2 = run_cli(
            "video",
            [
                "--synthetic_frames=3",
                f"--out={tmp_path}/vout2",
                "--clip_refine_steps=3",
                "--clip_refine_kp",
                "--data.crop_size=48",
                "--train.hmr.encoder=resnet18",
                "--train.hmr.hidden_size=64",
            ],
            cwd=tmp_path,
        )
        assert r2.returncode != 0 and "kp_head" in r2.stderr

    def test_export_cli_roundtrip(self, tmp_path):
        """Export CLI -> artifact dir -> ExportedRecoverySession serves it."""
        r = run_cli(
            "export",
            [
                "single_image",
                f"--out={tmp_path}/art",
                "--frame=96x128",
                "--buckets=2",
                "--data.crop_size=48",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        from human_3d_reconstruction_tpu.serving_export import (
            ExportedRecoverySession,
        )

        srv = ExportedRecoverySession(tmp_path / "art")
        frame = np.random.default_rng(0).uniform(0, 255, (96, 128, 3))
        people = srv.recover(frame.astype(np.float32), [[64.0, 48.0, 70.0]])
        assert len(people) == 1
        assert people[0]["verts"].shape == (6890, 3)
        assert np.isfinite(people[0]["verts"]).all()

    def test_train_cli_with_echoing(self, tmp_path):
        """Train CLI wiring for --data.echo_factor (4 steps, 2 host batches)."""
        r = run_cli(
            "train",
            [
                "single_image",
                "--total_steps=4",
                "--log_every=1",
                "--data.echo_factor=2",
                "--data.batch_size=2",
                "--data.crop_size=48",
                "--data.synthetic_size=8",
                f"--checkpoint_dir={tmp_path}/ckpt",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "data echoing x2" in r.stderr or "data echoing x2" in r.stdout

    def test_train_cli_pose_prior_discriminator_free(self, tmp_path):
        """--pose_prior=mosh + --train.use_adversarial=false: the
        likelihood-prior training mode; the fitted prior persists next to
        the checkpoints."""
        r = run_cli(
            "train",
            [
                "single_image",
                "--total_steps=3",
                "--log_every=1",
                "--pose_prior=mosh",
                "--train.use_adversarial=false",
                "--data.batch_size=2",
                "--data.crop_size=48",
                "--data.synthetic_size=8",
                f"--checkpoint_dir={tmp_path}/ckpt",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "pose prior: mosh (K=8" in r.stderr
        assert (tmp_path / "ckpt" / "pose_prior.npz").exists()

    def test_train_cli_round3_features(self, tmp_path):
        """All round-3 training flags through the real CLI in one run:
        dataset-derived mean seed (persisted for inference), cosine lr
        schedule (decay_steps auto-filled), full augmentation incl. the
        MXU per-sample bucket-rotation path."""
        r = run_cli(
            "train",
            [
                "single_image",
                "--total_steps=3",
                "--log_every=1",
                "--mean_params=mosh",
                "--train.lr_schedule=cosine",
                "--train.aug_rot_max=0.3",
                "--train.aug_rot_mode=bucket",
                "--train.aug_rot_buckets=4",
                "--train.aug_scale_jitter=0.1",
                "--train.aug_flip=true",
                "--data.batch_size=2",
                "--data.crop_size=48",
                "--data.synthetic_size=8",
                f"--checkpoint_dir={tmp_path}/ckpt",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "IEF seed: mean over" in r.stderr
        assert "lr_schedule=cosine over 3 steps" in r.stderr
        # the seed persisted next to the checkpoints for inference restore
        assert (tmp_path / "ckpt" / "mean_params.npz").exists()

    def test_train_cli_inloop_validation(self, tmp_path):
        """--eval_every=N scores held-out MPJPE during training and logs
        val_mpjpe_mm rows to train_log.jsonl (disjoint-seed synthetic
        stream when no --eval.index_path)."""
        r = run_cli(
            "train",
            [
                "single_image",
                "--total_steps=2",
                "--log_every=1",
                "--eval_every=2",
                "--eval.batch_size=4",
                "--data.batch_size=2",
                "--data.crop_size=48",
                "--data.synthetic_size=8",
                f"--checkpoint_dir={tmp_path}/ckpt",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "val MPJPE" in r.stderr
        rows = [
            json.loads(line)
            for line in (tmp_path / "ckpt" / "train_log.jsonl").read_text().splitlines()
        ]
        val_rows = [x for x in rows if "val_mpjpe_mm" in x]
        assert val_rows and np.isfinite(val_rows[0]["val_mpjpe_mm"])
        assert np.isfinite(val_rows[0]["val_pa_mpjpe_mm"])
        # Best-val bookkeeping: a separate best/ checkpoint (own manager,
        # immune to the main manager's rolling GC) + a best_val.json record.
        best = json.loads((tmp_path / "ckpt" / "best_val.json").read_text())
        assert best["step"] == 2 and np.isfinite(best["mpjpe_mm"])
        assert (tmp_path / "ckpt" / "best" / "2").exists()
        assert "best val MPJPE" in r.stderr
        # Resume: the persisted best record seeds the tracker so a worse
        # later eval can't displace the pre-restart best checkpoint.
        r2 = run_cli(
            "train",
            [
                "single_image",
                "--total_steps=2",
                "--eval_every=2",
                "--eval.batch_size=4",
                "--data.batch_size=2",
                "--data.crop_size=48",
                "--data.synthetic_size=8",
                f"--checkpoint_dir={tmp_path}/ckpt",
            ],
            cwd=tmp_path,
        )
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "best-val record restored" in r2.stderr

    def test_train_cli_inloop_validation_real_index(self, tmp_path):
        """--eval_every against a real --eval.index_path: the index is
        decoded once and cached (small sets), and val rows still land."""
        import cv2

        rng = np.random.default_rng(3)
        n = 4
        paths = []
        for i in range(n):
            p = f"f{i}.png"
            cv2.imwrite(
                str(tmp_path / p), rng.integers(0, 255, (50, 60, 3)).astype(np.uint8)
            )
            paths.append(p)
        np.savez(
            tmp_path / "val_idx.npz",
            image_paths=np.asarray(paths),
            centers=np.tile([[30.0, 25.0]], (n, 1)).astype(np.float32),
            scales=np.full((n,), 40.0, np.float32),
            keypoints=rng.normal(size=(n, 17, 3)).astype(np.float32),
            joints3d=rng.normal(scale=0.3, size=(n, 17, 3)).astype(np.float32),
        )
        r = run_cli(
            "train",
            [
                "single_image",
                "--total_steps=2",
                "--log_every=1",
                "--eval_every=2",
                f"--eval.index_path={tmp_path}/val_idx.npz",
                "--eval.batch_size=4",
                "--data.batch_size=2",
                "--data.crop_size=48",
                "--data.synthetic_size=8",
                f"--checkpoint_dir={tmp_path}/ckpt",
            ],
            cwd=tmp_path,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "in-loop validation every 2 steps on" in r.stderr
        assert "val MPJPE" in r.stderr

    def test_package_main_usage(self, tmp_path):
        import subprocess, sys, os

        env = os.environ.copy()
        env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, "-m", "human_3d_reconstruction_tpu"],
            capture_output=True, text=True, env=env, timeout=120,
        )
        assert r.returncode == 0
        assert "entry points" in r.stderr
