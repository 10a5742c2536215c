"""Preemption safety: SIGTERM during training checkpoints and exits cleanly."""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
class TestPreemption:
    def test_sigterm_checkpoints_and_exits(self, tmp_path):
        env = os.environ.copy()
        env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
        ckpt = tmp_path / "ckpt"
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from human_3d_reconstruction_tpu.cli.train import main; "
            "main(['single_image', '--total_steps=100000', '--log_every=1', "
            "'--save_every=100000', '--data.batch_size=2', "
            "'--data.synthetic_size=4', '--data.crop_size=48', "
            f"'--checkpoint_dir={ckpt}'])"
        )
        proc = subprocess.Popen(
            [sys.executable, "-c", code],
            env=env,
            cwd=tmp_path,
            stderr=subprocess.PIPE,
            text=True,
        )
        # Wait until training is actually stepping (first metric log line).
        deadline = time.time() + 420
        stepping = False
        lines = []
        while time.time() < deadline:
            line = proc.stderr.readline()
            lines.append(line)
            if line.startswith("step "):
                stepping = True
                break
            if proc.poll() is not None:
                break
        assert stepping, "".join(lines)[-2000:]

        proc.send_signal(signal.SIGTERM)
        rest, _ = None, None
        try:
            out = proc.communicate(timeout=300)[0]
        except subprocess.TimeoutExpired:
            proc.kill()
            pytest.fail("train did not exit after SIGTERM")
        assert proc.returncode == 0
        # a checkpoint step directory must exist
        saved = [p for p in ckpt.iterdir() if p.name.isdigit()] if ckpt.exists() else []
        assert saved, list(ckpt.iterdir()) if ckpt.exists() else "no ckpt dir"
