"""Dataset-derived mean SMPL parameters — the IEF regressor's seed.

Reference parity: the reference initializes its iterative regressor from a
`mean_theta` file computed over the mosh'd training poses (SURVEY.md
section 2 "IEF regressor": "init from mean θ/β; mean_theta file"). Here the
mean is derived from whatever pose pool feeds the discriminator
(`MoshParamSource`), persisted next to the checkpoints, and restored by the
inference CLIs so train/serve see the same seed.

Averaging rotations: axis-angle vectors do NOT average linearly (the mean
of +pi and -pi rotations about one axis is NOT the identity's neighbor).
Each joint's mean is the chordal (Frobenius) mean: average the rotation
MATRICES over the pool and project back onto SO(3) via SVD — the classic
closed-form L2 rotation mean — then log back to axis-angle. Betas average
linearly (they live in a linear PCA space); the camera seed stays the
conventional [0.9, 0, 0] (scale, tx, ty) since mosh pools carry no camera.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

NUM_SMPL_PARAMS = 85  # theta 72 + beta 10 + cam 3


def _rodrigues_np(aa: np.ndarray) -> np.ndarray:
    """(N, 3) axis-angle -> (N, 3, 3), vectorized numpy (f64 internally)."""
    aa = np.asarray(aa, np.float64)
    angle = np.linalg.norm(aa, axis=-1, keepdims=True)  # (N, 1)
    axis = aa / np.maximum(angle, 1e-12)
    s = np.sin(angle)[..., None]
    c = np.cos(angle)[..., None]
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = np.zeros_like(x)
    K = np.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1
    ).reshape(-1, 3, 3)
    eye = np.eye(3)[None]
    R = eye + s * K + (1.0 - c) * (K @ K)
    # angle ~ 0: exact identity (avoids 0/0 in axis)
    small = (angle < 1e-10)[..., None]
    return np.where(small, eye, R)


def _log_so3_np(R: np.ndarray) -> np.ndarray:
    """(J, 3, 3) rotation matrices -> (J, 3) axis-angle, angle in [0, pi]."""
    R = np.asarray(R, np.float64)
    cos = np.clip((np.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    angle = np.arccos(cos)  # (J,)
    vee = np.stack(
        [R[:, 2, 1] - R[:, 1, 2], R[:, 0, 2] - R[:, 2, 0], R[:, 1, 0] - R[:, 0, 1]],
        axis=-1,
    )  # = 2 sin(angle) * axis
    sin = np.sin(angle)
    generic = vee * (angle / np.maximum(2.0 * sin, 1e-12))[:, None]
    small = vee * 0.5  # angle -> 0: log(R) ~ vee/2
    # angle -> pi: axis from the dominant column of (R + I) / 2.
    Rp = (R + np.eye(3)[None]) / 2.0
    col = np.argmax(np.linalg.norm(Rp, axis=1), axis=-1)
    axis_pi = Rp[np.arange(len(R)), :, col]
    axis_pi = axis_pi / np.maximum(np.linalg.norm(axis_pi, axis=-1, keepdims=True), 1e-12)
    # Sign of the near-pi axis from vee (zero exactly at pi; either sign valid there).
    sign = np.where(np.sum(axis_pi * vee, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    near_pi = (axis_pi * sign) * angle[:, None]
    out = np.where(angle[:, None] < 1e-6, small, generic)
    return np.where(angle[:, None] > np.pi - 1e-3, near_pi, out)


def _project_so3(M: np.ndarray) -> np.ndarray:
    """(J, 3, 3) arbitrary matrices -> nearest rotations (Frobenius)."""
    U, _, Vt = np.linalg.svd(M)
    det = np.linalg.det(U @ Vt)
    D = np.repeat(np.eye(3)[None], len(M), axis=0)
    D[:, 2, 2] = det
    return U @ D @ Vt


def mean_params_from_pool(
    thetas: np.ndarray,
    betas: np.ndarray,
    cam: tuple[float, float, float] = (0.9, 0.0, 0.0),
) -> np.ndarray:
    """(N, 72) poses + (N, >=10) shapes -> (85,) float32 IEF seed vector."""
    thetas = np.asarray(thetas, np.float64).reshape(len(thetas), 24, 3)
    R = _rodrigues_np(thetas.reshape(-1, 3)).reshape(len(thetas), 24, 3, 3)
    mean_R = _project_so3(R.mean(axis=0))  # chordal mean per joint
    mean_theta = _log_so3_np(mean_R).reshape(72)
    mean_beta = np.asarray(betas, np.float64)[:, :10].mean(axis=0)
    out = np.concatenate([mean_theta, mean_beta, np.asarray(cam, np.float64)])
    assert out.shape == (NUM_SMPL_PARAMS,)
    return out.astype(np.float32)


def save_mean_params(path: str | Path, mean: np.ndarray) -> None:
    np.savez(str(path), mean_params=np.asarray(mean, np.float32))


def load_mean_params(path: str | Path) -> np.ndarray:
    z = np.load(str(path))
    mean = np.asarray(z["mean_params"], np.float32)
    assert mean.shape == (NUM_SMPL_PARAMS,), mean.shape
    return mean


def mean_params_file(checkpoint_dir: str | Path) -> Path:
    """Canonical location: next to the checkpoints, restored by inference."""
    return Path(checkpoint_dir) / "mean_params.npz"


def _has_existing_checkpoints(checkpoint_dir: str | Path) -> bool:
    """True when the dir already holds saved training state.

    Structural check (digit-named Orbax step dirs, or the best-val subtree)
    so smpl/ stays free of a trainer/orbax import; layout pinned by
    tests/test_trainer.py's checkpoint round-trips.
    """
    d = Path(checkpoint_dir)
    if not d.is_dir():
        return False
    return any(
        c.is_dir() and (c.name.isdigit() or c.name == "best") for c in d.iterdir()
    )


def resolve_mean_params(
    spec: str, checkpoint_dir: str | Path, mosh=None
) -> np.ndarray | None:
    """Config-level resolution of the IEF seed.

    spec: '' -> None (neutral default seed); 'mosh' -> compute from the
    given MoshParamSource pool; any other string -> load that npz.

    Whatever seed training resolves is mirrored into the checkpoint dir's
    canonical `mean_params.npz` (and a STALE one from an earlier run is
    REMOVED for spec=''), because inference CLIs unconditionally restore
    that file — the checkpoint's weights are only meaningful against the
    seed they were trained with.
    """
    canonical = mean_params_file(checkpoint_dir)
    if not spec:
        # Training with the neutral seed: a leftover mean_params.npz from a
        # previous run in the same dir would silently re-seed inference.
        # BUT if the dir already holds checkpoints, this is a RESUME of the
        # run that wrote the seed (the trainer auto-restores latest) — its
        # weights were trained against that seed, and deleting it here would
        # rebuild the model neutral-seeded while restoring seeded weights,
        # corrupting the resumed run and every later inference. Refuse.
        if canonical.exists():
            if _has_existing_checkpoints(checkpoint_dir):
                raise ValueError(
                    f"{checkpoint_dir} holds checkpoints trained with the "
                    f"persisted IEF seed {canonical}, but this run requests "
                    f"the neutral seed (no --mean_params). Resuming would "
                    f"silently switch seeds under the restored weights. "
                    f"Pass --mean_params={canonical} (or the original "
                    f"'mosh') to resume, or point --checkpoint_dir at a "
                    f"fresh directory for a neutral-seed run."
                )
            canonical.unlink()
        return None
    if spec == "mosh":
        if mosh is None:
            raise ValueError("mean_params='mosh' needs a mosh source")
        mean = mean_params_from_pool(mosh.thetas, mosh.betas)
    else:
        mean = load_mean_params(spec)
    Path(checkpoint_dir).mkdir(parents=True, exist_ok=True)
    if not (spec != "mosh" and Path(spec).resolve() == canonical.resolve()):
        save_mean_params(canonical, mean)
    return mean


def maybe_load_mean_params(checkpoint_dir: str | Path) -> np.ndarray | None:
    """Inference restore: the persisted seed, or None for the neutral one."""
    p = mean_params_file(checkpoint_dir)
    return load_mean_params(p) if p.exists() else None
