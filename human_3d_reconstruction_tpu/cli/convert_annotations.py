"""Convert original dataset distributions to the framework's npz indices.

Reference parity: the reference's loaders parse each dataset's native
format (LSP joints.mat, MPII release .mat, COCO person_keypoints json,
H36M h5/cdf) directly in the hot path; here conversion happens once,
offline, and training reads only the uniform npz index (datasets.py schema:
image_paths, centers, scales, keypoints[, joints3d, thetas, betas]).

Usage:
    python -m human_3d_reconstruction_tpu.cli.convert_annotations \
        lsp  /data/lsp/joints.mat      out_lsp.npz
        coco /data/coco/person_keypoints_train2017.json out_coco.npz
        mpii /data/mpii/mpii_annotations.json out_mpii.npz
        h36m /data/h36m/annot.h5       out_h36m.npz
        mpi_inf_3dhp /data/3dhp/S1/Seq1/annot.mat out_3dhp.npz
        mosh /data/neutrSMPL_CMU/      out_mosh.npz

Person boxes: when the source has no box, center/scale are derived from the
keypoint extent with the HMR-family margin (1.2x the tight keypoint box).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def box_from_keypoints(kp: np.ndarray, margin: float = 1.2):
    """(K, 3) [x, y, vis] -> center (2,), scale () with standard margin."""
    vis = kp[:, 2] > 0
    pts = kp[vis, :2] if vis.any() else kp[:, :2]
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    center = (lo + hi) / 2.0
    scale = float(max(hi - lo) * margin)
    return center.astype(np.float32), np.float32(max(scale, 1.0))


def convert_lsp(mat_path: str, out_path: str, image_dir: str = "images") -> int:
    """LSP joints.mat: (3, 14, N) [x; y; visible(0=vis in LSP!)]."""
    from scipy.io import loadmat

    joints = loadmat(mat_path)["joints"]
    if joints.shape[0] == 3:
        joints = joints.transpose(2, 1, 0)  # (N, 14, 3)
    else:  # lsp-extended stores (14, 3, N)
        joints = joints.transpose(2, 0, 1)
    N = joints.shape[0]
    # LSP's third row means OCCLUDED (1 = occluded) -> vis = 1 - flag.
    kp = joints.astype(np.float32)
    kp[:, :, 2] = 1.0 - kp[:, :, 2]
    centers = np.zeros((N, 2), np.float32)
    scales = np.zeros((N,), np.float32)
    for i in range(N):
        centers[i], scales[i] = box_from_keypoints(kp[i])
    np.savez_compressed(
        out_path,
        image_paths=np.asarray([f"{image_dir}/im{i + 1:04d}.jpg" for i in range(N)]),
        centers=centers,
        scales=scales,
        keypoints=kp,
    )
    return N


def convert_coco(json_path: str, out_path: str, min_keypoints: int = 6) -> int:
    """COCO person_keypoints json -> one record per annotated person."""
    blob = json.loads(Path(json_path).read_text())
    images = {im["id"]: im["file_name"] for im in blob["images"]}
    paths, centers, scales, kps = [], [], [], []
    for ann in blob["annotations"]:
        if ann.get("num_keypoints", 0) < min_keypoints or ann.get("iscrowd"):
            continue
        kp = np.asarray(ann["keypoints"], np.float32).reshape(17, 3)
        kp[:, 2] = (kp[:, 2] == 2).astype(np.float32)  # 2 = labeled+visible
        x, y, w, h = ann["bbox"]
        paths.append(images[ann["image_id"]])
        centers.append([x + w / 2, y + h / 2])
        scales.append(max(w, h) * 1.2)
        kps.append(kp)
    np.savez_compressed(
        out_path,
        image_paths=np.asarray(paths),
        centers=np.asarray(centers, np.float32),
        scales=np.asarray(scales, np.float32),
        keypoints=np.stack(kps) if kps else np.zeros((0, 17, 3), np.float32),
    )
    return len(paths)


def convert_mpii(json_path: str, out_path: str) -> int:
    """MPII from the common community json export (one row per person):
    [{"image": name, "joints": [[x,y]*16], "joints_vis": [16], "center":
    [x,y], "scale": s}, ...] — scale is in 200px units per MPII convention.
    """
    rows = json.loads(Path(json_path).read_text())
    paths, centers, scales, kps = [], [], [], []
    for r in rows:
        kp = np.concatenate(
            [
                np.asarray(r["joints"], np.float32),
                np.asarray(r["joints_vis"], np.float32)[:, None],
            ],
            axis=1,
        )
        paths.append(r["image"])
        centers.append(r["center"])
        scales.append(float(r["scale"]) * 200.0)
        kps.append(kp)
    np.savez_compressed(
        out_path,
        image_paths=np.asarray(paths),
        centers=np.asarray(centers, np.float32),
        scales=np.asarray(scales, np.float32),
        keypoints=np.stack(kps) if kps else np.zeros((0, 16, 3), np.float32),
    )
    return len(paths)


def convert_h36m(h5_path: str, out_path: str) -> int:
    """H36M from the standard annot.h5 layout: imgname, center, scale
    (200px units), part (2D 17x2), S (3D 17x3, meters, root-relative),
    optionally pose/shape (mosh), action indices."""
    import h5py

    with h5py.File(h5_path, "r") as f:
        names = [
            n.decode() if isinstance(n, bytes) else str(n) for n in f["imgname"][:]
        ]
        centers = np.asarray(f["center"], np.float32)
        scales = np.asarray(f["scale"], np.float32) * 200.0
        part = np.asarray(f["part"], np.float32)  # (N, 17, 2)
        kp = np.concatenate([part, np.ones((*part.shape[:2], 1), np.float32)], axis=2)
        extras = {}
        if "S" in f:
            extras["joints3d"] = np.asarray(f["S"], np.float32)
        if "pose" in f:
            extras["thetas"] = np.asarray(f["pose"], np.float32)
        if "shape" in f:
            extras["betas"] = np.asarray(f["shape"], np.float32)
        if "action" in f:
            extras["actions"] = np.asarray(f["action"], np.int64)
    np.savez_compressed(
        out_path,
        image_paths=np.asarray(names),
        centers=centers,
        scales=scales,
        keypoints=kp,
        **extras,
    )
    return len(names)


# MPI-INF-3DHP annot.mat stores 28 joints per frame; the community-standard
# 17-joint subset (mpii_get_joint_set's "relevant" joints, 0-based) in the
# order head_top, neck, r_shoulder, r_elbow, r_wrist, l_shoulder, l_elbow,
# l_wrist, r_hip, r_knee, r_ankle, l_hip, l_knee, l_ankle, pelvis, spine,
# head — exactly the order data/skeleton.py::MPI3DHP_TO_LSP14 expects.
_3DHP_28_TO_17 = np.array(
    [7, 5, 14, 15, 16, 9, 10, 11, 23, 24, 25, 18, 19, 20, 4, 3, 6], dtype=np.int64
)


def _3dhp_cell(entry) -> list[np.ndarray]:
    """annot.mat per-camera cell -> list of (F, D) arrays.

    scipy.io.loadmat renders the MATLAB cell array as an object ndarray of
    shape (num_cameras, 1); tolerate a plain (F, D) array too (single-camera
    re-exports)."""
    arr = np.asarray(entry)
    if arr.dtype == object:
        # atleast_2d: squeeze drops the FRAME axis of a single-frame cell
        # ((1, 56) -> (56,)); restore it so (F, D) holds for F == 1 too.
        return [np.atleast_2d(np.asarray(c).squeeze()) for c in arr.ravel()]
    if arr.ndim == 2:
        return [arr]
    raise ValueError(f"unrecognized annot cell layout: shape={arr.shape}")


def convert_3dhp(
    mat_path: str,
    out_path: str,
    cameras: Optional[Sequence[int]] = None,
    stride: int = 1,
    image_pattern: str = "video_{cam}/frame_{frame:06d}.jpg",
) -> int:
    """MPI-INF-3DHP native annot.mat (one per subject/sequence) -> npz index.

    Layout per the official distribution: cells `annot2` ((F, 56) per
    camera, pixel coords) and `annot3` ((F, 84) per camera, camera-frame
    mm); 28 joints per frame, of which the standard 17 are kept
    (`_3DHP_28_TO_17`). Boxes come from the keypoint extent (the
    distribution has no person boxes); joints3d are converted to meters
    (the adapter root-centers them). `image_pattern` maps (camera, frame)
    to the frame files extracted from the distribution's imageSequence
    videos.
    """
    from scipy.io import loadmat

    blob = loadmat(mat_path)
    annot2 = _3dhp_cell(blob["annot2"])
    annot3 = _3dhp_cell(blob["annot3"])
    cams = list(cameras) if cameras is not None else list(range(len(annot2)))

    paths, centers, scales, kps, j3ds = [], [], [], [], []
    for cam in cams:
        a2 = annot2[cam].reshape(annot2[cam].shape[0], -1, 2)[:, _3DHP_28_TO_17]
        a3 = annot3[cam].reshape(annot3[cam].shape[0], -1, 3)[:, _3DHP_28_TO_17]
        for f in range(0, a2.shape[0], stride):
            kp = np.concatenate(
                [a2[f].astype(np.float32), np.ones((17, 1), np.float32)], axis=1
            )
            c, s = box_from_keypoints(kp)
            paths.append(image_pattern.format(cam=cam, frame=f))
            centers.append(c)
            scales.append(s)
            kps.append(kp)
            j3ds.append(a3[f].astype(np.float32) / 1000.0)  # mm -> m
    np.savez_compressed(
        out_path,
        image_paths=np.asarray(paths),
        centers=np.asarray(centers, np.float32),
        scales=np.asarray(scales, np.float32),
        keypoints=np.stack(kps) if kps else np.zeros((0, 17, 3), np.float32),
        joints3d=np.stack(j3ds) if j3ds else np.zeros((0, 17, 3), np.float32),
    )
    return len(paths)


_MOSH_POSE_KEYS = ("thetas", "poses", "pose", "new_poses", "fullpose")
_MOSH_BETA_KEYS = ("betas", "shape", "beta", "new_betas")


def _mosh_load_one(path: Path) -> tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """One raw mosh dump (.pkl or .npz) -> (poses (N, 72) | None, betas)."""
    if path.suffix == ".npz":
        blob = dict(np.load(str(path), allow_pickle=True))
    else:
        # Mosh pickles may embed chumpy objects; reuse the model-file shim.
        from human_3d_reconstruction_tpu.smpl.model_file import _ShimUnpickler, _dense

        with open(path, "rb") as f:
            raw = _ShimUnpickler(f, encoding="latin1").load()
        blob = {k: _dense(v) for k, v in raw.items()} if isinstance(raw, dict) else {}

    def pick(keys):
        for k in keys:
            if k in blob:
                return np.asarray(blob[k], np.float32)
        return None

    poses, betas = pick(_MOSH_POSE_KEYS), pick(_MOSH_BETA_KEYS)
    if poses is None:
        return None, None
    poses = np.atleast_2d(poses)
    if poses.shape[1] > 72:
        poses = poses[:, :72]  # SMPL-H/X dumps: body pose is the first 72
    return poses, betas


def convert_mosh(src_path: str, out_path: str, stride: int = 1) -> int:
    """Raw mosh dump(s) -> MoshParamSource npz {thetas (N, 72), betas (N, 10)}.

    `src_path` is a single .pkl/.npz or a directory scanned recursively
    (the CMU mosh distribution is one pickle per motion sequence). Per-file
    key variants are tolerated (poses/new_poses/thetas; betas/shape); a
    per-sequence (10,) beta row is broadcast across that sequence's poses.
    Feeds the discriminator's real-pose pool (SURVEY §2 "Discriminator").
    """
    src = Path(src_path)
    files = (
        sorted(p for suf in ("*.pkl", "*.npz") for p in src.rglob(suf))
        if src.is_dir()
        else [src]
    )
    all_t, all_b = [], []
    for f in files:
        poses, betas = _mosh_load_one(f)
        if poses is None:
            continue
        poses = poses[::stride]
        if betas is None:
            betas = np.zeros((len(poses), 10), np.float32)
        else:
            betas = np.atleast_2d(betas)[:, :10]
            if betas.shape[0] == 1:
                betas = np.broadcast_to(betas, (len(poses), 10)).copy()
            else:
                betas = betas[::stride][: len(poses)]
        if betas.shape[0] != poses.shape[0]:
            raise ValueError(f"{f}: {poses.shape[0]} poses vs {betas.shape[0]} betas")
        all_t.append(poses.astype(np.float32))
        all_b.append(betas.astype(np.float32))
    if not all_t:
        raise ValueError(f"no mosh pose arrays found under {src_path}")
    thetas = np.concatenate(all_t)
    betas = np.concatenate(all_b)
    np.savez_compressed(out_path, thetas=thetas, betas=betas)
    return len(thetas)


CONVERTERS = {
    "lsp": convert_lsp,
    "lsp_ext": convert_lsp,
    "coco": convert_coco,
    "mpii": convert_mpii,
    "h36m": convert_h36m,
    "mpi_inf_3dhp": convert_3dhp,
    "mosh": convert_mosh,
}


def main(argv: list[str]) -> None:
    if len(argv) < 3 or argv[0] not in CONVERTERS:
        print(
            f"usage: convert_annotations {{{'|'.join(CONVERTERS)}}} <src> <out.npz>",
            file=sys.stderr,
        )
        raise SystemExit(2)
    n = CONVERTERS[argv[0]](argv[1], argv[2])
    print(f"wrote {argv[2]}: {n} records")


if __name__ == "__main__":
    main(sys.argv[1:])
