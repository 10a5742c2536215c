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

Person boxes: when the source has no box, center/scale are derived from the
keypoint extent with the HMR-family margin (1.2x the tight keypoint box).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

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


CONVERTERS = {
    "lsp": convert_lsp,
    "lsp_ext": convert_lsp,
    "coco": convert_coco,
    "mpii": convert_mpii,
    "h36m": convert_h36m,
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
