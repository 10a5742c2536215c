"""Mesh file export (OBJ/PLY) for the recovered SMPL meshes."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_obj(path: str | Path, verts: np.ndarray, faces: np.ndarray) -> None:
    """Write a Wavefront OBJ (verts (V,3) float, faces (F,3) 0-based int)."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64) + 1  # OBJ is 1-based
    with open(path, "w") as f:
        f.write("# human_3d_reconstruction_tpu mesh\n")
        np.savetxt(f, verts, fmt="v %.6f %.6f %.6f")
        np.savetxt(f, faces, fmt="f %d %d %d")


def save_ply(path: str | Path, verts: np.ndarray, faces: np.ndarray) -> None:
    """Write a binary-free ASCII PLY."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        np.savetxt(f, verts, fmt="%.6f %.6f %.6f")
        np.savetxt(f, np.concatenate([np.full((len(faces), 1), 3), faces], axis=1), fmt="%d")


def load_obj(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ reader (v/f lines only) for round-trip tests."""
    verts, faces = [], []
    for line in Path(path).read_text().splitlines():
        if line.startswith("v "):
            verts.append([float(x) for x in line.split()[1:4]])
        elif line.startswith("f "):
            faces.append([int(x.split("/")[0]) - 1 for x in line.split()[1:4]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int64)


def uv_sphere(
    rows: int = 64, cols: int = 108, radius: float = 1.0, center=(0.0, 0.0, 0.0)
) -> tuple[np.ndarray, np.ndarray]:
    """Lat/long sphere tessellation: (V, 3) verts, (F, 3) faces.

    A spatially-LOCAL topology (adjacent faces share edges, triangles are
    small), unlike the synthetic SMPL model's random-triple faces — the
    realistic workload shape for rasterizer tests/benches: real SMPL bodies
    have ~2-6 px triangles at 480p. rows x cols gives 2*rows*cols faces
    (64 x 108 ~ 13.8k, one SMPL body's count).
    """
    th = np.linspace(0, np.pi, rows + 1)
    ph = np.linspace(0, 2 * np.pi, cols, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    verts = np.stack(
        [
            radius * np.sin(T) * np.cos(P),
            radius * np.sin(T) * np.sin(P),
            radius * np.cos(T),
        ],
        axis=-1,
    ).reshape(-1, 3).astype(np.float32) + np.asarray(center, np.float32)

    def vid(r, c):
        return r * cols + (c % cols)

    faces = []
    for r in range(rows):
        for c in range(cols):
            a, b = vid(r, c), vid(r, c + 1)
            d, e = vid(r + 1, c), vid(r + 1, c + 1)
            faces.append([a, d, b])
            faces.append([b, d, e])
    return verts, np.asarray(faces, np.int32)
