"""Mesh-overlay renderer: weak-perspective projection + z-buffer rasterizer.

Reference parity: the reference's demo overlays the recovered SMPL mesh on
the input frame via a native renderer (SURVEY.md section 2 "Renderer" /
section 3.2 last stage). Here the rasterizer is a small dependency-free C++
library (native/rasterizer.cpp) compiled on first use with g++ and driven
through ctypes; a pure-numpy implementation provides an always-available
fallback and the correctness oracle for tests.

All host-side: visualization is not in any training/eval hot path.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from human_3d_reconstruction_tpu.utils.native_build import build_native

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "rasterizer.cpp"

_lib: Optional[ctypes.CDLL] = None
_backend = "unbuilt"


def _build_library() -> Optional[ctypes.CDLL]:
    """Compile the rasterizer on first use (content-addressed cached .so)."""
    global _backend
    try:
        lib = ctypes.CDLL(str(build_native(_SRC)))
        lib.rasterize_mesh.restype = ctypes.c_long
        lib.rasterize_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float,
        ]
        lib.rasterize_depth.restype = ctypes.c_long
        lib.rasterize_depth.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
        ]
        _backend = "cpp"
        return lib
    except Exception:
        _backend = "numpy"
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _backend == "unbuilt":
        _lib = _build_library()
    return _lib


def rasterizer_backend() -> str:
    """'cpp' or 'numpy' (after first use; 'unbuilt' before)."""
    _get_lib()
    return _backend


def project_verts_to_pixels(
    verts: np.ndarray,
    cam: np.ndarray,
    crop_center: np.ndarray,
    crop_scale: float,
) -> np.ndarray:
    """Weak-perspective verts -> full-frame pixel coords (+depth).

    cam = [s, tx, ty] maps model space to normalized crop coords
    ([-1, 1] over the person box, matching `orthographic_project` and
    `transform_keypoints`); the box (center, scale) places the crop in the
    frame. Depth keeps model-space z scaled by s (relative ordering only).
    """
    verts = np.asarray(verts, np.float32)
    s, tx, ty = (float(c) for c in np.asarray(cam, np.float32))
    crop_xy = s * (verts[:, :2] + np.array([tx, ty], np.float32))
    px = np.asarray(crop_center, np.float32) + crop_xy * (float(crop_scale) / 2.0)
    depth = verts[:, 2:3] * s
    return np.concatenate([px, depth], axis=1).astype(np.float32)


def _overlay_numpy(
    image: np.ndarray, verts_px: np.ndarray, faces: np.ndarray,
    color: np.ndarray, alpha: float,
) -> np.ndarray:
    """Pure-numpy twin of native rasterize_mesh (vectorized per face)."""
    H, W = image.shape[:2]
    out = image.astype(np.float32).copy()
    zbuf = np.full((H, W), np.inf, np.float32)
    shade = np.zeros((H, W), np.float32)
    hit = np.zeros((H, W), bool)

    tri = verts_px[faces]  # (F, 3, 3)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = np.cross(e1, e2)
    nz = n[:, 2] / (np.linalg.norm(n, axis=1) + 1e-12)
    lambert = 0.35 + 0.65 * np.abs(nz)

    for f in range(len(faces)):
        v0, v1, v2 = tri[f]
        denom = (v1[1] - v2[1]) * (v0[0] - v2[0]) + (v2[0] - v1[0]) * (v0[1] - v2[1])
        if abs(denom) < 1e-12:
            continue
        x0 = max(0, int(np.floor(tri[f, :, 0].min())))
        x1 = min(W - 1, int(np.ceil(tri[f, :, 0].max())))
        y0 = max(0, int(np.floor(tri[f, :, 1].min())))
        y1 = min(H - 1, int(np.ceil(tri[f, :, 1].max())))
        if x0 > x1 or y0 > y1:
            continue
        ys, xs = np.mgrid[y0 : y1 + 1, x0 : x1 + 1]
        px = xs + 0.5
        py = ys + 0.5
        w0 = ((v1[1] - v2[1]) * (px - v2[0]) + (v2[0] - v1[0]) * (py - v2[1])) / denom
        w1 = ((v2[1] - v0[1]) * (px - v2[0]) + (v0[0] - v2[0]) * (py - v2[1])) / denom
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        z = w0 * v0[2] + w1 * v1[2] + w2 * v2[2]
        region_z = zbuf[y0 : y1 + 1, x0 : x1 + 1]
        closer = inside & (z < region_z)
        region_z[closer] = z[closer]
        shade[y0 : y1 + 1, x0 : x1 + 1][closer] = lambert[f]
        hit[y0 : y1 + 1, x0 : x1 + 1] |= closer

    mesh_rgb = color[None, None, :] * shade[:, :, None]
    out[hit] = (1 - alpha) * out[hit] + alpha * mesh_rgb[hit]
    return out


def overlay_mesh(
    image: np.ndarray,
    verts_px: np.ndarray,
    faces: np.ndarray,
    color: Sequence[float] = (120.0, 160.0, 255.0),
    alpha: float = 0.85,
    force_numpy: bool = False,
) -> np.ndarray:
    """Render one mesh (pixel-space verts) over an RGB image.

    Args:
        image: (H, W, 3) float [0, 255].
        verts_px: (V, 3) [x_px, y_px, depth] — see project_verts_to_pixels.
        faces: (F, 3) int32.
    Returns a new (H, W, 3) float image.
    """
    image = np.ascontiguousarray(image, np.float32)
    verts_px = np.ascontiguousarray(verts_px, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    color_arr = np.asarray(color, np.float32)

    lib = None if force_numpy else _get_lib()
    if lib is None:
        return _overlay_numpy(image, verts_px, faces, color_arr, alpha)

    out = image.copy()
    lib.rasterize_mesh(
        verts_px.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(len(verts_px)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_long(len(faces)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(out.shape[0]),
        ctypes.c_long(out.shape[1]),
        color_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(alpha),
    )
    return out


_PERSON_COLORS = np.array(
    [
        (120, 160, 255), (255, 150, 110), (140, 230, 140),
        (240, 130, 210), (250, 220, 100), (130, 220, 225),
    ],
    np.float32,
)


def overlay_meshes(
    image: np.ndarray,
    verts_list: Sequence[np.ndarray],
    faces: np.ndarray,
    cams: Sequence[np.ndarray],
    centers: Sequence[np.ndarray],
    scales: Sequence[float],
    alpha: float = 0.85,
) -> np.ndarray:
    """Multi-person overlay (BASELINE config 5): one mesh per detection."""
    out = np.asarray(image, np.float32)
    for i, (verts, cam, center, scale) in enumerate(
        zip(verts_list, cams, centers, scales)
    ):
        verts_px = project_verts_to_pixels(verts, cam, center, scale)
        out = overlay_mesh(
            out, verts_px, faces, color=_PERSON_COLORS[i % len(_PERSON_COLORS)], alpha=alpha
        )
    return out
