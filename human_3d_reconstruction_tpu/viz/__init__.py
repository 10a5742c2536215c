"""Visualization: mesh-overlay rendering (native C++ rasterizer + fallback)."""

from human_3d_reconstruction_tpu.viz.renderer import (
    overlay_mesh,
    overlay_meshes,
    project_verts_to_pixels,
    rasterizer_backend,
)

__all__ = [
    "overlay_mesh",
    "overlay_meshes",
    "project_verts_to_pixels",
    "rasterizer_backend",
]
