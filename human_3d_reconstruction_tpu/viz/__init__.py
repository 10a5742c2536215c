"""Visualization: mesh-overlay rendering.

Host path: native C++ rasterizer + numpy fallback (renderer.py).
Device path: jittable XLA z-buffer rasterizer (device_raster.py) —
overlay + silhouettes with no host round-trip; tiled_raster.py adds the
two-level bbox-binned variants (same semantics, O(P*K) instead of O(P*F)
for spatially-local meshes, dense fallback on overflow).
"""

from human_3d_reconstruction_tpu.viz.device_raster import (
    overlay_meshes_device,
    rasterize_depth,
    rasterize_scene,
    silhouette,
    soft_silhouette,
)
from human_3d_reconstruction_tpu.viz.renderer import (
    overlay_mesh,
    overlay_meshes,
    project_verts_to_pixels,
    rasterizer_backend,
)
from human_3d_reconstruction_tpu.viz.tiled_raster import (
    rasterize_depth_tiled,
    rasterize_scene_tiled,
    soft_silhouette_tiled,
)

__all__ = [
    "overlay_mesh",
    "overlay_meshes",
    "overlay_meshes_device",
    "project_verts_to_pixels",
    "rasterize_depth",
    "rasterize_depth_tiled",
    "rasterize_scene",
    "rasterize_scene_tiled",
    "rasterizer_backend",
    "silhouette",
    "soft_silhouette",
    "soft_silhouette_tiled",
]
