"""Visualization: mesh-overlay rendering.

Host path: native C++ rasterizer + numpy fallback (renderer.py).
Device path: jittable XLA z-buffer rasterizer (device_raster.py) —
overlay + silhouettes with no host round-trip.
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

__all__ = [
    "overlay_mesh",
    "overlay_meshes",
    "overlay_meshes_device",
    "project_verts_to_pixels",
    "rasterize_depth",
    "rasterize_scene",
    "rasterizer_backend",
    "silhouette",
    "soft_silhouette",
]
