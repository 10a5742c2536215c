"""Attribution probe for the tiled SCENE-payload rasterizer forward (r3+).

docs/STATUS.md gap 4 closed the Pallas question for the soft-silhouette
GRADIENT (data-movement-bound) but left the scene forward (23.4 ms @480p /
27.5k tris) unprobed. This script answers the same question for the scene
path before any kernel work: how much of the 23.4 ms is binning + payload
gathers (a Pallas tile kernel would NOT help) vs the per-tile argmin+select
lattice (a kernel could fuse z/shade/color into one VMEM-resident pass)?

Stages (scan-chained in-jit — single-call timings on this tunnel are
~27 ms dispatch-dominated):
  1. bin            — sort_key_val + searchsorted
  2. bin+gather     — + the (T, K, 3, 3) tri gather and (T, K) payloads
  3. depth-only     — full rasterize_depth_tiled (argmin lattice, no payload)
  4. scene          — full rasterize_scene_tiled (payload winners)
The (4 - 3) delta is what payload selection costs; (3 - 2) is the pure
lattice; if (2) dominates, a kernel is unjustified (same verdict as the
soft-grad probe).

Usage (real TPU): python benchmarks/probe_scene_raster.py [--size 480]
Workload: 2 uv-sphere bodies (~27.6k local tris) like BASELINE.md's rows.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp


def main() -> None:
    from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

    configure_compile_cache(5.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=480)  # 480 -> 480x640
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--span", type=int, default=3)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from human_3d_reconstruction_tpu.viz.mesh_io import uv_sphere
    from human_3d_reconstruction_tpu.viz.tiled_raster import (
        DEFAULT_TILE,
        _grid,
        _tile_bins,
        rasterize_depth_tiled,
        rasterize_scene_tiled,
    )

    H = args.size
    W = H * 4 // 3
    # Two bodies, SMPL-scale on-screen footprint (matches the BASELINE rows).
    v1, f1 = uv_sphere()  # 2 * 64 * 108 ~ 13.8k tris per body, 27.6k total
    verts, faces_list = [], []
    off = 0
    for cx in (W * 0.33, W * 0.66):
        vv = v1 * (H * 0.35) + np.asarray([cx, H * 0.5, 2.0])
        verts.append(vv.astype(np.float32))
        faces_list.append(f1 + off)
        off += len(vv)
    vj = jnp.asarray(np.concatenate(verts))
    faces = jnp.asarray(np.concatenate(faces_list).astype(np.int32))
    F = faces.shape[0]
    shade = jnp.asarray(np.random.default_rng(0).uniform(0.3, 1.0, F).astype(np.float32))
    color = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (F, 3)).astype(np.float32))
    tile = DEFAULT_TILE
    th, tw, _, _ = _grid(H, W, tile)
    print(
        f"devices: {jax.devices()}  {H}x{W}  F={F}  grid {th}x{tw} "
        f"cap {args.cap} span {args.span}",
        file=sys.stderr, flush=True,
    )

    def timed(name, fn, x):
        def chain(xx):
            def body(c, _):
                out = fn(c)
                return c + 0.0 * out, None

            return jax.lax.scan(body, xx, None, length=args.reps)[0]

        cj = jax.jit(chain)
        r = cj(x); float(np.asarray(r).ravel()[0])
        t0 = time.perf_counter()
        r = cj(x); float(np.asarray(r).ravel()[0])
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(json.dumps({"stage": name, "ms": round(dt, 2)}), flush=True)
        return dt

    def bins_only(vv):
        idx, valid, ovf = _tile_bins(vv[faces], th, tw, tile, args.cap, 0.0, span=args.span)
        return jnp.sum(idx) * 1.0

    timed("bin(sort+bounds)", bins_only, vj)

    def bins_gather(vv):
        tri = vv[faces]
        idx, valid, ovf = _tile_bins(tri, th, tw, tile, args.cap, 0.0, span=args.span)
        tri_g = jnp.where(valid[:, :, None, None], tri[idx], 0.0)
        sh_g = jnp.where(valid, shade[idx], 0.0)
        co_g = jnp.where(valid[:, :, None], color[idx], 0.0)
        return jnp.sum(tri_g) + jnp.sum(sh_g) + jnp.sum(co_g)

    timed("bin+gathers", bins_gather, vj)

    def depth(vv):
        z = rasterize_depth_tiled(
            vv, faces, H, W, cap=args.cap, span=args.span, fallback=False
        )
        return jnp.sum(jnp.where(jnp.isfinite(z), z, 0.0))

    timed("depth-tiled(full)", depth, vj)

    def scene(vv):
        z, sh, co, hit = rasterize_scene_tiled(
            vv, faces, shade, color, H, W, cap=args.cap, span=args.span
        )
        return jnp.sum(jnp.where(hit, z, 0.0)) + jnp.sum(sh) + jnp.sum(co)

    timed("scene-tiled(full)", scene, vj)


if __name__ == "__main__":
    main()
