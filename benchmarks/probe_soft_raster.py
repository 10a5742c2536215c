"""Attribution probe for the tiled soft-silhouette gradient (r3).

Times each stage of `soft_silhouette_tiled` (binning -> gather -> pixel
lattice fwd -> backward) with scan-chained in-jit loops (single-call
timings on this tunnel are ~27 ms dispatch-dominated). The question this
answers BEFORE any Pallas work: is the fitting-path cost in the lattice
compute (a kernel could fuse it) or in the gather/scatter pair around it
(a kernel would not help; reformulation might)?

Usage (real TPU): python benchmarks/probe_soft_raster.py [--cap 1024]
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
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--faces", type=int, default=13780)
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--span", type=int, default=3)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from human_3d_reconstruction_tpu.viz.tiled_raster import (
        _grid,
        _tile_bins,
        soft_silhouette_tiled,
    )

    H = W = args.size
    V = -(-args.faces // 2)  # ceil: concat([f1, f2]) must cover args.faces
    rng = np.random.default_rng(0)
    v = np.stack(
        [rng.uniform(10, W - 10, V), rng.uniform(10, H - 10, V),
         rng.uniform(1, 3, V)], axis=1,
    ).astype(np.float32)
    from scipy.spatial import cKDTree

    _, nn = cKDTree(v[:, :2]).query(v[:, :2], k=4)
    f1 = np.stack([np.arange(V), nn[:, 1], nn[:, 2]], 1)
    f2 = np.stack([np.arange(V), nn[:, 2], nn[:, 3]], 1)
    faces = jnp.asarray(np.concatenate([f1, f2])[: args.faces].astype(np.int32))
    vj = jnp.asarray(v)
    target = jnp.zeros((H, W))
    tile = 32
    th, tw, _, _ = _grid(H, W, tile)
    print(f"devices: {jax.devices()}  grid {th}x{tw}  cap {args.cap} "
          f"span {args.span}", file=sys.stderr, flush=True)

    def timed(name, fn, x):
        """Scan-chain fn reps times; perturb input so nothing hoists."""

        def chain(xx):
            def body(c, _):
                out = fn(c)
                # fold a scalar of the output back into the carry: keeps
                # the chain serial without changing the workload shape
                return c + 0.0 * out, None

            return jax.lax.scan(body, xx, None, length=args.reps)[0]

        cj = jax.jit(chain)
        r = cj(x); float(np.asarray(r).ravel()[0])
        t0 = time.perf_counter()
        r = cj(x); float(np.asarray(r).ravel()[0])
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(json.dumps({"stage": name, "ms": round(dt, 2)}), flush=True)
        return dt

    expand = 8.0

    # 1. binning alone (sort + searchsorted)
    def bins_only(vv):
        tri = vv[faces]
        idx, valid, ovf = _tile_bins(tri, th, tw, tile, args.cap, expand,
                                     span=args.span)
        return jnp.sum(idx) * 1.0

    timed("bin(sort+bounds)", bins_only, vj)

    # 2. binning + the (T, K, 3, 3) gather
    def bins_gather(vv):
        tri = vv[faces]
        idx, valid, ovf = _tile_bins(tri, th, tw, tile, args.cap, expand,
                                     span=args.span)
        tri_g = jnp.where(valid[:, :, None, None], tri[idx], 0.0)
        return jnp.sum(tri_g)

    timed("bin+gather", bins_gather, vj)

    # 3. full forward
    def fwd(vv):
        s = soft_silhouette_tiled(vv, faces, H, W, sharpness=2.0,
                                  cap=args.cap, fallback=False,
                                  span=args.span)
        return jnp.sum(s)

    timed("forward", fwd, vj)

    # 4. forward + backward (the fitting workload)
    def loss(vv):
        s = soft_silhouette_tiled(vv, faces, H, W, sharpness=2.0,
                                  cap=args.cap, fallback=False,
                                  span=args.span)
        return jnp.mean((s - target) ** 2)

    timed("fwd+bwd", jax.grad(loss), vj)

    # 4b. fwd+bwd with the sort-based (scatter-free) gather VJP
    def loss_sorted(vv):
        s = soft_silhouette_tiled(vv, faces, H, W, sharpness=2.0,
                                  cap=args.cap, fallback=False,
                                  span=args.span, sorted_grad=True)
        return jnp.mean((s - target) ** 2)

    timed("fwd+bwd(sorted-vjp)", jax.grad(loss_sorted), vj)

    # 5. gather backward in isolation: scatter-add of (T*K, 3, 3) into V
    T = th * tw
    idx_static, valid_static, _ = jax.jit(
        lambda vv: _tile_bins(vv[faces], th, tw, tile, args.cap, expand,
                              span=args.span)
    )(vj)[:3]

    def scatter_back(g_tri_g):
        # VJP of tri_g = verts[faces][idx]: scatter into faces then verts
        tri_flat = jnp.zeros((args.faces, 3, 3))
        tri_flat = tri_flat.at[idx_static.reshape(-1)].add(
            g_tri_g.reshape(-1, 3, 3)
        )
        out = jnp.zeros((V, 3))
        return jnp.sum(out.at[faces.reshape(-1)].add(
            tri_flat.reshape(-1, 3)[: args.faces * 3]
        ))

    g_fake = jnp.ones((T * args.cap, 3, 3))
    timed("scatter-bwd(isolated)", scatter_back, g_fake)


if __name__ == "__main__":
    main()
