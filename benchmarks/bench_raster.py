"""Device rasterizer bench: dense vs two-level tiled (VERDICT r2 item 3).

Timing methodology: in-jit scan chains (bench_attrib.py's method) — each
dispatch runs INNER rasterizations with the vertex buffer evolved by a
scalar feedback between iterations, so the ~27 ms tunnel dispatch +
readback overhead is amortized instead of swamping sub-30 ms kernels (the
round-2 single-call numbers carry that overhead; both paths are measured
the same way here, and the dense row is re-measured for the honest
comparison).

Workload shape mirrors the overlay/fitting use cases:
- depth/scene @ 480p with two ~13.8k-face bodies (27.5k tris total) —
  spatially-LOCAL topology (uv_sphere pairs scaled to body-ish screen
  size), the realistic case real SMPL meshes present; the synthetic SMPL
  model's random-triple faces have no locality and route the tiled path
  to its dense fallback by design (measured separately via --random).
- soft silhouette @ 224^2 with one body (mask-supervised fitting's shape),
  including the gradient pass (the fitting step's actual workload).

Usage (real TPU):
    python benchmarks/bench_raster.py                 # the headline table
    python benchmarks/bench_raster.py --sweep         # tile/cap sweep
    python benchmarks/bench_raster.py --random        # fallback workload
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


def body_mesh(n_bodies: int, H: int, W: int, seed: int = 0):
    """n uv-sphere 'bodies' (~13.8k faces each) in pixel space."""
    from human_3d_reconstruction_tpu.viz.mesh_io import uv_sphere

    rng = np.random.default_rng(seed)
    vs, fs, off = [], [], 0
    for i in range(n_bodies):
        cx = W * (0.3 + 0.4 * i / max(1, n_bodies - 1)) if n_bodies > 1 else W / 2
        v, f = uv_sphere(
            64, 108, radius=min(H, W) * 0.35, center=(cx, H * 0.5, 2.0 + i)
        )
        v[:, 1] *= 1.25
        v[:, :2] += rng.normal(scale=2.0, size=(1, 2)).astype(np.float32)
        vs.append(v)
        fs.append(f + off)
        off += len(v)
    return (
        jnp.asarray(np.concatenate(vs)),
        jnp.asarray(np.concatenate(fs).astype(np.int32)),
    )


def random_mesh(n_faces: int, H: int, W: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    n_verts = max(64, n_faces // 2)
    v = np.stack(
        [rng.uniform(0, W, n_verts), rng.uniform(0, H, n_verts), rng.uniform(1, 5, n_verts)],
        axis=1,
    ).astype(np.float32)
    f = rng.integers(0, n_verts, (n_faces, 3)).astype(np.int32)
    return jnp.asarray(v), jnp.asarray(f)


def main() -> None:
    from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

    configure_compile_cache(5.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--random", action="store_true")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--inner", type=int, default=6)
    args = ap.parse_args()

    from human_3d_reconstruction_tpu.viz.device_raster import (
        lambert_shade,
        rasterize_depth,
        rasterize_scene,
        soft_silhouette,
    )
    from human_3d_reconstruction_tpu.viz.tiled_raster import (
        rasterize_depth_tiled,
        rasterize_scene_tiled,
        soft_silhouette_tiled,
    )

    def echo(msg):
        print(msg, file=sys.stderr, flush=True)

    echo(f"devices: {jax.devices()}")
    rows = []
    INNER = args.inner

    def time_chained(step_fn, v0):
        """step_fn: verts -> scalar; chain INNER evolved iterations per
        dispatch (the scalar perturbs the next verts, so nothing folds)."""

        @jax.jit
        def run(v):
            def body(v, _):
                s = step_fn(v)
                return v + s * 1e-12, s

            vf, ss = jax.lax.scan(body, v, None, length=INNER)
            return vf, ss[-1]

        v, s = run(v0)
        float(s)
        v, s = run(v)
        float(s)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            v, s = run(v)
        float(s)
        return (time.perf_counter() - t0) / (args.reps * INNER)

    def bench(name, step_fn, v0):
        try:
            dt = time_chained(step_fn, v0) * 1e3
        except Exception as e:  # e.g. RESOURCE_EXHAUSTED on a dense grad
            rows.append({"case": name, "error": type(e).__name__})
            echo(f"{name:<44} FAILED: {type(e).__name__}")
            return
        rows.append({"case": name, "ms": round(dt, 2)})
        echo(f"{name:<44} {dt:8.2f} ms")

    H, W = 480, 640
    if args.random:
        v, f = random_mesh(27648, H, W)
    else:
        v, f = body_mesh(2, H, W)
    echo(f"480p mesh: {v.shape[0]} verts, {f.shape[0]} faces "
         f"({'random' if args.random else 'local'})")

    shade = lambert_shade(v, f)
    color = jnp.ones((f.shape[0], 3), jnp.float32)

    def finite_sum(z):
        return jnp.where(jnp.isfinite(z), z, 0.0).sum()

    bench("depth dense 480p", lambda vv: finite_sum(rasterize_depth(vv, f, H, W)), v)
    bench("depth tiled 480p", lambda vv: finite_sum(rasterize_depth_tiled(vv, f, H, W)), v)
    bench(
        "scene dense 480p",
        lambda vv: rasterize_scene(vv, f, shade, color, H, W)[1].sum(), v,
    )
    bench(
        "scene tiled 480p",
        lambda vv: rasterize_scene_tiled(vv, f, shade, color, H, W)[1].sum(), v,
    )

    Hs = Ws = 224
    if args.random:
        v2, f2 = random_mesh(13824, Hs, Ws, seed=1)
    else:
        v2, f2 = body_mesh(1, Hs, Ws, seed=1)
    bench(
        "soft dense 224",
        lambda vv: soft_silhouette(vv, f2, Hs, Ws, sharpness=2.0).sum(), v2,
    )
    bench(
        "soft tiled 224",
        lambda vv: soft_silhouette_tiled(vv, f2, Hs, Ws, sharpness=2.0).sum(), v2,
    )
    target = jnp.zeros((Hs, Ws))

    def grad_step(render):
        def step(vv):
            g = jax.grad(
                lambda u: jnp.mean((render(u) - target) ** 2)
            )(vv)
            return g.sum()

        return step

    bench(
        "soft+grad dense 224",
        grad_step(lambda u: soft_silhouette(u, f2, Hs, Ws, sharpness=2.0)), v2,
    )
    bench(
        "soft+grad tiled 224",
        grad_step(
            lambda u: soft_silhouette_tiled(u, f2, Hs, Ws, sharpness=2.0, fallback=False)
        ),
        v2,
    )

    if args.sweep:
        for tile in (16, 32, 64):
            for cap in (512, 1024):
                for chunk in (256, 512):
                    if chunk > cap:
                        continue
                    bench(
                        f"depth tiled 480p t{tile} k{cap} c{chunk}",
                        lambda vv, tile=tile, cap=cap, chunk=chunk: finite_sum(
                            rasterize_depth_tiled(vv, f, H, W, tile=tile, cap=cap, chunk=chunk)
                        ),
                        v,
                    )
        for tile in (16, 32):
            for cap in (512, 1024):
                bench(
                    f"soft tiled 224 t{tile} k{cap}",
                    lambda vv, tile=tile, cap=cap: soft_silhouette_tiled(
                        vv, f2, Hs, Ws, sharpness=2.0, tile=tile, cap=cap
                    ).sum(),
                    v2,
                )

    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
