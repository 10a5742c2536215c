"""Characterize the on-device person proposer (VERDICT r4 weak #3).

`utils/person_proposal.py` carries `cli.demo --boxes=auto` (the default)
but until now had only a single rendered-scene smoke test. This benchmark
measures detection precision / recall / box-IoU on scenes the repo renders
itself (viz/body_render.py): 2-6 shaded SMPL bodies composited over one
randomized background at three separation regimes —

    spread  : centers >= 1.2x body scale apart (easy),
    close   : >= 0.7x (adjacent people),
    overlap : >= 0.4x (partially overlapping people — the expected
              failure mode is saliency merging neighbors into one box).

Matching: greedy GT->proposal assignment by square-box IoU (side = scale),
a GT counts as detected at IoU >= `--iou` (default 0.3; person boxes are
coarse crops, not tight detections) OR center distance < 0.5x GT scale
(the smoke-test criterion). A proposal that is the best match of >= 2 GT
bodies is a MERGE — reported separately because a merged box feeds the
bucketed recovery one crop containing two people.

Run (real TPU, ~3-5 min):
    timeout 900 python benchmarks/bench_proposal.py \
        > /tmp/prop.json 2> /tmp/prop.err

One JSON line per (regime, n_bodies) cell on stdout + a `summary` line;
human detail on stderr. `--force_cpu` smokes the logic at tiny scale.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def box_iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two square boxes given as [cx, cy, side]."""
    ax0, ay0 = a[0] - a[2] / 2, a[1] - a[2] / 2
    bx0, by0 = b[0] - b[2] / 2, b[1] - b[2] / 2
    ix = max(0.0, min(ax0 + a[2], bx0 + b[2]) - max(ax0, bx0))
    iy = max(0.0, min(ay0 + a[2], by0 + b[2]) - max(ay0, by0))
    inter = ix * iy
    return inter / (a[2] ** 2 + b[2] ** 2 - inter + 1e-9)


def place_bodies(rng, n, frame_hw, scale, sep_frac, tries=200):
    """Rejection-sample n centers with pairwise distance >= sep_frac*scale."""
    H, W = frame_hw
    m = scale * 0.55  # keep most of the body in-frame
    for _ in range(tries):
        pts = np.stack(
            [rng.uniform(m, W - m, n), rng.uniform(m, H - m, n)], axis=1
        )
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        d[np.arange(n), np.arange(n)] = np.inf
        if d.min() >= sep_frac * scale:
            return pts.astype(np.float32)
    return pts.astype(np.float32)  # densest draw if rejection fails


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8, help="scenes per cell")
    ap.add_argument("--bodies", default="2,3,4,5,6")
    ap.add_argument("--iou", type=float, default=0.3)
    ap.add_argument("--frame", default="384x512")
    ap.add_argument("--scale", type=float, default=90.0)
    ap.add_argument("--split", action="store_true",
                    help="A/B arm: split_merged=True in the proposer")
    ap.add_argument("--ab", action="store_true",
                    help="run BOTH proposer variants on the SAME rendered "
                    "frames (the clean split_merged A/B; separate --split "
                    "runs draw different scenes — see the seeding note)")
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args()

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from human_3d_reconstruction_tpu.utils.compile_cache import (
        configure_compile_cache,
    )

    configure_compile_cache()

    import jax
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model
    from human_3d_reconstruction_tpu.smpl.forward import smpl_forward
    from human_3d_reconstruction_tpu.utils.person_proposal import (
        propose_person_boxes_np,
    )
    from human_3d_reconstruction_tpu.viz.body_render import (
        body_vertex_colors,
        local_surface_faces,
        make_frame_renderer,
    )

    if not args.force_cpu:
        from human_3d_reconstruction_tpu.utils.tunnel import check_tpu_tunnel

        check_tpu_tunnel()
    log(f"device: {jax.devices()[0]}")

    H, W = (int(s) for s in args.frame.split("x"))
    bodies = [int(s) for s in args.bodies.split(",")]
    regimes = {"spread": 1.2, "close": 0.7, "overlap": 0.4}
    if args.force_cpu:
        # Proven smoke-test geometry (tests/test_person_proposal.py):
        # smaller frames shrink bodies below the proposer's design floor
        # (a scale-40 body is ~36 px -> ~20 cells, under min_mass_cells).
        H, W = 192, 256
        args.scale = 90.0
        bodies = bodies[:1]
        args.scenes = min(args.scenes, 2)
        regimes = {"spread": 1.2, "overlap": 0.4}

    model = synthetic_smpl_model(seed=0)
    v = np.asarray(model.as_dict()["v_template"])
    render = make_frame_renderer(
        local_surface_faces(v), body_vertex_colors(v), (H, W), chunk_frames=4
    )
    params = {k: jnp.asarray(a) for k, a in model.as_dict().items()}
    fwd = jax.jit(lambda p, b: smpl_forward(params, p, b))

    def composite_scene(rng, n, sep_frac, key):
        centers = place_bodies(rng, n, (H, W), args.scale, sep_frac)
        scales = np.full((n,), args.scale, np.float32)
        thetas = rng.normal(scale=0.3, size=(n, 72)).astype(np.float32)
        betas = rng.normal(scale=0.8, size=(n, 10)).astype(np.float32)
        out = fwd(thetas, betas)
        mu = np.asarray(out.eval_joints[:, :14]).mean(axis=1, keepdims=True)
        verts_c = np.asarray(out.verts) - mu
        keys = np.full((n + 1,), key, np.uint32)  # same key = same background
        # n bodies + 1 pure-background frame (body shifted far off-frame).
        vc = np.concatenate([verts_c, verts_c[:1] + 1e3], axis=0)
        ce = np.concatenate([centers, centers[:1]], axis=0)
        sc = np.concatenate([scales, scales[:1]], axis=0)
        frames = render(vc, ce, sc, keys)
        bg, frames = frames[n], frames[:n]
        base = bg.copy()
        for i in range(n):  # overlay in order: later bodies occlude earlier
            mask = (frames[i] != bg).any(axis=-1)
            base[mask] = frames[i][mask]
        truth = np.concatenate([centers, scales[:, None]], axis=1)
        return base, truth

    def score_scene(truth, boxes, n):
        """Greedy GT->proposal match, best IoU first.

        Returns (hits, false_pos, matched_ious, merged_misses) for one scene.
        """
        pairs = sorted(
            (
                (box_iou(t, b), ti, bi)
                for ti, t in enumerate(truth)
                for bi, b in enumerate(boxes)
            ),
            reverse=True,
        )
        gt_hit: dict[int, int] = {}
        used: set[int] = set()
        ious: list[float] = []
        for iou, ti, bi in pairs:
            if ti in gt_hit or bi in used:
                continue
            ctr_ok = (
                np.linalg.norm(boxes[bi, :2] - truth[ti, :2])
                < 0.5 * truth[ti, 2]
            )
            if iou >= args.iou or ctr_ok:
                gt_hit[ti] = bi
                used.add(bi)
                ious.append(iou)
        # Merge: an UNUSED-for-this-GT proposal can still cover a
        # missed GT; count missed GTs whose center lies inside some
        # matched proposal's box (two people -> one box).
        merges = 0
        for ti in range(n):
            if ti in gt_hit:
                continue
            for bi in used:
                if (
                    np.abs(truth[ti, :2] - boxes[bi, :2])
                    < boxes[bi, 2] / 2
                ).all():
                    merges += 1
                    break
        return len(gt_hit), len(boxes) - len(used), ious, merges

    # --ab scores both variants on the SAME frames; otherwise one arm.
    variants = (
        [("base", False), ("split", True)] if args.ab
        else [("split" if args.split else "base", args.split)]
    )
    rows = {label: [] for label, _ in variants}
    for regime, sep in regimes.items():
        for n in bodies:
            # Deterministic cell seed. NOT builtin hash(): string hashing
            # is salted per process (PYTHONHASHSEED), which made separate
            # baseline/--split runs draw DIFFERENT scenes — the first
            # on-chip "A/B" measured scene noise (per-cell recall swings
            # of ±0.1 at 8 scenes/cell), not the split effect.
            rng = np.random.default_rng(
                zlib.crc32(f"{regime}/{n}".encode())
            )
            acc = {
                label: {"tp": 0, "fp": 0, "fn": 0, "merges": 0, "ious": []}
                for label, _ in variants
            }
            t0 = time.time()
            for s in range(args.scenes):
                frame, truth = composite_scene(rng, n, sep, key=1000 + s)
                for label, split in variants:
                    boxes = propose_person_boxes_np(
                        frame, max_people=max(8, n + 2),
                        split_merged=split,
                    )
                    hits, fp_s, ious_s, merges_s = score_scene(truth, boxes, n)
                    a = acc[label]
                    a["tp"] += hits
                    a["fn"] += n - hits
                    a["fp"] += fp_s
                    a["merges"] += merges_s
                    a["ious"].extend(ious_s)
            for label, _ in variants:
                a = acc[label]
                row = {
                    "regime": regime,
                    "n_bodies": n,
                    "scenes": args.scenes,
                    "recall": round(a["tp"] / max(a["tp"] + a["fn"], 1), 3),
                    "precision": round(a["tp"] / max(a["tp"] + a["fp"], 1), 3),
                    "mean_iou": round(
                        float(np.mean(a["ious"])) if a["ious"] else 0.0, 3
                    ),
                    "merged_misses": a["merges"],
                    "sec": round(time.time() - t0, 1),
                }
                if args.ab:
                    row["variant"] = label
                rows[label].append(row)
                print(json.dumps(row), flush=True)
                log(f"{regime} n={n} [{label}]: R={row['recall']} "
                    f"P={row['precision']} IoU={row['mean_iou']} "
                    f"merges={a['merges']}")

    for label, _ in variants:
        vrows = rows[label]
        total_tp = sum(
            int(r["recall"] * r["n_bodies"] * r["scenes"]) for r in vrows
        )
        summary = {
            "summary": True,
            "recall_overall": round(
                float(np.mean([r["recall"] for r in vrows])), 3
            ),
            "precision_overall": round(
                float(np.mean([r["precision"] for r in vrows])), 3
            ),
            "worst_cell": min(vrows, key=lambda r: r["recall"])["regime"]
            + "/n="
            + str(min(vrows, key=lambda r: r["recall"])["n_bodies"]),
            "total_matched": total_tp,
        }
        if args.ab:
            summary["variant"] = label
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
