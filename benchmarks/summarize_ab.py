"""Summarize the round-5 A/B generalization runs into one markdown table.

Reads each arm's ``log.jsonl`` (written by ``bench_generalization.py``) and
prints, per arm: best val MPJPE (pelvis-rooted, mm) with its step, the val
PA-MPJPE at that step, the final-step values, and mean training throughput.
The baseline arm is the first N evals of the flagship ``gen_r4_ckpt`` run
(same seeds/recipe, axis-angle + adversarial + full SMPL GT), truncated at
``--ab_steps`` so every comparison is apples-to-apples in steps seen.

Usage:
    python benchmarks/summarize_ab.py            # all known arms
    python benchmarks/summarize_ab.py --ab_steps 8000

CPU-only (reads JSONL; never imports jax).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

RESULTS = Path(__file__).resolve().parent / "results"

# (label, results subdir, what differs from baseline)
#
# Two baselines, because the flip-gate fix landed mid-queue: gen_40k and
# gen_kp_8k trained WITH the (broken, pre-fix) flip aug — they compare
# against each other; every arm launched after the fix trains with flips
# auto-gated OFF and compares against gen_noflip_40k's log at the same
# step (same recipe/seeds, flips=0 the only difference).
ARMS: list[tuple[str, str, str]] = [
    ("baseline PRE-FIX (flip aug on)", "gen_r4_ckpt", "—"),
    ("kp heatmap head (pre-fix)", "gen_r4_kp", "+kp_head, +loss_weights.kp_heatmap"),
    ("baseline no-flip (post-fix)", "gen_r5_noflip", "gate_flip_aug active"),
    ("GMM pose prior (disc-free)", "gen_r4_prior", "--no_adversarial --pose_prior"),
    ("keypoints-only (no SMPL GT)", "gen_r4_nogt", "--no_smpl_gt"),
    ("SPIN in-graph pseudo-GT", "gen_r4_spin", "--no_smpl_gt --spin_steps 10"),
    ("rot6d IEF stream", "gen_r4_rot6d", "--rot_rep rot6d"),
    ("mesh protocol (12k)", "gen_r4_mesh", "--protocol mesh"),
]


def load_log(d: Path, max_step: int) -> list[dict]:
    f = d / "log.jsonl"
    if not f.exists():
        return []
    rows = []
    for line in f.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if r.get("step", 0) <= max_step and "val_mpjpe_mm" in r:
            rows.append(r)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ab_steps", type=int, default=8000,
                    help="truncate every arm (incl. baseline) at this step")
    args = ap.parse_args()

    print(f"| recipe (@{args.ab_steps} steps) | best val MPJPE mm (step) | "
          "val PA mm @best | final val MPJPE | img/s |")
    print("|---|---|---|---|---|")
    for label, sub, _diff in ARMS:
        rows = load_log(RESULTS / sub, args.ab_steps)
        if not rows:
            print(f"| {label} | (no log at {sub}) | | | |")
            continue
        best = min(rows, key=lambda r: r["val_mpjpe_mm"])
        final = rows[-1]
        ips = sum(r["img_per_sec"] for r in rows) / len(rows)
        print(
            f"| {label} | {best['val_mpjpe_mm']:.1f} ({best['step']}) "
            f"| {best['val_pa_mpjpe_mm']:.1f} | {final['val_mpjpe_mm']:.1f} "
            f"| {ips:,.0f} |"
        )


if __name__ == "__main__":
    main()
