#!/bin/bash
# Round-5 second-session queue order. Same items/state as run_tpu_queue.py,
# re-ordered by value-per-minute for a ~3.3 h window (the runner's ITEMS
# order would spend the window on the 8k arms and never reach the post-fix
# no-flip baseline that summarize_ab compares every arm against):
#   1. gen_noflip_16k + eval  — the flips-off baseline + flip-fix payoff +
#      headline candidate (resumable; checkpoints written during the run)
#   2. smoothing, proposal_ab — cheap VERDICT-row completions
#   3. gen_prior_8k           — discriminator-free A/B arm
#   4. gen_mesh_12k           — hardened mesh-protocol run (VERDICT item 4)
#   5. gen_nogt_8k, gen_spin_8k — SPIN pair (each other's comparison arm)
#   6. gen_rot6d_8k
#   7. gen_noflip_ext         — only if time somehow remains
# DEADLINE must be a unix timestamp safely before the driver handover:
# the runner skips any item whose TIMEOUT budget would cross it, so the
# TPU is guaranteed free when the driver's bench run starts.
set -u
DEADLINE="${1:?usage: run_queue_r5_session2.sh <unix-deadline>}"
PY=python
cd "$(dirname "$0")/.."
for group in \
  gen_noflip_16k \
  gen_noflip_eval \
  smoothing \
  proposal_ab \
  gen_prior_8k \
  gen_mesh_12k \
  gen_nogt_8k \
  gen_spin_8k \
  gen_rot6d_8k \
  gen_noflip_ext; do
  $PY benchmarks/run_tpu_queue.py --only "$group" --deadline "$DEADLINE"
done
echo "[r5-session2] queue sequence complete"
