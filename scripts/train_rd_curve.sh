#!/usr/bin/env bash
# Multi-rate trained-RD pipeline (round 5, VERDICT task 6):
# trains LHBDC at 3 lambda points (228/1626/3141, the reference's grid ends
# LHBDC/train.py:27) plus a matching ELIC intra per point
# (i_lambda ~ alpha/255^2) on the photographic-motion dataset, pairs first
# so a partial run still yields complete (intra, B) pairs.
#
#   bash scripts/train_rd_curve.sh [steps_b] [steps_i]
#
# ~2.2 chip-hours at r4's measured 3.2 it/s (B) / 5 it/s (I).
# Writes /tmp/train_rd_done when finished.
set -euo pipefail
cd "$(dirname "$0")/.."
STEPS_B="${1:-6000}"
STEPS_I="${2:-4000}"
ROOT=/tmp/hopperset
[ -d "$ROOT/sequences" ] || python scripts/gen_dataset.py --root "$ROOT" --n 240

for A in 1626 228 3141; do
  IL=$(python -c "print(round($A/65025, 6))")
  python -m tpuvc.cli.train model.family=lhbdc dataset_root="$ROOT" \
    total_steps="$STEPS_B" alpha="$A" \
    checkpoint_dir="/root/repo/checkpoints_r5/lhbdc_a$A"
  python -m tpuvc.cli.train model.family=elic dataset_root="$ROOT" \
    total_steps="$STEPS_I" i_lambda="$IL" \
    checkpoint_dir="/root/repo/checkpoints_r5/elic_a$A"
done
touch /tmp/train_rd_done
