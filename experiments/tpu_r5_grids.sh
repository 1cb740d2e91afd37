#!/bin/bash
# Round-5 checkpoint-consuming grids (VERDICT r4 items 2 and 4).
#
# Anchor checkpoint: experiments/data/qa_ckpt_v4 — 2.76M byte model trained
# WITH --nbr-frac 0.25 (mask-covered), held-out full_acc_iso 0.96, which
# passes the r4 item-3 gate (>= the pre-nbr byte model's 0.90).  The 31M
# attempts (word r4 0.23, word v2 0.23, byte r5 0.26) all stall at the
# value-copy transition — diagnosis in experiments/results/SCALE_NOTES.md —
# so the mask-covered 2.76M model is the honest grid anchor.
#
#   nohup bash experiments/tpu_r5_grids.sh > /tmp/tpu_r5/grids.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_r5
mkdir -p "$LOGDIR"
CKPT=experiments/data/qa_ckpt_v4
step() { echo "[grids $(date -u +%H:%M:%S)] $*"; }

step "1/4 sdag_effect headline grid on the nbr-trained v4 ckpt"
timeout 5400 python experiments/run_sdag_effect.py \
  --ckpt "$CKPT" \
  --out experiments/results/sdag_effect_v4 \
  --n-mal 1 2 5 --positions 0 1 3 \
  > "$LOGDIR/sdag_effect_v4.log" 2>&1
step "sdag_effect rc=$?"

step "2/4 neighbor k-sweep on the nbr-frac-trained v4 ckpt (the real trade)"
timeout 5400 python experiments/run_sdag_effect.py \
  --ckpt "$CKPT" \
  --out experiments/results/sdag_effect_knn_v4 \
  --n-mal 1 2 --positions 0 1 --neighbors-k 0 2 4 \
  > "$LOGDIR/sdag_knn_v4.log" 2>&1
step "k-sweep rc=$?"

step "3/4 speculation e2e: plain decode baseline (matched cells)"
timeout 3600 python experiments/run_sdag_effect.py \
  --ckpt "$CKPT" \
  --out experiments/results/sdag_effect_v4_spec0 \
  --n-mal 1 --positions 0 1 --speculative 0 \
  > "$LOGDIR/sdag_spec0_v4.log" 2>&1
step "spec0 rc=$?"

step "4/4 speculation e2e: SPECULATIVE_DRAFT_LEN=8 on the same cells"
timeout 3600 python experiments/run_sdag_effect.py \
  --ckpt "$CKPT" \
  --out experiments/results/sdag_effect_v4_spec8 \
  --n-mal 1 --positions 0 1 --speculative 8 \
  > "$LOGDIR/sdag_spec8_v4.log" 2>&1
step "spec8 rc=$?"
step "done"
