#!/bin/bash
# Round-5 checkpoint-consuming grids (VERDICT r4 items 2 and 4), run once
# the byte-level 31M checkpoint (experiments/data/qa_ckpt_30m_byte) is in
# place.  Priority order, independent failures.
#
#   nohup bash experiments/tpu_r5_grids.sh > /tmp/tpu_r5/grids.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_r5
mkdir -p "$LOGDIR"
CKPT=experiments/data/qa_ckpt_30m_byte
step() { echo "[grids $(date -u +%H:%M:%S)] $*"; }

step "1/4 sdag_effect headline grid on the byte-31M ckpt"
timeout 5400 python experiments/run_sdag_effect.py \
  --ckpt "$CKPT" \
  --out experiments/results/sdag_effect_30m \
  --n-mal 1 5 --positions 0 1 3 \
  > "$LOGDIR/sdag_effect_30m.log" 2>&1
step "sdag_effect rc=$?"

step "2/4 neighbor k-sweep on the nbr-frac-trained byte-31M ckpt"
timeout 5400 python experiments/run_sdag_effect.py \
  --ckpt "$CKPT" \
  --out experiments/results/sdag_effect_knn_30m \
  --n-mal 1 2 --positions 0 1 --neighbors-k 0 2 4 \
  > "$LOGDIR/sdag_knn_30m.log" 2>&1
step "k-sweep rc=$?"

step "3/4 speculation e2e: plain decode baseline (matched cells)"
timeout 3600 python experiments/run_sdag_effect.py \
  --ckpt "$CKPT" \
  --out experiments/results/sdag_effect_30m_spec0 \
  --n-mal 1 --positions 0 1 --speculative 0 \
  > "$LOGDIR/sdag_spec0_30m.log" 2>&1
step "spec0 rc=$?"

step "4/4 speculation e2e: SPECULATIVE_DRAFT_LEN=8 on the same cells"
timeout 3600 python experiments/run_sdag_effect.py \
  --ckpt "$CKPT" \
  --out experiments/results/sdag_effect_30m_spec8 \
  --n-mal 1 --positions 0 1 --speculative 8 \
  > "$LOGDIR/sdag_spec8_30m.log" 2>&1
step "spec8 rc=$?"
step "done"
