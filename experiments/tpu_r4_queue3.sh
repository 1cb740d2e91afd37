#!/bin/bash
# Round-4 TPU queue, part 3: the checkpoint-consuming grids, run once the
# 31M word-level checkpoint (train30m + lr-3e-4 continuation) is in place.
#
#   nohup bash experiments/tpu_r4_queue3.sh > /tmp/tpu_r4_queue3.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_r4
mkdir -p "$LOGDIR"

step() { echo "[queue3 $(date -u +%H:%M:%S)] $*"; }

step "1/3 sdag_effect grids on 30M ckpt"
timeout 10800 python experiments/run_sdag_effect.py \
  --ckpt experiments/data/qa_ckpt_30m \
  --out experiments/results/sdag_effect_30m \
  --n-mal 1 5 --positions 0 1 3 \
  > "$LOGDIR/sdag_effect_30m.log" 2>&1
step "sdag_effect rc=$?"

step "2/3 neighbor k-sweep on the nbr-frac-trained 30M ckpt"
timeout 10800 python experiments/run_sdag_effect.py \
  --ckpt experiments/data/qa_ckpt_30m \
  --out experiments/results/sdag_effect_knn_30m \
  --n-mal 1 2 --positions 0 1 --neighbors-k 0 2 4 \
  > "$LOGDIR/sdag_knn_30m.log" 2>&1
step "k-sweep rc=$?"

step "3/3 speculation e2e on the trained 30M workload (vs step-1 plain)"
timeout 7200 python experiments/run_sdag_effect.py \
  --ckpt experiments/data/qa_ckpt_30m \
  --out experiments/results/sdag_effect_30m_spec8 \
  --n-mal 1 --positions 0 1 --speculative 8 \
  > "$LOGDIR/sdag_spec_30m.log" 2>&1
step "spec rc=$?"

step "queue3 done"
