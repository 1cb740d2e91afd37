#!/bin/bash
# Round-4 TPU queue, part 2: resumes the original tpu_r4_queue.sh from its
# step 3 after the word-tokenizer answer-surface fix (train_qa.py targets
# the space-prefixed value token so the induction copy is possible).
# Steps 1-2 (bench capture, prefill probe) already completed rc=0 and are
# committed; the 30M training they fed was invalidated by the tokenizer
# bug, so train + all checkpoint-consuming grids rerun here.
#
#   nohup bash experiments/tpu_r4_queue2.sh > /tmp/tpu_r4_queue2.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_r4
mkdir -p "$LOGDIR"

step() { echo "[queue2 $(date -u +%H:%M:%S)] $*"; }

step "waiting for TPU..."
until timeout 120 python -c "
import jax, jax.numpy as jnp
(jnp.ones((256,256))@jnp.ones((256,256))).block_until_ready()
print(jax.default_backend())
" >/dev/null 2>&1; do
  step "tpu still down; retrying in 300s"
  sleep 300
done
step "TPU UP"

step "1/4 train 30M word-level QA model"
timeout 14400 python -m sdag_tpu.pipeline.train_qa \
  --out experiments/data/qa_ckpt_30m --tokenizer word \
  --d-model 512 --layers 8 --heads 4 --kv-heads 4 --d-ff 1792 \
  --seq-len 512 --batch 32 --steps 6000 --scan-chunk 25 \
  --eval-every 500 --save-every 1000 \
  > "$LOGDIR/train30m.log" 2>&1
step "train rc=$?"

step "2/4 sdag_effect grids on 30M ckpt"
timeout 10800 python experiments/run_sdag_effect.py \
  --ckpt experiments/data/qa_ckpt_30m \
  --out experiments/results/sdag_effect_30m \
  --n-mal 1 5 --positions 0 1 3 \
  > "$LOGDIR/sdag_effect_30m.log" 2>&1
step "sdag_effect rc=$?"

step "3/4 neighbor k-sweep on the nbr-frac-trained 30M ckpt"
timeout 10800 python experiments/run_sdag_effect.py \
  --ckpt experiments/data/qa_ckpt_30m \
  --out experiments/results/sdag_effect_knn_30m \
  --n-mal 1 2 --positions 0 1 --neighbors-k 0 2 4 \
  > "$LOGDIR/sdag_knn_30m.log" 2>&1
step "k-sweep rc=$?"

step "4/4 speculation e2e on the trained 30M workload (vs step-2 plain)"
timeout 7200 python experiments/run_sdag_effect.py \
  --ckpt experiments/data/qa_ckpt_30m \
  --out experiments/results/sdag_effect_30m_spec8 \
  --n-mal 1 --positions 0 1 --speculative 8 \
  > "$LOGDIR/sdag_spec_30m.log" 2>&1
step "spec rc=$?"

step "queue2 done"
