#!/bin/bash
# Round-4 TPU work queue: waits for the axon relay to come back, then runs
# the TPU-gated VERDICT-r3 items in priority order, logging each step and
# continuing past failures.  Designed to be started in the background and
# babysat via /tmp/tpu_r4_queue.log.
#
#   nohup bash experiments/tpu_r4_queue.sh > /tmp/tpu_r4_queue.log 2>&1 &
#
# Steps (priority order; each is independently committed by the operator):
#   1. bench.py full capture -> experiments/results/bench_r4_<ts>.jsonl
#      (VERDICT #1/#10: fresh committed artifact incl. post-sidecar BM25)
#   2. probe_prefill_variants at L=4096 (VERDICT #4 evidence)
#   3. train the ~30M-param word-level QA model (VERDICT #7)
#   4. sdag_effect grids on the 30M ckpt incl. neighbors + speculation
#      (VERDICT #2 at scale, #7, #9)

set -u
cd "$(dirname "$0")/.."
TS=$(date -u +%Y%m%d_%H%M)
LOGDIR=/tmp/tpu_r4
mkdir -p "$LOGDIR"

step() { echo "[queue $(date -u +%H:%M:%S)] $*"; }

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

step "1/4 bench.py full capture"
BENCH_DEADLINE_S=5000 timeout 5400 python bench.py \
  > "experiments/results/bench_r4_${TS}.jsonl" 2> "$LOGDIR/bench.err"
step "bench rc=$? ($(grep -c '^{' experiments/results/bench_r4_${TS}.jsonl 2>/dev/null) metrics)"

step "2/4 prefill variant shoot-out (L=4096)"
timeout 2400 python benchmarks/probe_prefill_variants.py \
  > "$LOGDIR/prefill_variants.log" 2>&1
step "prefill probe rc=$?"

step "3/4 train 30M word-level QA model"
timeout 14400 python -m sdag_tpu.pipeline.train_qa \
  --out experiments/data/qa_ckpt_30m --tokenizer word \
  --d-model 512 --layers 8 --heads 4 --kv-heads 4 --d-ff 1792 \
  --seq-len 512 --batch 32 --steps 6000 --scan-chunk 25 \
  --eval-every 500 --save-every 1000 \
  > "$LOGDIR/train30m.log" 2>&1
step "train rc=$?"

step "4/5 sdag_effect grids on 30M ckpt"
timeout 10800 python experiments/run_sdag_effect.py \
  --ckpt experiments/data/qa_ckpt_30m \
  --out experiments/results/sdag_effect_30m \
  --n-mal 1 5 --positions 0 1 3 \
  > "$LOGDIR/sdag_effect_30m.log" 2>&1
step "sdag_effect rc=$?"

step "5/5 neighbor k-sweep on the nbr-frac-trained 30M ckpt"
timeout 10800 python experiments/run_sdag_effect.py \
  --ckpt experiments/data/qa_ckpt_30m \
  --out experiments/results/sdag_effect_knn_30m \
  --n-mal 1 2 --positions 0 1 --neighbors-k 0 2 4 \
  > "$LOGDIR/sdag_knn_30m.log" 2>&1
step "k-sweep rc=$?"

step "6/6 speculation e2e on the trained 30M workload (vs step-4 plain)"
timeout 7200 python experiments/run_sdag_effect.py \
  --ckpt experiments/data/qa_ckpt_30m \
  --out experiments/results/sdag_effect_30m_spec8 \
  --n-mal 1 --positions 0 1 --speculative 8 \
  > "$LOGDIR/sdag_spec_30m.log" 2>&1
step "spec rc=$?"

step "queue done"
