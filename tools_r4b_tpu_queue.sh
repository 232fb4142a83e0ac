#!/usr/bin/env bash
# Round-4 follow-up queue: re-run the r4 steps that failed (with fixes) and
# the end-to-end proofs. Waits for tools_r4_tpu_queue.sh to finish first
# (one TPU job at a time). Artifacts -> docs/artifacts/r4/.
set -x
exec >> /tmp/r4b_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

# wait (up to 2 h) for the main r4 queue to drain
for i in $(seq 1 240); do
  grep -q "r4 queue done" /tmp/r4_queue.log && break
  sleep 30
done

step() {  # step <name> <timeout_s> <cmd...>: stdout JSON -> $ART/<name>.json
  local name=$1 to=$2; shift 2
  echo "=== $(date) $name"
  if timeout "$to" "$@" > "/tmp/r4.$name.json"; then
    cp "/tmp/r4.$name.json" "$ART/$name.json"
    echo "--- $name OK:"; cat "$ART/$name.json"
  else
    echo "--- $name FAILED rc=$?"; cat "/tmp/r4.$name.json"
  fi
}

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

# 0. Flagship-geometry multichip gate validation (CPU-only, virtual
#    8-device mesh; serialized here because the host has one core and the
#    AOT compiles would corrupt concurrent on-chip timings).
echo "=== $(date) dryrun_flagship"
timeout 2400 python __graft_entry__.py dryrun 8 > /tmp/r4.dryrun.log 2>&1 \
  && { cp /tmp/r4.dryrun.log "$ART/dryrun_flagship.log"; \
       echo "--- dryrun OK:"; tail -5 "$ART/dryrun_flagship.log"; } \
  || { echo "--- dryrun FAILED rc=$?"; tail -30 /tmp/r4.dryrun.log; }

# 1. flash-backward A/B, retried with the Mosaic-valid row block specs.
step sft17b_flashbwd 4000 env U2_FLASH_BWD=1 TRAIN_STEPS=4 \
  python tools_train_17b.py
step sft17b_b2 4000 env TRAIN_CE_CHUNK=256 U2_FLASH_BWD=1 TRAIN_B=2 \
  TRAIN_STEPS=4 python tools_train_17b.py

# 2. 8B QLoRA proof, retried with packed-int4 kernels (transportable) and
#    the dequant-first training matmul (no per-group partial blowup).
step qlora8b 5000 env TRAIN_STEPS=4 python tools_train_8b_qlora.py
step qlora8b_cechunk 5000 env TRAIN_CE_CHUNK=256 TRAIN_STEPS=4 \
  python tools_train_8b_qlora.py
step qlora8b_int8 5000 env TRAIN_QUANT=int8 TRAIN_CE_CHUNK=256 \
  TRAIN_STEPS=4 python tools_train_8b_qlora.py

# 3. judge shared-prefix A/B at batch 8 (batch 16 share1 OOMed by 1.5 GB).
step judge_share0_b8 3000 env PG_STATE=/tmp/pg_judge0b8.json \
  PG_JUDGE_SHARE=0 PG_JUDGE_BATCH=8 PG_STAGE=judge \
  python tools_bench_pred_green.py
cp /tmp/pg_judge0b8.json "$ART/pg_judge_share0_b8_state.json" || true
step judge_share1_b8 3000 env PG_STATE=/tmp/pg_judge1b8.json \
  PG_JUDGE_SHARE=1 PG_JUDGE_BATCH=8 PG_STAGE=judge \
  python tools_bench_pred_green.py
cp /tmp/pg_judge1b8.json "$ART/pg_judge_share1_b8_state.json" || true

# 4. End-to-end training-loop proof: 60 real steps, hard kill at 37,
#    resume from the step-30 checkpoint, loss-curve artifact.
echo "=== $(date) train_loop kill phase"
rm -rf /tmp/u2_train_loop
KILL_AT=37 STEPS=60 timeout 7200 python tools_train_loop_17b.py \
  || echo "train_loop kill phase exited rc=$? (17 = scripted kill)"
step train_loop 7200 env KILL_AT=0 STEPS=60 python tools_train_loop_17b.py

# 5. Real-weights rehearsal at full 1.7B geometry (emit/convert/verify are
#    host-side; serve runs on the chip).
bash tools_rehearse_real_weights.sh || echo "rehearsal FAILED rc=$?"

# 6. Final headline sanity at the new default (int4 KV, plain greedy,
#    speculative side-by-side in detail).
step bench_final 4000 python bench.py

echo "=== $(date) r4b queue done"
