#!/usr/bin/env bash
# Round-4 on-chip measurement queue (r3 VERDICT next-round items 1-3):
# drain every shipped-but-unmeasured A/B and RECORD the raw JSON artifacts
# under docs/artifacts/r4/ so BENCHMARKS.md numbers are reproducible.
# One TPU job at a time (the relay serializes; see .claude/skills/verify).
# Appends to /tmp/r4_queue.log; safe to re-run (steps are idempotent).
set -x
exec >> /tmp/r4_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

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

# 1. Headline with the new plain-greedy default (spec side-by-side in
#    detail) — the r4 recorded number must be the best honest config.
step bench_b64 3600 python bench.py

# 2. Flagship DPO step on one chip (VERDICT #3: the reference needed
#    ZeRO-3 + CPU offload on 4xA100 for this).
step dpo_17b 4000 python tools_train_dpo_17b.py

# 3. The unrecorded 8B QLoRA proof (VERDICT missing #3) + chunked-CE A/B.
step qlora8b 5000 env TRAIN_STEPS=4 python tools_train_8b_qlora.py
step qlora8b_cechunk 5000 env TRAIN_CE_CHUNK=256 TRAIN_STEPS=4 \
  python tools_train_8b_qlora.py

# 4. 1.7B SFT A/B matrix: flash-backward, chunked CE, B=2 with both.
step sft17b_base 4000 env TRAIN_STEPS=4 python tools_train_17b.py
step sft17b_flashbwd 4000 env U2_FLASH_BWD=1 TRAIN_STEPS=4 \
  python tools_train_17b.py
step sft17b_cechunk 4000 env TRAIN_CE_CHUNK=256 TRAIN_STEPS=4 \
  python tools_train_17b.py
step sft17b_b2 4000 env TRAIN_CE_CHUNK=256 U2_FLASH_BWD=1 TRAIN_B=2 \
  TRAIN_STEPS=4 python tools_train_17b.py

# 5. Headline batch sweep (plain only): is B64 the right serving batch?
step bench_b96 2400 env BENCH_BATCH=96 BENCH_ALT_TOO=0 python bench.py
step bench_b48 2400 env BENCH_BATCH=48 BENCH_ALT_TOO=0 python bench.py

# 6. int4 KV + fused int4 decode-kernel A/B (Mosaic int4 validation).
step bench_int4kv 3000 env BENCH_KV=int4 BENCH_ALT_TOO=0 python bench.py
step bench_int4kernel 3000 env U2_DECODE_KERNEL=1 U2_INT4_DECODE_KERNEL=1 \
  BENCH_KV=int4 BENCH_ALT_TOO=0 python bench.py

# 7. GREEN-judge shared-prefix A/B (stage states carry judge_s).
step judge_share0 3000 env PG_STATE=/tmp/pg_judge0.json PG_JUDGE_SHARE=0 \
  PG_STAGE=judge python tools_bench_pred_green.py
cp /tmp/pg_judge0.json "$ART/pg_judge_share0_state.json" || true
step judge_share1 3000 env PG_STATE=/tmp/pg_judge1.json PG_JUDGE_SHARE=1 \
  PG_STAGE=judge python tools_bench_pred_green.py
cp /tmp/pg_judge1.json "$ART/pg_judge_share1_state.json" || true

# 8. Predict-stage A/B: tiled vs fan-out vs spec+fan-out (same session).
step pred_tiled 3000 env PG_STATE=/tmp/pg_tiled.json PG_FANOUT=0 \
  PG_STAGE=predict python tools_bench_pred_green.py
cp /tmp/pg_tiled.json "$ART/pg_pred_tiled_state.json" || true
step pred_fanout 3000 env PG_STATE=/tmp/pg_fanout.json PG_FANOUT=1 \
  PG_STAGE=predict python tools_bench_pred_green.py
cp /tmp/pg_fanout.json "$ART/pg_pred_fanout_state.json" || true
step pred_specfanout 3000 env PG_STATE=/tmp/pg_spec.json PG_FANOUT=1 \
  PG_PRED_SPEC=1 PG_STAGE=predict python tools_bench_pred_green.py
cp /tmp/pg_spec.json "$ART/pg_pred_specfanout_state.json" || true

# 9. End-to-end pipeline with the best modes -> one cases/min report.
step pipe_predict 4000 env PG_STATE=/tmp/pg_full.json PG_FANOUT=1 \
  PG_PRED_SPEC=1 PG_STAGE=predict python tools_bench_pred_green.py
step pipe_judge 4000 env PG_STATE=/tmp/pg_full.json PG_JUDGE_SHARE=1 \
  PG_STAGE=judge python tools_bench_pred_green.py
step pred_then_green 600 env PG_STATE=/tmp/pg_full.json PG_STAGE=report \
  python tools_bench_pred_green.py

# 10. Slot-engine ladder sweep (per-dispatch cost per verify-block size).
echo "=== $(date) slots_ladder"
timeout 4000 python tools_bench_slots.py > /tmp/r4.slots.log 2>&1 \
  && cp /tmp/r4.slots.log "$ART/slots_ladder.log" || \
  { echo "slots FAILED"; cat /tmp/r4.slots.log; }

# 11. 8B memory diet: B48 all-int4 with vision microbatch 32.
step bench_8b_b48 4000 env BENCH_MODEL=8b BENCH_BATCH=48 BENCH_WQ=int4 \
  BENCH_KV=int4 BENCH_VMB=32 BENCH_ALT_TOO=0 python bench.py

echo "=== $(date) r4 queue done"
