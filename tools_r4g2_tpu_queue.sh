#!/usr/bin/env bash
# Round-4 r4g2: the 8B QLoRA proof with BOTH residual fixes in (vocab-tiled
# lm_head body checkpoint + int4 dequant-dot checkpoint: the backward now
# re-derives every dequantized kernel from the packed int4/int8 params
# instead of keeping bf16 copies live across fwd->bwd). Chunked-CE variant
# first (it was closest: 508 MB over), then the plain-CE A/B. Then the
# r4h items (int8w batch retune, flash-bwd long-S A/B, full suite).
set -x
exec >> /tmp/r4g2_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

step() {
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

step train_8b_qlora_cechunk 3600 env TRAIN_STEPS=6 TRAIN_CE_CHUNK=256 \
  python tools_train_8b_qlora.py
step train_8b_qlora 3600 env TRAIN_STEPS=6 python tools_train_8b_qlora.py

# --- r4h items (relaunched after the reorder) ---
step bench_int8w_b80 2400 env BENCH_WQ=int8 BENCH_KV=int4 BENCH_BATCH=80 \
  BENCH_ALT_TOO=0 python bench.py
step bench_int8w_b96 2400 env BENCH_WQ=int8 BENCH_KV=int4 BENCH_BATCH=96 \
  BENCH_ALT_TOO=0 python bench.py

step sft17b_s4096_base 3000 env TRAIN_S=4096 TRAIN_CE_CHUNK=256 \
  TRAIN_STEPS=4 python tools_train_17b.py
step sft17b_s4096_flashbwd 3000 env TRAIN_S=4096 TRAIN_CE_CHUNK=256 \
  TRAIN_STEPS=4 U2_FLASH_BWD=1 python tools_train_17b.py

echo "=== $(date) tpu work done; full suite (slow tier included) on idle host"
{ time python -m pytest tests/ -q -p no:cacheprovider --durations=25 ; } \
  > /tmp/r4.full_suite_idle.log 2>&1
tail -40 /tmp/r4.full_suite_idle.log
cp /tmp/r4.full_suite_idle.log "$ART/full_suite_idle.log"

echo "=== $(date) r4g2 queue done"
