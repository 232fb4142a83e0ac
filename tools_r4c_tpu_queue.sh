#!/usr/bin/env bash
# Round-4 third queue: retries with the int8-lm-head-in-int4-mode fix,
# re-measurements with bf16 KV scales, the pipeline report at the fitting
# judge batch, and the flagship dryrun artifact. Waits for r4b first.
set -x
exec >> /tmp/r4c_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4b queue done" /tmp/r4b_queue.log && break
  sleep 30
done

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

# 1. 8B QLoRA retry: int4 body + int8 lm_head (the 1.16 GB dequantized
#    head was the remaining OOM driver), chunked CE.
step qlora8b 5000 env TRAIN_CE_CHUNK=256 TRAIN_STEPS=4 \
  python tools_train_8b_qlora.py
step qlora8b_fullce 5000 env TRAIN_STEPS=4 python tools_train_8b_qlora.py

# 2. bf16 KV scales re-measurement (the r4 int4-KV numbers above ran with
#    fp32 scale buffers).
step bench_int4kv_bf16s 3000 env BENCH_KV=int4 BENCH_ALT_TOO=0 \
  python bench.py
step bench_8b_b48_bf16s 4000 env BENCH_MODEL=8b BENCH_BATCH=48 \
  BENCH_WQ=int4 BENCH_KV=int4 BENCH_VMB=32 BENCH_ALT_TOO=0 python bench.py
# int4 weights on the 1.7B headline config (never measured with int4 KV)
step bench_int4w_int4kv 3000 env BENCH_WQ=int4 BENCH_KV=int4 \
  BENCH_ALT_TOO=0 python bench.py

# 3. judge fanout_split A/B at B16 (the shared split cached once per case
#    at DECODE — the config whose tiled variant OOMed by 1.5 GB) and the
#    pred_then_green pipeline report at the best judge config.
step judge_fanout_b16 3000 env PG_STATE=/tmp/pg_judgefan.json \
  PG_JUDGE_FANOUT=1 PG_STAGE=judge python tools_bench_pred_green.py
cp /tmp/pg_judgefan.json "$ART/pg_judge_fanout_b16_state.json" || true
step pipe_judge 4000 env PG_STATE=/tmp/pg_full.json PG_JUDGE_FANOUT=1 \
  PG_STAGE=judge python tools_bench_pred_green.py || true
if [ ! -s "$ART/pipe_judge.json" ] && ! grep -q '"judge_s"' /tmp/pg_full.json; then
  step pipe_judge_b8 4000 env PG_STATE=/tmp/pg_full.json PG_JUDGE_SHARE=1 \
    PG_JUDGE_BATCH=8 PG_STAGE=judge python tools_bench_pred_green.py
fi
step pred_then_green 600 env PG_STATE=/tmp/pg_full.json PG_STAGE=report \
  python tools_bench_pred_green.py

# 4. flagship dryrun artifact (resident-bytes assertion).
echo "=== $(date) dryrun_flagship"
timeout 2400 python __graft_entry__.py dryrun 8 > /tmp/r4.dryrun.log 2>&1 \
  && { cp /tmp/r4.dryrun.log "$ART/dryrun_flagship.log"; \
       echo "--- dryrun OK:"; tail -5 "$ART/dryrun_flagship.log"; } \
  || { echo "--- dryrun FAILED rc=$?"; tail -30 /tmp/r4.dryrun.log; }

# 5. fast test tier timing (the <120 s gate, VERDICT next #6).
echo "=== $(date) fast_tier"
{ time timeout 1200 python -m pytest tests/ -m "not slow" -q \
    -p no:cacheprovider ; } > /tmp/r4.fast_tier.log 2>&1
tail -4 /tmp/r4.fast_tier.log
cp /tmp/r4.fast_tier.log "$ART/fast_tier.log"

echo "=== $(date) r4c queue done"
