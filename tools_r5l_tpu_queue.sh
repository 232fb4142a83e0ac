#!/usr/bin/env bash
# Round-5 last stragglers (waits for r5k):
# - int8w B128 third attempt: try 1 overlapped a foreground verify bench
#   (SIGTERM), try 2 died in the REMOTE COMPILE helper (HTTP 500,
#   tpu_compile_helper rc=1) — int4w B128 compiled+ran fine minutes
#   earlier, so the helper failure looks transient.
# - staged-relay throughput at its B32 capacity with an int8 cache: the
#   int4-KV attempt failed structurally (S4 cache cannot cross the
#   relay's jit boundary between decode chunks) — int8 KV is the staged
#   path's cache format, record its actual rate for the runbook.
set -x
exec >> /tmp/r5l_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

for i in $(seq 1 1080); do
  grep -q "r5k queue done" /tmp/r5k_queue.log 2>/dev/null && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== $(date) bench bench_int8w_b128_diet (third attempt)"
if timeout 3600 env BENCH_ALT_TOO=0 BENCH_BATCH=128 python bench.py \
    > /tmp/r5.bench_int8w_b128_diet.json \
    2> /tmp/r5.bench_int8w_b128_diet.log; then
  cp /tmp/r5.bench_int8w_b128_diet.json "$ART/bench_int8w_b128_diet.json"
  echo "--- bench_int8w_b128_diet OK:"
  cat "$ART/bench_int8w_b128_diet.json"
else
  echo "--- bench_int8w_b128_diet FAILED rc=$?"
  tail -n 10 /tmp/r5.bench_int8w_b128_diet.log
fi

echo "=== $(date) probe8b_time_b32_relay_int8kv"
if timeout 3600 env PROBE=time PM_BATCH=32 PM_VMB=32 PM_KV=int8 \
    PM_PREFILL_CHUNK=256 PM_DECODE_CHUNK=256 \
    python tools_probe_8b_memory.py \
    > /tmp/r5.probe8b_time_b32_relay_int8kv.json \
    2> /tmp/r5.probe8b_time_b32_relay_int8kv.log; then
  cp /tmp/r5.probe8b_time_b32_relay_int8kv.json \
     "$ART/probe8b_time_b32_relay_int8kv.json"
  echo "--- probe8b_time_b32_relay_int8kv OK:"
  cat "$ART/probe8b_time_b32_relay_int8kv.json"
else
  echo "--- probe8b_time_b32_relay_int8kv FAILED rc=$?"
  tail -n 10 /tmp/r5.probe8b_time_b32_relay_int8kv.log
fi

echo "=== $(date) r5l queue done"
