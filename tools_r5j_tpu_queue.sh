#!/usr/bin/env bash
# Round-5 straggler queue (waits for r5i): retry the int8w B128 leg that
# was SIGTERMed 40 s in when it overlapped a foreground verify bench on
# the chip (one-TPU-job rule), and measure the staged relay at its B32
# capacity (the runbook's relay-job throughput number).
set -x
exec >> /tmp/r5j_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

for i in $(seq 1 1080); do
  grep -q "r5i queue done" /tmp/r5i_queue.log 2>/dev/null && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== $(date) bench bench_int8w_b128_diet (retry)"
if timeout 3600 env BENCH_ALT_TOO=0 BENCH_BATCH=128 python bench.py \
    > /tmp/r5.bench_int8w_b128_diet.json \
    2> /tmp/r5.bench_int8w_b128_diet.log; then
  cp /tmp/r5.bench_int8w_b128_diet.json "$ART/bench_int8w_b128_diet.json"
  echo "--- bench_int8w_b128_diet OK:"
  cat "$ART/bench_int8w_b128_diet.json"
else
  echo "--- bench_int8w_b128_diet FAILED rc=$?"
  tail -n 20 /tmp/r5.bench_int8w_b128_diet.log
fi

echo "=== $(date) probe8b_time_b32_relay"
if timeout 3600 env PROBE=time PM_BATCH=32 PM_VMB=32 \
    PM_PREFILL_CHUNK=256 PM_DECODE_CHUNK=256 \
    python tools_probe_8b_memory.py \
    > /tmp/r5.probe8b_time_b32_relay.json \
    2> /tmp/r5.probe8b_time_b32_relay.log; then
  cp /tmp/r5.probe8b_time_b32_relay.json "$ART/probe8b_time_b32_relay.json"
  echo "--- probe8b_time_b32_relay OK:"
  cat "$ART/probe8b_time_b32_relay.json"
else
  echo "--- probe8b_time_b32_relay FAILED rc=$?"
  tail -n 20 /tmp/r5.probe8b_time_b32_relay.log
fi

echo "=== $(date) r5j queue done"
