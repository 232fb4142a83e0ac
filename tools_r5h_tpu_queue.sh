#!/usr/bin/env bash
# Round-5 seventh queue (waits for r5g): retry the B128 rung after the
# bench setup diet (CT batch allocated after the weight build; cast and
# quantize donate their inputs — commit 350e597). The r5d B128 attempt
# OOMed in SETUP, not decode, so the ceiling question is still open.
set -x
exec >> /tmp/r5h_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

for i in $(seq 1 960); do
  grep -q "r5g queue done" /tmp/r5g_queue.log 2>/dev/null && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

bench_leg() { # name timeout env...
  local name=$1 to=$2; shift 2
  echo "=== $(date) bench $name"
  if timeout "$to" env BENCH_ALT_TOO=0 "$@" python bench.py \
      > "/tmp/r5.$name.json" 2> "/tmp/r5.$name.log"; then
    cp "/tmp/r5.$name.json" "$ART/$name.json"
    echo "--- $name OK:"; cat "$ART/$name.json"
  else
    echo "--- $name FAILED rc=$?"; tail -n 20 "/tmp/r5.$name.log"
  fi
}
bench_leg bench_int8w_b128_diet 3600 BENCH_BATCH=128
bench_leg bench_int4w_b128      3600 BENCH_BATCH=128 BENCH_WQ=int4

echo "=== $(date) r5h queue done"
