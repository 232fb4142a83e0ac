#!/usr/bin/env bash
# Round-5 fifth queue (waits for the r5e suite so benches never contend
# with pytest on the single-core host): walk the 8B unchunked-prefill
# config — the r5c winner at B64 (184.4 r/min) — further up the batch
# ladder, and check whether a bigger vision microbatch pays at B64.
set -x
exec >> /tmp/r5f_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

for i in $(seq 1 960); do
  grep -q "r5e suite done" /tmp/r5e_suite.log 2>/dev/null && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

bench_leg() { # name timeout env...
  local name=$1 to=$2; shift 2
  echo "=== $(date) bench $name"
  if timeout "$to" env BENCH_MODEL=8b BENCH_WQ=int4 BENCH_KV=int4 \
      BENCH_ALT_TOO=0 "$@" python bench.py > "/tmp/r5.$name.json" \
      2> "/tmp/r5.$name.log"; then
    cp "/tmp/r5.$name.json" "$ART/$name.json"
    echo "--- $name OK:"; cat "$ART/$name.json"
  else
    echo "--- $name FAILED rc=$?"; tail -n 20 "/tmp/r5.$name.log"
  fi
}
bench_leg bench_8b_b72_nochunk  3600 BENCH_BATCH=72 BENCH_VMB=72
bench_leg bench_8b_b80_nochunk  3600 BENCH_BATCH=80 BENCH_VMB=80
bench_leg bench_8b_b64_vmb128   3600 BENCH_BATCH=64 BENCH_VMB=128

echo "=== $(date) r5f queue done"
