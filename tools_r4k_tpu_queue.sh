#!/usr/bin/env bash
# Round-4 eleventh queue (waits for r4j): prove the EXACT driver-recorded
# bench configuration end-to-end after the B64->B96 default-batch flip —
# pure-default `python bench.py` runs plain greedy AND the alt speculative
# config at B96 (BENCH_ALT_TOO defaults to 1), and spec at B96 has never
# been compiled/run on-chip. If this OOMs, the batch default must revert
# before the driver's end-of-round run.
set -x
exec >> /tmp/r4k_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4j queue done" /tmp/r4j_queue.log && break
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

step bench_default_b96 3600 python bench.py

echo "=== $(date) r4k queue done"
