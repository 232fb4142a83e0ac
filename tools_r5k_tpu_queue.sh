#!/usr/bin/env bash
# Round-5 final leg (waits for r5j): one default-config bench re-run at
# the round's final tree, so BENCH_r05's expected figure has a same-tree
# in-repo record (r4 did the same with bench_final.json).
set -x
exec >> /tmp/r5k_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

for i in $(seq 1 1080); do
  grep -q "r5j queue done" /tmp/r5j_queue.log 2>/dev/null && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== $(date) bench final (default config, ALT too)"
if timeout 5400 python bench.py > /tmp/r5.bench_final.json \
    2> /tmp/r5.bench_final.log; then
  cp /tmp/r5.bench_final.json "$ART/bench_final.json"
  echo "--- bench_final OK:"; cat "$ART/bench_final.json"
else
  echo "--- bench_final FAILED rc=$?"; tail -n 20 /tmp/r5.bench_final.log
fi

echo "=== $(date) r5k queue done"
