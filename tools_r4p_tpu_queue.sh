#!/usr/bin/env bash
# Round-4 sixteenth queue (waits for r4o): the slot-engine LADDER sweep —
# the one r3 A/B still without a recorded artifact (BENCHMARKS.md
# "Continuous batching": per-rung dispatch cost c(k) "queued for on-chip
# calibration"). Pins the speculative slot engine at each verify-block
# rung kb in {1,2,4,8}, plus plain and the adaptive engine, and records
# ms/dispatch per rung; c(k)/c(plain) is the acceptance crossover the
# adaptive thresholds encode.
set -x
exec >> /tmp/r4p_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4o queue done" /tmp/r4o_queue.log && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== $(date) slot ladder sweep"
if timeout 4000 python tools_bench_slots.py > /tmp/r4.slot_ladder.txt 2>/tmp/r4.slot_ladder.err; then
  # progress rows + one final JSON line; archive the JSON and keep the log
  tail -1 /tmp/r4.slot_ladder.txt > "$ART/slot_ladder.json"
  cp /tmp/r4.slot_ladder.txt "$ART/slot_ladder.log"
  echo "--- slot_ladder OK:"; cat "$ART/slot_ladder.json"
else
  echo "--- slot_ladder FAILED rc=$?"; tail -20 /tmp/r4.slot_ladder.txt /tmp/r4.slot_ladder.err
fi

echo "=== $(date) r4p queue done"
