#!/usr/bin/env bash
# Round-5 full-suite run (r4 VERDICT next #2): one COMPLETE green run of
# the whole suite with summary lines, committed as an artifact. Chained
# after the r5b queue so the host-dispatch-sensitive measurements (slot
# ladder, spec legs) are done; overlaps only the r5c device-bound probes.
set -x
exec >> /tmp/r5_suite.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

for i in $(seq 1 960); do
  grep -q "r5b queue done" /tmp/r5b_queue.log && break
  sleep 30
done

echo "=== $(date) full suite"
timeout 10800 python -m pytest tests/ -q --durations=40 \
  > /tmp/r5.full_suite.log 2>&1
rc=$?
tail -60 /tmp/r5.full_suite.log
cp /tmp/r5.full_suite.log "$ART/full_suite.log"
echo "=== $(date) full suite rc=$rc"

echo "=== $(date) fast tier (cold import, complete verdict)"
{ time timeout 600 python -m pytest tests/ -m "not slow" -q ; } \
  > /tmp/r5.fast_tier.log 2>&1
tail -8 /tmp/r5.fast_tier.log
cp /tmp/r5.fast_tier.log "$ART/fast_tier.log"

echo "=== $(date) r5 suite done"
