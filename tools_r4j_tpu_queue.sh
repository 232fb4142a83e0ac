#!/usr/bin/env bash
# Round-4 tenth queue (waits for r4i): speculative SAMPLING at serving
# batch B64, run the way tools_bench_spec_sampling.py is designed — ONE
# variant per process (the axon backend does not reliably reuse the
# persistent compile cache for multi-minute programs across processes),
# then a report pass that combines the state file. The r4i attempt
# invoked it once with the default SS_MODE=report on a fresh state and
# failed in 4 s; this is the corrected protocol. The question being
# answered (ROADMAP perf item): the r3 crossover (acceptance 1.49) was
# measured at B16 — at B64 more rows land in the warp's uncertainty band
# per verify step, so the B64 crossover + the forced-content acceptance
# decide whether spec SAMPLING is profitable at serving batch.
set -x
exec >> /tmp/r4j_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 240); do
  grep -q "r4i queue done" /tmp/r4i_queue.log && break
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

ST=/tmp/ss_b64_state.json
rm -f "$ST"
for mode in plain_short plain_full spec_short spec_full forced_full; do
  step "ss_b64_$mode" 2400 env SS_BATCH=64 SS_MODE=$mode SS_STATE=$ST \
    python tools_bench_spec_sampling.py
done
step spec_sampling_b64 300 env SS_BATCH=64 SS_MODE=report SS_STATE=$ST \
  python tools_bench_spec_sampling.py

echo "=== $(date) r4j queue done"
