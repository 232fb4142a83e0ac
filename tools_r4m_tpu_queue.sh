#!/usr/bin/env bash
# Round-4 thirteenth queue (waits for r4l): re-measure the PLAIN sampled
# decode legs of the B64 spec-sampling protocol on an idle host and
# regenerate the report. The first plain_short/plain_full runs (r4j,
# 04:06-04:34) were contended by an orphan pytest process from the killed
# r4g2 queue (single host core) — inflated tau_plain biases the crossover
# LOW, overstating speculative profitability. The spec legs ran after the
# orphan was killed, so only the plain keys need redoing; SS_STATE
# persists and the report pass recombines.
set -x
exec >> /tmp/r4m_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4l queue done" /tmp/r4l_queue.log && break
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
for mode in plain_short plain_full; do
  step "ss_b64_${mode}_idle" 2400 env SS_BATCH=64 SS_MODE=$mode SS_STATE=$ST \
    python tools_bench_spec_sampling.py
done
step spec_sampling_b64 300 env SS_BATCH=64 SS_MODE=report SS_STATE=$ST \
  python tools_bench_spec_sampling.py

echo "=== $(date) r4m queue done"
