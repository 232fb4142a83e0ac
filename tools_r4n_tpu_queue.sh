#!/usr/bin/env bash
# Round-4 fourteenth queue (waits for r4m): retry the ONE missing B64
# spec-sampling leg — spec_full crashed with a transient TPU-worker error
# in r4j (the identical-compute forced_full leg succeeded at 39.11 s
# right after, so the program itself is sound) — then regenerate the
# combined crossover report from SS_STATE (which by then holds idle-host
# plain legs from r4m + spec/forced legs from r4j).
set -x
exec >> /tmp/r4n_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4m queue done" /tmp/r4m_queue.log && break
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
# two attempts: the r4j failure was a transient worker crash
for attempt in 1 2; do
  step "ss_b64_spec_full" 2400 env SS_BATCH=64 SS_MODE=spec_full SS_STATE=$ST \
    python tools_bench_spec_sampling.py
  grep -q '"spec_full"' "$ART/ss_b64_spec_full.json" 2>/dev/null && break
  echo "=== spec_full attempt $attempt failed; retrying"
  sleep 20
done
step spec_sampling_b64 300 env SS_BATCH=64 SS_MODE=report SS_STATE=$ST \
  python tools_bench_spec_sampling.py
cp $ST "$ART/ss_b64_state.json" 2>/dev/null

echo "=== $(date) r4n queue done"
