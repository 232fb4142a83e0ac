#!/usr/bin/env bash
# Round-4 fifteenth queue: the host restarted, wiping /tmp (the r4m/r4n
# queues and the SS_STATE file never survived). The host is now IDLE —
# exactly the condition r4m wanted — so re-run ALL five B64 spec-sampling
# legs fresh (plain_short, plain_full, spec_short, spec_full, forced_full;
# the per-leg step counts live only in SS_STATE, so everything must be
# re-measured in one consistent session), then regenerate the crossover
# report. Afterwards: one default-config bench.py pass (warms the
# persistent compile cache for the driver's end-of-round run and records
# the current headline on this host), then the fast test tier.
set -x
exec >> /tmp/r4o_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

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
for mode in plain_short plain_full spec_short; do
  step "ss_b64_${mode}_idle" 2400 env SS_BATCH=64 SS_MODE=$mode SS_STATE=$ST \
    python tools_bench_spec_sampling.py
done
# spec_full crashed once in r4j with a transient TPU-worker error; retry.
# (ADVICE r4: check the CURRENT state, not the persistent artifact — a
# stale committed artifact would short-circuit retries.)
for attempt in 1 2; do
  step "ss_b64_spec_full_idle" 2400 env SS_BATCH=64 SS_MODE=spec_full SS_STATE=$ST \
    python tools_bench_spec_sampling.py
  python -c "import json,sys; sys.exit(0 if 'spec_full' in json.load(open('$ST')) else 1)" \
    2>/dev/null && break
  echo "=== spec_full attempt $attempt failed; retrying"
  sleep 20
done
step "ss_b64_forced_full_idle" 2400 env SS_BATCH=64 SS_MODE=forced_full SS_STATE=$ST \
  python tools_bench_spec_sampling.py
step spec_sampling_b64 300 env SS_BATCH=64 SS_MODE=report SS_STATE=$ST \
  python tools_bench_spec_sampling.py
cp $ST "$ART/ss_b64_state.json" 2>/dev/null

echo "=== $(date) default bench pass (cache warm + current headline)"
step bench_default_r4o 3600 python bench.py

echo "=== $(date) fast test tier"
timeout 900 env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m pytest tests/ -m "not slow" -q 2>&1 | tail -5

echo "=== $(date) r4o queue done"
