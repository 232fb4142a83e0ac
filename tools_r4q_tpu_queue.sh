#!/usr/bin/env bash
# Round-4 seventeenth queue (waits for r4p): fixup pass for the B64
# spec-sampling protocol.
# - plain_short hit a transient RESOURCE_EXHAUSTED at init in r4o (the
#   very next leg initialized fine) -> plain retry-if-missing.
# - spec_full at T=768 reproducibly crashes the axon TPU worker (3rd
#   repro across two hosts; the 50 s plain_full and 39 s forced_full
#   programs survive, so the suspect is single-program wall clock ~66 s
#   at random acceptance ~1) -> measure it at SS_TOKENS=512 (~44 s
#   expected), falling back to 384. tau_spec is per verify step, so a
#   shorter leg measures the same quantity; the report now uses per-leg
#   token counts (state *_T keys).
set -x
exec >> /tmp/r4q_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4p queue done" /tmp/r4p_queue.log && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

ST=/tmp/ss_b64_state.json
have() { python -c "import json,sys; d=json.load(open('$ST')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }

for mode in plain_short plain_full spec_short forced_full; do
  for attempt in 1 2; do
    have "$mode" && break
    echo "=== $(date) re-run $mode (attempt $attempt)"
    if timeout 2400 env SS_BATCH=64 SS_MODE=$mode SS_STATE=$ST \
        python tools_bench_spec_sampling.py > "/tmp/r4.ss_b64_${mode}_idle.json"; then
      cp "/tmp/r4.ss_b64_${mode}_idle.json" "$ART/ss_b64_${mode}_idle.json"
      echo "--- $mode OK:"; cat "$ART/ss_b64_${mode}_idle.json"
    else
      echo "--- $mode FAILED rc=$?"; sleep 20
    fi
  done
done

# spec_full: shortened-T legs to duck the worker watchdog
for tok in 512 384; do
  have spec_full && break
  echo "=== $(date) spec_full at T=$tok"
  if timeout 2400 env SS_BATCH=64 SS_MODE=spec_full SS_TOKENS=$tok SS_STATE=$ST \
      python tools_bench_spec_sampling.py > /tmp/r4.ss_b64_spec_full_idle.json; then
    cp /tmp/r4.ss_b64_spec_full_idle.json "$ART/ss_b64_spec_full_idle.json"
    echo "--- spec_full T=$tok OK:"; cat "$ART/ss_b64_spec_full_idle.json"
  else
    echo "--- spec_full T=$tok FAILED rc=$?"; sleep 20
  fi
done

echo "=== $(date) final report"
if timeout 300 env SS_BATCH=64 SS_MODE=report SS_STATE=$ST \
    python tools_bench_spec_sampling.py > /tmp/r4.spec_sampling_b64.json; then
  cp /tmp/r4.spec_sampling_b64.json "$ART/spec_sampling_b64.json"
  echo "--- report OK:"; cat "$ART/spec_sampling_b64.json"
else
  echo "--- report FAILED"; cat /tmp/r4.spec_sampling_b64.json
fi
cp $ST "$ART/ss_b64_state.json" 2>/dev/null

echo "=== $(date) r4q queue done"
