#!/usr/bin/env bash
# Round-5 first queue: finish the two measurement threads the r4 VERDICT
# flagged as abandoned (next #3/#4).
# - B64 spec-sampling: the r4q fixup queue never ran, so the state still
#   lacks plain_short and spec_full. Seed the state from the committed r4
#   artifact, backfill the legacy *_T keys (r4o ran every leg at the
#   default SS_TOKENS=768 / SS_SHORT=16 protocol — tools_r4o_tpu_queue.sh),
#   measure the missing legs (spec_full at shortened T per the r4q
#   protocol: T=768 reproducibly crashes the axon TPU worker), and emit
#   the final crossover report.
# - slot-ladder c(k) calibration (owed since r3): per-rung dispatch costs
#   for the adaptive speculative ladder.
# Retry checks look at the PER-ATTEMPT output, not the persistent
# artifact (ADVICE r4: a stale artifact would short-circuit retries).
set -x
exec >> /tmp/r5_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

ST=/tmp/r5_ss_b64_state.json
if [ ! -f "$ST" ]; then
  python - <<'EOF'
import json
src = json.load(open("docs/artifacts/r4/ss_b64_state.json"))
# r4o protocol: every leg at SS_TOKENS=768 / SS_SHORT=16 (the _T keys
# were introduced afterwards, in 048c484)
src.setdefault("plain_full_T", 768)
src.setdefault("spec_short_T", 16)
src.setdefault("forced_full_T", 768)
json.dump(src, open("/tmp/r5_ss_b64_state.json", "w"))
print("seeded:", src)
EOF
fi
have() { python -c "import json,sys; d=json.load(open('$ST')); sys.exit(0 if '$1' in d else 1)" 2>/dev/null; }

# missing leg 1: plain_short (transient RESOURCE_EXHAUSTED in r4o)
for attempt in 1 2; do
  have plain_short && break
  echo "=== $(date) plain_short (attempt $attempt)"
  if timeout 2400 env SS_BATCH=64 SS_MODE=plain_short SS_STATE=$ST \
      python tools_bench_spec_sampling.py > /tmp/r5.ss_ps.json \
      && grep -q '"plain_short"' /tmp/r5.ss_ps.json; then
    cp /tmp/r5.ss_ps.json "$ART/ss_b64_plain_short_idle.json"
    echo "--- plain_short OK:"; cat /tmp/r5.ss_ps.json
  else
    echo "--- plain_short FAILED rc=$?"; sleep 20
  fi
done

# missing leg 2: spec_full at shortened T (the r4q protocol)
for tok in 512 384; do
  have spec_full && break
  echo "=== $(date) spec_full at T=$tok"
  if timeout 2400 env SS_BATCH=64 SS_MODE=spec_full SS_TOKENS=$tok SS_STATE=$ST \
      python tools_bench_spec_sampling.py > /tmp/r5.ss_sf.json \
      && grep -q '"spec_full"' /tmp/r5.ss_sf.json; then
    cp /tmp/r5.ss_sf.json "$ART/ss_b64_spec_full_idle.json"
    echo "--- spec_full T=$tok OK:"; cat /tmp/r5.ss_sf.json
  else
    echo "--- spec_full T=$tok FAILED rc=$?"; sleep 20
  fi
done

echo "=== $(date) final crossover report"
if timeout 300 env SS_BATCH=64 SS_MODE=report SS_STATE=$ST \
    python tools_bench_spec_sampling.py > /tmp/r5.ss_report.json; then
  cp /tmp/r5.ss_report.json "$ART/spec_sampling_b64.json"
  echo "--- report OK:"; cat "$ART/spec_sampling_b64.json"
else
  echo "--- report FAILED:"; cat /tmp/r5.ss_report.json
fi
cp $ST "$ART/ss_b64_state.json" 2>/dev/null

echo "=== $(date) slot-ladder c(k) calibration"
for attempt in 1 2; do
  if timeout 3600 python tools_bench_slots.py > /tmp/r5.slot_ladder.json \
      && grep -q '"slot_ladder_ms_per_dispatch"' /tmp/r5.slot_ladder.json; then
    cp /tmp/r5.slot_ladder.json "$ART/slot_ladder.json"
    echo "--- slot ladder OK:"; cat "$ART/slot_ladder.json"
    break
  else
    echo "--- slot ladder FAILED rc=$? (attempt $attempt)"; sleep 20
  fi
done

echo "=== $(date) r5 queue done"
