#!/usr/bin/env bash
# Round-5 consolidated tail queue (replaces the r5f/r5g/r5h watcher
# chain): the round's wall budget is uncertain, so run the remaining
# chip legs in PRIORITY order instead of historical order, after the
# r5e suite finishes (the suite runs alone — contended suite logs were
# an r4 VERDICT complaint).
#   1. 1.7B B128 rungs after the bench setup diet (commit 350e597):
#      int8w first (a win flips the recorded default past B112).
#   2. 8B unchunked B72/B80 (+vmb128 check): headroom past 184.4?
#   3. Real-weights rehearsal RESUME: quant gate (per-mode resumable
#      now; int8 leg repeats after its in-memory result died with the
#      r5d stage timeout) + serve legs + final report artifact.
#   4. 8B shipping-config probes (lowest: the staged-relay OOM story
#      already has committed evidence).
set -x
exec >> /tmp/r5i_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

for i in $(seq 1 960); do
  grep -q "r5e suite done" /tmp/r5e_suite.log 2>/dev/null && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

bench_leg() { # name timeout env...
  local name=$1 to=$2; shift 2
  echo "=== $(date) bench $name"
  if timeout "$to" env BENCH_ALT_TOO=0 "$@" python bench.py \
      > "/tmp/r5.$name.json" 2> "/tmp/r5.$name.log"; then
    cp "/tmp/r5.$name.json" "$ART/$name.json"
    echo "--- $name OK:"; cat "$ART/$name.json"
  else
    echo "--- $name FAILED rc=$?"; tail -n 20 "/tmp/r5.$name.log"
  fi
}

bench_leg bench_int8w_b128_diet 3600 BENCH_BATCH=128
bench_leg bench_int4w_b128      3600 BENCH_BATCH=128 BENCH_WQ=int4
bench_leg bench_8b_b72_nochunk  3600 BENCH_MODEL=8b BENCH_WQ=int4 \
  BENCH_KV=int4 BENCH_BATCH=72 BENCH_VMB=72
bench_leg bench_8b_b80_nochunk  3600 BENCH_MODEL=8b BENCH_WQ=int4 \
  BENCH_KV=int4 BENCH_BATCH=80 BENCH_VMB=80

echo "=== $(date) real-weights rehearsal RESUME (quant per-mode + serve + report)"
REH_RESUME=1 REH_QUANT_TIMEOUT=10800 ART=$ART \
  bash tools_rehearse_real_weights.sh \
  || echo "--- rehearsal FAILED rc=$?"

probe() { # name timeout env...
  local name=$1 to=$2; shift 2
  echo "=== $(date) $name"
  if timeout "$to" env "$@" python tools_probe_8b_memory.py \
      > "/tmp/r5.$name.json" 2> "/tmp/r5.$name.log"; then
    cp "/tmp/r5.$name.json" "$ART/$name.json"
    echo "--- $name OK:"; cat "$ART/$name.json"
  else
    echo "--- $name FAILED rc=$?"; tail -n 20 "/tmp/r5.$name.log"
  fi
}
probe probe8b_time_b64_ship 3600 PROBE=time PM_BATCH=64 PM_VMB=64 \
  PM_PREFILL_CHUNK=0 PM_DECODE_CHUNK=0
bench_leg bench_8b_b64_vmb128 3600 BENCH_MODEL=8b BENCH_WQ=int4 \
  BENCH_KV=int4 BENCH_BATCH=64 BENCH_VMB=128

echo "=== $(date) r5i queue done"
