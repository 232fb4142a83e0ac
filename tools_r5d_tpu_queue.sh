#!/usr/bin/env bash
# Round-5 fourth queue: retries of the two r5b/r5c failures with their
# fixes landed, plus the cheap knee-mapping legs the fixes unblock.
# - 8B QLoRA train-loop RESUME leg (r5b's failed leg): the step-8
#   checkpoint in /tmp/u2_train_loop_8b is intact; the loop now restores
#   into an abstract template so the trainables are never resident twice
#   (commit 93754af) — this leg alone completes the kill+resume proof.
# - 8B stage probes (r5c failures): the probe now frees the CT volume
#   batch before decode (time path) and records compile-OOMs as data
#   (mem path) — commit 158993f.
# - 1.7B knee checks: int4w at B112 (int8w B112 = 292.99 was a new best;
#   int4w B96 = 313.2 — does int4w keep scaling?), int8w B128.
# - real-weights rehearsal RESUME (quant gate re-run with the jitted
#   device-side metrics + serve legs; emit/convert/verify stand).
set -x
exec >> /tmp/r5d_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== $(date) 8B QLoRA train-loop proof: resume leg (retry w/ abstract restore)"
if KILL_AT=0 STEPS=24 SAVE_STEPS=8 RUN_DIR=/tmp/u2_train_loop_8b ART_DIR=$ART \
    timeout 7200 python tools_train_loop_8b.py > /tmp/r5.tl8b.json; then
  cp /tmp/r5.tl8b.json "$ART/train_loop_8b.json"
  echo "--- 8B train loop OK:"; cat "$ART/train_loop_8b.json"
else
  echo "--- 8B train loop FAILED rc=$?"
fi

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
probe probe8b_time_b48 3600 PROBE=time PM_BATCH=48 PM_VMB=32 PM_PREFILL_CHUNK=256
probe probe8b_time_b64 3600 PROBE=time PM_BATCH=64 PM_VMB=32 PM_PREFILL_CHUNK=256
probe probe8b_mem_b64  3600 PROBE=mem  PM_BATCH=64 PM_VMB=32 PM_PREFILL_CHUNK=256

bench_leg() { # name timeout env...
  local name=$1 to=$2; shift 2
  echo "=== $(date) bench $name"
  if timeout "$to" env "$@" python bench.py > "/tmp/r5.$name.json" \
      2> "/tmp/r5.$name.log"; then
    cp "/tmp/r5.$name.json" "$ART/$name.json"
    echo "--- $name OK:"; cat "$ART/$name.json"
  else
    echo "--- $name FAILED rc=$?"; tail -n 20 "/tmp/r5.$name.log"
  fi
}
bench_leg bench_int4w_b112 3600 BENCH_WQ=int4 BENCH_BATCH=112 BENCH_ALT_TOO=0
bench_leg bench_int8w_b128 3600 BENCH_BATCH=128 BENCH_ALT_TOO=0

echo "=== $(date) real-weights rehearsal RESUME (quant gate + serve legs)"
REH_RESUME=1 ART=$ART bash tools_rehearse_real_weights.sh \
  || echo "--- rehearsal FAILED rc=$?"

echo "=== $(date) r5d queue done"
