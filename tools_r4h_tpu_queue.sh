#!/usr/bin/env bash
# Round-4 eighth queue (waits for r4g): retune the DEFAULT headline batch
# (int8w was only ever measured at B48/B64; the int4w sweep showed the
# decode knee is past B64, so int8w B80/B96 may beat the recorded 283.9),
# then the flash-backward long-S win case (BENCHMARKS notes it untested:
# the kernel's O(S*D) advantage should appear at S=4096 where XLA's dense
# (B,H,S,S) recompute dominates), then one full-suite green run timed on
# the idle host.
set -x
exec >> /tmp/r4h_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4g queue done" /tmp/r4g_queue.log && break
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

# Default-config (int8w + int4kv) batch retune above B64
step bench_int8w_b80 2400 env BENCH_WQ=int8 BENCH_KV=int4 BENCH_BATCH=80 \
  BENCH_ALT_TOO=0 python bench.py
step bench_int8w_b96 2400 env BENCH_WQ=int8 BENCH_KV=int4 BENCH_BATCH=96 \
  BENCH_ALT_TOO=0 python bench.py

# Flash-backward win case: 1.7B SFT at S=4096 (B1, chunked CE so the
# long-S logits don't mask the attention A/B)
step sft17b_s4096_base 3000 env TRAIN_S=4096 TRAIN_CE_CHUNK=256 \
  TRAIN_STEPS=4 python tools_train_17b.py
step sft17b_s4096_flashbwd 3000 env TRAIN_S=4096 TRAIN_CE_CHUNK=256 \
  TRAIN_STEPS=4 U2_FLASH_BWD=1 python tools_train_17b.py

echo "=== $(date) tpu work done; full suite (slow tier included) on idle host"
{ time python -m pytest tests/ -q -p no:cacheprovider --durations=25 ; } \
  > /tmp/r4.full_suite_idle.log 2>&1
tail -40 /tmp/r4.full_suite_idle.log
cp /tmp/r4.full_suite_idle.log "$ART/full_suite_idle.log"

echo "=== $(date) r4h queue done"
