#!/usr/bin/env bash
# Round-4 sixth queue: cheap batch-sweep probes on the best measured
# configs (int4 weights + int4 KV freed ~1 GB at B64 — do bigger batches
# now pay?), then the fast test tier timed on an idle host. Waits for r4e.
set -x
exec >> /tmp/r4f_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4e queue done" /tmp/r4e_queue.log && break
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

# 1.7B int4w+int4kv batch sweep above the B64 sweet spot (310.9 measured)
step bench_int4w_b80 2400 env BENCH_WQ=int4 BENCH_KV=int4 BENCH_BATCH=80 \
  BENCH_ALT_TOO=0 python bench.py
step bench_int4w_b96 2400 env BENCH_WQ=int4 BENCH_KV=int4 BENCH_BATCH=96 \
  BENCH_ALT_TOO=0 python bench.py

# 8B all-int4 B64 probe (B48 = 179.9; chunked prefill + vision microbatch
# kept the B48 activations in budget — does B64 still gain?)
step bench_8b_b64 3000 env BENCH_MODEL=8b BENCH_WQ=int4 BENCH_KV=int4 \
  BENCH_BATCH=64 BENCH_VMB=32 BENCH_PREFILL_CHUNK=256 BENCH_ALT_TOO=0 python bench.py

# DPO at 2 pairs/step (the chunked-CE memory relief may admit a second
# pair like it did the second SFT sequence)
step dpo_17b_p2 4000 env TRAIN_B=2 python tools_train_dpo_17b.py

echo "=== $(date) tpu work done; timing the fast tier on the idle host"
{ time python -m pytest tests/ -q -m "not slow" -p no:cacheprovider \
    --durations=25 ; } > /tmp/r4.fast_tier_idle.log 2>&1
tail -30 /tmp/r4.fast_tier_idle.log
cp /tmp/r4.fast_tier_idle.log "$ART/fast_tier_idle.log"

echo "=== $(date) r4f queue done"
