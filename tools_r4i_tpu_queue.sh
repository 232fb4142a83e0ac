#!/usr/bin/env bash
# Round-4 ninth queue (waits for r4g2): (1) speculative SAMPLING at
# serving batch B64 — the r3 crossover (acceptance 1.49) was measured at
# B16; B64 pushes more rows into the warp's uncertainty band per step and
# the escalating top-k cascade was built for exactly that, so the
# profitability verdict needs a B64 number (ROADMAP perf item). (2) An 8B
# all-int4 bench sanity pass over the CHANGED int4 prefill path (the
# jax.checkpoint on the dequant-dot is forward-neutral by construction;
# this records it).
set -x
exec >> /tmp/r4i_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 0); do
  grep -q "r4g2 queue done" /tmp/r4g2_queue.log && break
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

step spec_sampling_b64 3000 env SS_BATCH=64 \
  SS_STATE=/tmp/ss_b64_state.json python tools_bench_spec_sampling.py

step bench_8b_b48_postfix 3000 env BENCH_MODEL=8b BENCH_WQ=int4 \
  BENCH_KV=int4 BENCH_BATCH=48 BENCH_VMB=32 BENCH_PREFILL_CHUNK=256 \
  BENCH_ALT_TOO=0 python bench.py

# Batch-scaling probes the r4 memory work may newly admit:
# 1.7B SFT at B4 (B2 measured 5153 tok/s / 45.5% MFU; does B4 keep
# scaling or OOM on activation peaks?)
step sft17b_b4 3000 env TRAIN_B=4 TRAIN_CE_CHUNK=256 TRAIN_STEPS=4 \
  python tools_train_17b.py

# 8B QLoRA at B2 (B1 fits with ~0.6 GB headroom after the dequant-
# residual fixes; B2 would double tokens/s if activations fit)
step train_8b_qlora_b2 3600 env TRAIN_B=2 TRAIN_STEPS=4 \
  TRAIN_CE_CHUNK=256 python tools_train_8b_qlora.py

echo "=== $(date) r4i queue done"
