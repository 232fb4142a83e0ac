#!/usr/bin/env bash
# Round-4 twelfth queue (waits for r4k): the flash-backward auto-gate
# (S >= 2048) creates a MIXED default at S=1024 training — decoder
# backward stays XLA (S=1024) but the ViT backward (S=2049 per chunk)
# now auto-selects Pallas. Both prior A/Bs forced every attention the
# same way (all-XLA 0.216 vs all-Pallas 0.225 s/step), so the mixed
# default is unmeasured. One defaults-run of tools_train_17b.py decides:
# ~0.216 keeps the rule; slower than 0.225 refines it to causal-only.
set -x
exec >> /tmp/r4l_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4k queue done" /tmp/r4k_queue.log && break
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

step sft17b_mixed_autogate 3000 env TRAIN_STEPS=4 python tools_train_17b.py

echo "=== $(date) r4l queue done"
