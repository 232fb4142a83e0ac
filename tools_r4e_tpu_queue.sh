#!/usr/bin/env bash
# Round-4 fifth queue: re-run the 8B QLoRA on-chip proof with the
# lm_head out-tiling fix (the r4c attempt OOMed at 16.97/15.75 GB HBM on
# the 1.16 GB bf16 lm_head dequant temp — decoder.QDense out_tiles bounds
# it at 1/8th). Waits for r4d (train-loop proof) to release the chip.
set -x
exec >> /tmp/r4e_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4d queue done" /tmp/r4d_queue.log && break
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

# the 8B QLoRA proof: int4 base, chunked CE, 8-way lm_head tiling
step qlora8b 5000 env TRAIN_CE_CHUNK=256 TRAIN_LMHEAD_TILES=8 \
  TRAIN_STEPS=4 python tools_train_8b_qlora.py

# fallback diet if still over: halve the CE chunk (chunk logits 156->78 MB
# fp32; the tile temp is already 148 MB)
if [ ! -s "$ART/qlora8b.json" ]; then
  step qlora8b 5000 env TRAIN_CE_CHUNK=128 TRAIN_LMHEAD_TILES=16 \
    TRAIN_STEPS=4 python tools_train_8b_qlora.py
fi

echo "=== $(date) r4e queue done"
