#!/usr/bin/env bash
# Round-4 seventh queue: the 8B QLoRA on-chip proof, unblocked by the
# jax.checkpoint fix on the vocab-tiled lm_head (the scan-transposed
# backward no longer stacks dequantized tiles — see decoder.QDense).
# Primary run is the plain CE path (tiled head bounds the dequant temp);
# if that OOMs, the chunked-CE fallback also avoids the (B,S,152k) fp32
# logits. If BOTH fit, the second run records the A/B.
set -x
exec >> /tmp/r4g_queue.log 2>&1

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

# 8B int4-base QLoRA, stage-1 geometry (B1 S1024, full vision), 6 timed
# steps. Init streams float->int inside one jit; budget ~40 min for
# init + compile + steps.
step train_8b_qlora 3600 env TRAIN_STEPS=6 python tools_train_8b_qlora.py

# Chunked-CE variant: A/B if the first fit, rescue if it OOMed.
step train_8b_qlora_cechunk 3600 env TRAIN_STEPS=6 TRAIN_CE_CHUNK=256 \
  python tools_train_8b_qlora.py

echo "=== $(date) r4g queue done"
