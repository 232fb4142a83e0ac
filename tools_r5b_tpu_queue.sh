#!/usr/bin/env bash
# Round-5 second queue (waits for tools_r5_tpu_queue.sh): the remaining
# r4 VERDICT measurement items that need the chip and/or the host.
# - real-weights rehearsal re-run with the NEW stages: quant-quality gate
#   (go/no-go thresholds applied, flagged non-decision-grade on the fake
#   checkpoint) + the int4-weight serve leg (next #5).
# - 8B QLoRA train-loop proof: 24 steps over the synthetic-report dataset
#   through the real loop, mid-run kill + auto-resume, curve artifact
#   (next #7).
set -x
exec >> /tmp/r5b_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r5 queue done" /tmp/r5_queue.log && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== $(date) real-weights rehearsal (with quant gate + int4w leg)"
ART=$ART bash tools_rehearse_real_weights.sh || echo "--- rehearsal FAILED rc=$?"

echo "=== $(date) 8B QLoRA train-loop proof: kill leg"
KILL_AT=15 STEPS=24 SAVE_STEPS=8 RUN_DIR=/tmp/u2_train_loop_8b ART_DIR=$ART \
  timeout 7200 python tools_train_loop_8b.py > /tmp/r5.tl8b_kill.json
echo "--- kill leg rc=$? (17*256 -> os._exit(17) is the expected path)"

echo "=== $(date) 8B QLoRA train-loop proof: resume leg"
if KILL_AT=0 STEPS=24 SAVE_STEPS=8 RUN_DIR=/tmp/u2_train_loop_8b ART_DIR=$ART \
    timeout 7200 python tools_train_loop_8b.py > /tmp/r5.tl8b.json; then
  cp /tmp/r5.tl8b.json "$ART/train_loop_8b.json"
  echo "--- 8B train loop OK:"; cat "$ART/train_loop_8b.json"
else
  echo "--- 8B train loop FAILED rc=$?"
fi

echo "=== $(date) r5b queue done"
