#!/usr/bin/env bash
# Round-4 fourth queue: the end-to-end train-loop proof with the
# constants-capture fix (frozen params as a runtime arg — the closure
# capture shipped 3.6 GB through the axon remote-compile tunnel and broke
# the pipe twice in r4b). Waits for r4c.
set -x
exec >> /tmp/r4d_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r4
mkdir -p "$ART"

for i in $(seq 1 480); do
  grep -q "r4c queue done" /tmp/r4c_queue.log && break
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

# 1. kill-at-20 phase: run to step 20, simulated preemption (os._exit 17)
echo "=== $(date) train_loop kill phase"
rm -rf /tmp/u2_train_loop
timeout 7200 env KILL_AT=20 STEPS=60 python tools_train_loop_17b.py \
  || echo "train_loop kill phase exited rc=$? (17 = scripted kill)"
# 2. resume from the step-20 checkpoint and finish 60 steps
step train_loop 7200 env KILL_AT=0 STEPS=60 python tools_train_loop_17b.py

echo "=== $(date) r4d queue done"
