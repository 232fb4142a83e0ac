#!/usr/bin/env bash
# Round-5 sixth queue (waits for r5f): the 8B stage diagnosis redone at
# the configurations that matter after the r5c/r5d findings.
# - the r5d probes at the MITIGATIONS config (vmb32 + chunked prefill +
#   staged decode) failed: staged-path prefill OOMs at B48 and the whole
#   program at B64 won't even compile via the relay — while the bench's
#   fused UNCHUNKED vmb64 program runs at 184.4 r/min. So probe the
#   fused shipping config for the memory map, and the staged relay path
#   at a smaller batch for the real-weights runbook.
set -x
exec >> /tmp/r5g_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

for i in $(seq 1 960); do
  grep -q "r5f queue done" /tmp/r5f_queue.log 2>/dev/null && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

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
# memory map of the shipping 8B config (fused, unchunked, vmb64, B64)
probe probe8b_mem_b64_ship  3600 PROBE=mem  PM_BATCH=64 PM_VMB=64 PM_PREFILL_CHUNK=0 PM_DECODE_CHUNK=0
# per-stage wall clock of the same (fused decode path)
probe probe8b_time_b64_ship 3600 PROBE=time PM_BATCH=64 PM_VMB=64 PM_PREFILL_CHUNK=0 PM_DECODE_CHUNK=0
# the staged relay path's actual capacity: B32 with the chunk mitigations
probe probe8b_time_b32_relay 3600 PROBE=time PM_BATCH=32 PM_VMB=32 PM_PREFILL_CHUNK=256 PM_DECODE_CHUNK=256

echo "=== $(date) r5g queue done"
