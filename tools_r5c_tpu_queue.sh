#!/usr/bin/env bash
# Round-5 third queue (waits for tools_r5b_tpu_queue.sh): the 8B decode
# knee (r4 VERDICT next #8). Two tracks:
# 1. diagnosis: per-stage wall clock + XLA memory analysis at the r4
#    configs (B48 vmb32 chunked vs B64) — which stage binds the batch.
# 2. sweep: the int4 weights freed ~3.8 GB vs int8w — try B64 with a
#    bigger vision microbatch and/or unchunked prefill, and B56.
# Done criterion: an 8B row > 179.9 r/min or a recorded dead-end analysis.
set -x
exec >> /tmp/r5c_queue.log 2>&1

cd /root/repo
ART=docs/artifacts/r5
mkdir -p "$ART"

for i in $(seq 1 720); do
  grep -q "r5b queue done" /tmp/r5b_queue.log && break
  sleep 30
done

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

run() { # run <name> <timeout> env...
  local name=$1 to=$2; shift 2
  echo "=== $(date) $name"
  if timeout "$to" env "$@" python tools_probe_8b_memory.py > "/tmp/r5.$name.json"; then
    cp "/tmp/r5.$name.json" "$ART/$name.json"; echo "--- $name OK:"; cat "$ART/$name.json"
  else
    echo "--- $name FAILED rc=$?"
  fi
}

# diagnosis at the r4 sweet spot and the losing B64 config
run probe8b_time_b48 3600 PROBE=time PM_BATCH=48 PM_VMB=32 PM_PREFILL_CHUNK=256
run probe8b_time_b64 3600 PROBE=time PM_BATCH=64 PM_VMB=32 PM_PREFILL_CHUNK=256
run probe8b_mem_b64  3600 PROBE=mem  PM_BATCH=64 PM_VMB=32 PM_PREFILL_CHUNK=256

bench() { # bench <name> <timeout> env...
  local name=$1 to=$2; shift 2
  echo "=== $(date) bench $name"
  if timeout "$to" env BENCH_MODEL=8b BENCH_WQ=int4 BENCH_KV=int4 BENCH_ALT_TOO=0 "$@" \
      python bench.py > "/tmp/r5.$name.json" 2>"/tmp/r5.$name.log"; then
    cp "/tmp/r5.$name.json" "$ART/$name.json"; echo "--- $name OK:"; cat "$ART/$name.json"
  else
    echo "--- $name FAILED rc=$?"; tail -3 "/tmp/r5.$name.log"
  fi
}

# sweep: can the int4-weight headroom lift the B64 overheads?
bench bench_8b_b64_vmb64      3600 BENCH_BATCH=64 BENCH_VMB=64 BENCH_PREFILL_CHUNK=256
bench bench_8b_b64_nochunk    3600 BENCH_BATCH=64 BENCH_VMB=64
bench bench_8b_b56            3600 BENCH_BATCH=56 BENCH_VMB=56 BENCH_PREFILL_CHUNK=256

# headline knee check above B96: the r4 sweep stopped at 96 (+1.9% over
# B64); one more rung tells whether the default batch should move again
echo "=== $(date) 1.7B default-config B112"
if timeout 3600 env BENCH_BATCH=112 BENCH_ALT_TOO=0 \
    python bench.py > /tmp/r5.bench_b112.json 2>/tmp/r5.bench_b112.log; then
  cp /tmp/r5.bench_b112.json "$ART/bench_int8w_b112.json"
  echo "--- b112 OK:"; cat "$ART/bench_int8w_b112.json"
else
  echo "--- b112 FAILED rc=$?"; tail -3 /tmp/r5.bench_b112.log
fi

# real-weights-day dress rehearsal of the headline: bench.py driving the
# CONVERTED checkpoint (emitted by the r5b rehearsal) instead of random
# init — exercises the BENCH_CKPT path end-to-end at 1.7B geometry
echo "=== $(date) bench from converted checkpoint (BENCH_CKPT path)"
if [ -f /tmp/u2_fake_converted/u2_params.msgpack ]; then
  if timeout 3600 env BENCH_CKPT=/tmp/u2_fake_converted BENCH_BATCH=64 BENCH_ALT_TOO=0 \
      python bench.py > /tmp/r5.bench_ckpt.json 2>/tmp/r5.bench_ckpt.log; then
    cp /tmp/r5.bench_ckpt.json "$ART/bench_ckpt_17b.json"
    echo "--- bench_ckpt OK:"; cat "$ART/bench_ckpt_17b.json"
  else
    echo "--- bench_ckpt FAILED rc=$?"; tail -3 /tmp/r5.bench_ckpt.log
  fi
else
  echo "--- skipped: no converted checkpoint on disk"
fi

echo "=== $(date) r5c queue done"
