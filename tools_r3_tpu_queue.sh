#!/usr/bin/env bash
# Round-3 on-chip measurement queue — run when the axon TPU tunnel is back.
# One TPU job at a time (the relay serializes; see .claude/skills/verify).
# Each step appends to /tmp/r3_queue.log; safe to re-run (steps are cheap
# to repeat and the bench tools persist stage state).
set -x
exec >> /tmp/r3_queue.log 2>&1

cd /root/repo

echo "=== $(date) tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== verify drive: fan-out + spec-fanout on the tiny config (real TPU)"
timeout 900 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
import u2tokenizer_tpu as u2
from u2tokenizer_tpu.models.u2_model import U2CausalLM
from u2tokenizer_tpu.models.generate import make_fanout_multimodal_generate_fn
cfg = u2.U2ModelConfig.tiny()
model = U2CausalLM(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
d, h, w = cfg.vision.input_spatial
images = jax.random.normal(rng, (1, cfg.num_chunks, d, h, w))
ids = jnp.zeros((1, 24), jnp.int32); qids = jnp.ones((1, 6), jnp.int32)
params = model.init(rng, ids, images, qids)
gen = u2.GenerationConfig(max_new_tokens=16, eos_token_id=-2,
                          do_sample=True, top_p=0.9)
fan = make_fanout_multimodal_generate_fn(model, gen, 4)
print("fanout:", np.asarray(fan(params, ids, images, qids,
      jnp.array([24], jnp.int32), jax.random.PRNGKey(1))).shape)
EOF

echo "=== predict stage: tiled baseline vs fan-out vs spec+fan-out"
PG_STATE=/tmp/pg_tiled.json PG_FANOUT=0 PG_STAGE=predict timeout 3000 python tools_bench_pred_green.py
PG_STATE=/tmp/pg_fanout.json PG_FANOUT=1 PG_STAGE=predict timeout 3000 python tools_bench_pred_green.py
PG_STATE=/tmp/pg_spec.json PG_FANOUT=1 PG_PRED_SPEC=1 PG_STAGE=predict timeout 3000 python tools_bench_pred_green.py

echo "=== judge stage: per-row prefill vs shared-prefix"
PG_STATE=/tmp/pg_judge0.json PG_JUDGE_SHARE=0 PG_STAGE=judge timeout 3000 python tools_bench_pred_green.py
PG_STATE=/tmp/pg_judge1.json PG_JUDGE_SHARE=1 PG_STAGE=judge timeout 3000 python tools_bench_pred_green.py

echo "=== end-to-end pipeline (best predict mode + shared judge)"
PG_STATE=/tmp/pg_full.json PG_FANOUT=1 PG_JUDGE_SHARE=1 PG_STAGE=predict timeout 4000 python tools_bench_pred_green.py
PG_STATE=/tmp/pg_full.json PG_FANOUT=1 PG_JUDGE_SHARE=1 PG_STAGE=judge timeout 4000 python tools_bench_pred_green.py
PG_STATE=/tmp/pg_full.json PG_STAGE=report python tools_bench_pred_green.py

echo "=== 8B QLoRA SFT proof (int4 frozen base, one 16 GB chip)"
TRAIN_STEPS=4 timeout 5000 python tools_train_8b_qlora.py
TRAIN_CE_CHUNK=256 TRAIN_STEPS=4 timeout 5000 python tools_train_8b_qlora.py || \
  echo "8B QLoRA with chunked CE failed"

echo "=== slot-engine ladder sweep (per-dispatch cost per verify-block size)"
timeout 4000 python tools_bench_slots.py

echo "=== 8B memory diet: B48 all-int4 with vision microbatch 32"
BENCH_MODEL=8b BENCH_BATCH=48 BENCH_WQ=int4 BENCH_KV=int4 BENCH_VMB=32 \
  BENCH_PLAIN_TOO=0 timeout 4000 python bench.py || \
  echo "8B B48 attempt failed (expected if activations still peak)"

echo "=== pallas flash-backward A/B (1.7B SFT step, dense vs pallas bwd)"
TRAIN_STEPS=4 timeout 4000 python tools_train_17b.py
U2_FLASH_BWD=1 TRAIN_STEPS=4 timeout 4000 python tools_train_17b.py || \
  echo "pallas flash bwd failed to compile — keep the gate off"

echo "=== chunked-CE A/B (1.7B SFT step; then push batch with freed memory)"
TRAIN_CE_CHUNK=256 TRAIN_STEPS=4 timeout 4000 python tools_train_17b.py
TRAIN_CE_CHUNK=256 U2_FLASH_BWD=1 TRAIN_B=2 TRAIN_STEPS=4 \
  timeout 4000 python tools_train_17b.py || \
  echo "B=2 with chunked CE + flash bwd does not fit"

echo "=== int4 fused decode kernel A/B (Mosaic int4 validation + speed)"
BENCH_KV=int4 BENCH_PLAIN_TOO=0 timeout 3000 python bench.py
U2_DECODE_KERNEL=1 U2_INT4_DECODE_KERNEL=1 BENCH_KV=int4 \
  BENCH_PLAIN_TOO=0 timeout 3000 python bench.py || \
  echo "int4 pallas kernel failed to compile (Mosaic int4 unsupported?) — keep the gate off"

echo "=== headline bench sanity"
timeout 3000 python bench.py

echo "=== $(date) queue done"
