"""8B QLoRA end-to-end train-loop proof: a short on-chip curve with a
mid-run kill and auto-resume (r4 VERDICT next #7 — the 1.7B standard
applied to the 8B config, whose r4 evidence was 6 steps on a fixed batch).

Same machinery as tools_train_loop_17b.py (synthetic-report dataset on
disk → real FusedDataset/U2Transform ingest → threaded DataLoader →
device_prefetch → run_training with MetricLogger + orbax CheckpointManager
auto-resume), but the model/memory design is the 8B single-chip QLoRA
recipe from tools_train_8b_qlora.py: int4/int8 frozen decoder base, fp32
LoRA adapters (r=16, α=32) on every decoder linear, μ²tokenizer +
projector fully trainable in bf16 with adafactor, full remat, chunked CE.
Reference anchor: stage-1 8B needed 4×80 GB A100
(/root/reference/README.md:63); this runs the loop on ONE 16 GB chip.

Protocol (two invocations, same RUN_DIR):
  1. KILL_AT=15 STEPS=24 python tools_train_loop_8b.py
     → trains from scratch, hard-kills itself right after logging step 15
       (after the step-8 checkpoint, before step 16).
  2. KILL_AT=0 STEPS=24 python tools_train_loop_8b.py
     → auto-resumes from step 8, finishes 24 steps, writes
       docs/artifacts/r5/train_loop_8b_loss.png + metrics jsonl and prints
       one JSON line with resume evidence.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from functools import partial

import numpy as np

RUN_DIR = os.environ.get("RUN_DIR", "/tmp/u2_train_loop_8b")
STEPS = int(os.environ.get("STEPS", "24"))
KILL_AT = int(os.environ.get("KILL_AT", "0"))
SAVE_STEPS = int(os.environ.get("SAVE_STEPS", "8"))
B = int(os.environ.get("TRAIN_B", "1"))
S = int(os.environ.get("TRAIN_S", "1024"))
QUANT = os.environ.get("TRAIN_QUANT", "int4")
N_VOLUMES = int(os.environ.get("N_VOLUMES", "12"))
N_SAMPLES = int(os.environ.get("N_SAMPLES", "64"))
TINY = os.environ.get("TRAIN_TINY", "0") == "1"  # CPU smoke config
ART_DIR = os.environ.get("ART_DIR", "docs/artifacts/r5")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    if TINY or os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from u2tokenizer_tpu.config import LLMConfig, TrainConfig, U2ModelConfig
    from u2tokenizer_tpu.data.datasets import DataLoader, FusedDataset
    from u2tokenizer_tpu.models.quantize import quantize_llm_weights
    from u2tokenizer_tpu.models.u2_model import U2CausalLM
    from u2tokenizer_tpu.train.checkpoint import CheckpointManager
    from u2tokenizer_tpu.train.loop import MetricLogger, run_training
    from u2tokenizer_tpu.train.lora import (init_qlora_from_quantized,
                                            make_qlora_train_step,
                                            qlora_config, qlora_partition)
    from u2tokenizer_tpu.train.sft import (IGNORE_INDEX, TrainState,
                                           chunked_lm_loss,
                                           cross_entropy_loss)
    from u2tokenizer_tpu.utils.mock_tokenizer import MockTokenizer

    # dataset generation is shared with the 1.7B loop proof
    import tools_train_loop_17b as t17

    t17.RUN_DIR, t17.TINY = RUN_DIR, TINY
    t17.N_VOLUMES, t17.N_SAMPLES = N_VOLUMES, N_SAMPLES
    base = t17.prepare_dataset()

    if TINY:
        cfg = U2ModelConfig.tiny()
        s, ce_chunk = 32, 0
    else:
        llm = dataclasses.replace(
            LLMConfig.qwen3_8b(),
            lm_head_tiles=int(os.environ.get("TRAIN_LMHEAD_TILES", "8")))
        cfg = dataclasses.replace(U2ModelConfig(), llm=llm)
        s, ce_chunk = S, 512
    qcfg = qlora_config(cfg, rank=16, alpha=32.0, mode=QUANT)
    model = U2CausalLM(qcfg, dtype=jnp.bfloat16, remat=True)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    qn = 64

    tok = MockTokenizer()
    for line in open(os.path.join(base, "train.jsonl")):
        ann = json.loads(line)
        tok(ann["question"])
        tok(ann["answer"])
    ds = FusedDataset(base, "train.jsonl", tok, max_length=s,
                      image_tokens_num=cfg.proj_out_num,
                      data_type="training", num_chunks=cfg.num_chunks,
                      chunk_depth=d, target_size=h, seed=0)
    loader = DataLoader(ds, batch_size=B, shuffle=True, seed=0,
                        num_workers=2)

    def data_iter(epoch):
        for batch in loader:
            batch["question_ids"] = batch["question_ids"][:, :qn]
            batch["images"] = batch["images"].astype(np.float32)
            yield batch

    # probe for a resume point BEFORE materializing: on resume only the
    # frozen base is materialized and the trainables/opt state restore into
    # fresh buffers via an abstract template — materializing them first and
    # then restoring a second copy OOMed the 16 GB chip (r5b queue log)
    ckpt_dir = os.path.join(RUN_DIR, "out", "checkpoints")
    pre = CheckpointManager(ckpt_dir, save_interval_steps=SAVE_STEPS)
    resumed_from = pre.latest_step()
    pre.close()

    log(f"init: materializing 8B {QUANT} base + adapters (single-jit "
        "streaming quantization, tools_train_8b_qlora.py)"
        + (f"; resuming from step {resumed_from} — trainables stay "
           "abstract" if resumed_from is not None else ""))
    t0 = time.time()
    input_ids0 = jnp.zeros((B, s), jnp.int32)
    images0 = jnp.zeros((B, cfg.num_chunks, d, h, w), jnp.bfloat16)
    qids0 = jnp.ones((B, qn), jnp.int32)

    def init_fn(r):
        float_model = U2CausalLM(cfg, dtype=jnp.bfloat16)
        fparams = float_model.init(r, input_ids0, images0, qids0)
        qparams = quantize_llm_weights(fparams, QUANT)
        lparams = init_qlora_from_quantized(
            model, jax.random.fold_in(r, 1), qparams, input_ids0, images0,
            qids0)
        train_flat, frozen_flat = qlora_partition(lparams)
        train_flat = {k: (v if k.endswith(("/lora_a", "/lora_b"))
                          else v.astype(jnp.bfloat16))
                      for k, v in train_flat.items()}
        return train_flat, frozen_flat

    if resumed_from is not None:
        abs_train, _ = jax.eval_shape(init_fn, rng)
        frozen_flat = jax.jit(lambda r: init_fn(r)[1])(rng)
        np.asarray(next(iter(frozen_flat.values())))  # fence
        shd = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        train_flat = jax.tree_util.tree_map(
            lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=shd),
            abs_train)
    else:
        train_flat, frozen_flat = jax.jit(init_fn)(rng)
        np.asarray(next(iter(train_flat.values())))  # fence
    log(f"init done in {time.time() - t0:.1f}s")

    schedule = optax.warmup_cosine_decay_schedule(0.0, 1e-4, 5,
                                                  max(STEPS, 20))
    tx = optax.multi_transform(
        {"lora": optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=0.0),
         "full": optax.adafactor(schedule, min_dim_size_to_factor=128)},
        lambda tree: {k: ("lora" if k.endswith(("/lora_a", "/lora_b"))
                          else "full") for k in tree})

    def loss_fn(params, b):
        if ce_chunk:
            return chunked_lm_loss(model, params, b, ce_chunk)
        logits, _, _ = model.apply(
            params, b["input_ids"], b["images"], b["question_ids"],
            attention_mask=b["attention_mask"])
        return cross_entropy_loss(logits, b["labels"])

    step_fn = make_qlora_train_step(tx, loss_fn)
    jitted = jax.jit(step_fn, donate_argnums=(0, 1))

    def train_step(state, batch):
        tf, opt, loss, acc, gn = jitted(state.params, state.opt_state,
                                        frozen_flat, batch)
        return (TrainState(step=state.step + 1, params=tf, opt_state=opt),
                {"loss": loss, "token_accuracy": acc, "grad_norm": gn})

    if resumed_from is not None:
        opt_state = jax.tree_util.tree_map(
            lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=shd),
            jax.eval_shape(tx.init, train_flat))
    else:
        opt_state = tx.init(train_flat)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=train_flat,
                       opt_state=opt_state)

    tcfg = TrainConfig(learning_rate=1e-4, warmup_ratio=0.1,
                       lr_schedule="cosine",
                       output_dir=os.path.join(RUN_DIR, "out"),
                       save_steps=SAVE_STEPS, log_steps=1, max_steps=STEPS)

    class KillingLogger(MetricLogger):
        """Hard-kill (preemption simulation) right after logging KILL_AT."""

        def log(self, step, metrics):
            super().log(step, metrics)
            if KILL_AT and step >= KILL_AT:
                log(f"KILL_AT={KILL_AT}: simulating preemption (os._exit)")
                os._exit(17)

    logger = KillingLogger(tcfg.output_dir)
    t0 = time.time()
    state = run_training(tcfg, state, train_step, data_iter,
                         steps_per_epoch=len(loader), logger=logger)
    wall = time.time() - t0
    final_step = int(np.asarray(state.step))

    metrics_path = os.path.join(tcfg.output_dir, "metrics.jsonl")
    curve, replayed, png = t17.summarize_metrics(
        metrics_path, ART_DIR, "train_loop_8b",
        f"8B QLoRA ({QUANT} base) SFT over the "
        "synthetic-report dataset (real loop, one chip)", resumed_from)

    losses = [r["loss"] for r in curve]
    gns = [r["grad_norm"] for r in curve
           if r.get("grad_norm") is not None]
    print(json.dumps({
        "metric": "train_loop_8b_steps",
        "value": final_step,
        "unit": "steps",
        "detail": {
            "model": ("tiny" if TINY else "u2-qwen3-8b") +
                     f" QLoRA r16 ({QUANT} frozen base)",
            "batch": B, "seq_len": s, "ce_chunk": ce_chunk,
            "dataset": f"{N_SAMPLES} jsonl rows over {N_VOLUMES} NIfTI "
                       "volumes, real FusedDataset+DataLoader(2 workers)"
                       "+device_prefetch",
            "resumed_from_step": resumed_from,
            "replayed_steps": replayed or None,
            "kill_at": KILL_AT or None,
            "wall_s_this_run": round(wall, 1),
            "loss_first": round(losses[0], 4),
            "loss_last": round(losses[-1], 4),
            "grad_norm_last": round(gns[-1], 3) if gns else None,
            "checkpoints": sorted(
                int(p) for p in os.listdir(ckpt_dir)
                if p.isdigit()) if os.path.isdir(ckpt_dir) else [],
            "loss_curve": png,
        },
    }))


if __name__ == "__main__":
    main()
