"""8B flagship SFT on ONE 16 GB chip via QLoRA (quantized base + adapters).

The reference trains μ²Qwen3-8B stage 1 on 4x80 GB A100
(/root/reference/README.md:63, script/amos_mm_stage1/amos_mm_mu2_stage1.sh).
This tool runs the same stage-1 geometry (B=1, S=1024, full 8-chunk
(32,256,256) vision path, reference hyperparameters AdamW lr 4e-6) on a
single TPU v5e 16 GB chip:

  * decoder base weights stored weight-only quantized (TRAIN_QUANT=int4
    default — the classic QLoRA recipe, ~4.6 GB for 8.2B params — or int8)
    and FROZEN: integer kernels take no grads and no optimizer state;
  * fp32 LoRA adapters (r=16, α=32) on every decoder linear via the
    decoder.QDense lora branch (config.LLMConfig.lora_rank) — the
    merged-kernel LoRA path cannot fold adapters into integer kernels;
  * μ²tokenizer + projector fully trainable (train_stage1.py:355-359) in
    bf16 with adafactor (factored second moments) — at hidden 4096 this
    subset is ~1.4 B params, so fp32+Adam would not fit;
  * vision tower frozen bf16 (--freeze-vision-tower), backward dead code;
  * full-recompute remat bounds activations at S=1024;
  * embed_tokens / lm_head frozen AND quantized (documented deviation —
    the +4 new-token rows train only on the float LoRA / multi-chip paths).

Prints one JSON line: s/step, tokens/s, MFU estimate, memory budget.
Run on the real chip (no JAX_PLATFORMS=cpu). TRAIN_TINY=1 smoke-runs the
tiny config on CPU to validate the wiring.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from u2tokenizer_tpu.config import LLMConfig, U2ModelConfig
from u2tokenizer_tpu.models.quantize import quantize_llm_weights
from u2tokenizer_tpu.models.u2_model import U2CausalLM
from u2tokenizer_tpu.train.lora import (init_qlora_from_quantized,
                                        make_qlora_train_step, qlora_config,
                                        qlora_partition)
from u2tokenizer_tpu.train.sft import IGNORE_INDEX, cross_entropy_loss

B = int(os.environ.get("TRAIN_B", "1"))
S = int(os.environ.get("TRAIN_S", "1024"))
N_STEPS = int(os.environ.get("TRAIN_STEPS", "4"))
QUANT = os.environ.get("TRAIN_QUANT", "int4")  # int4 | int8
TINY = os.environ.get("TRAIN_TINY", "0") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    if TINY or os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize pins jax to the TPU plugin regardless of
        # env vars; the config override actually lands (tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if TINY:
        cfg = U2ModelConfig.tiny()
        s = 32
    else:
        # lm_head_tiles: the untied int8 8B head dequantizes to a 1.16 GB
        # bf16 temp in the CE matmul — tiling it 8-way was the difference
        # between OOM (16.97/15.75 GB) and fitting (see decoder.QDense).
        llm = dataclasses.replace(
            LLMConfig.qwen3_8b(),
            lm_head_tiles=int(os.environ.get("TRAIN_LMHEAD_TILES", "8")))
        cfg = dataclasses.replace(U2ModelConfig(), llm=llm)
        s = S
    qcfg = qlora_config(cfg, rank=16, alpha=32.0, mode=QUANT)
    model = U2CausalLM(qcfg, dtype=jnp.bfloat16, remat=True)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial

    images = jax.random.normal(rng, (B, cfg.num_chunks, d, h, w),
                               jnp.bfloat16)
    input_ids = jnp.zeros((B, s), jnp.int32)
    question_ids = jnp.ones((B, 64), jnp.int32)
    attention_mask = jnp.ones((B, s), jnp.int32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (B, s), 0,
                                cfg.llm.vocab_size)
    labels = labels.at[:, : 1 + cfg.proj_out_num].set(IGNORE_INDEX)
    batch = {"input_ids": input_ids, "images": images,
             "question_ids": question_ids, "attention_mask": attention_mask,
             "labels": labels}

    log(f"init: materializing 8B {QUANT} base + adapters (never holds the "
        "float 8B tree: init streams through quantization inside one jit)")
    t0 = time.time()

    def init_fn(r):
        # The float init and its quantization run inside ONE jit so XLA
        # frees each float kernel right after its int counterpart is
        # computed — peak stays ~(int base + largest single float kernel),
        # not (full float tree + int tree).
        float_model = U2CausalLM(cfg, dtype=jnp.bfloat16)
        fparams = float_model.init(r, input_ids, images, question_ids,
                                   attention_mask=attention_mask)
        qparams = quantize_llm_weights(fparams, QUANT)
        lparams = init_qlora_from_quantized(
            model, jax.random.fold_in(r, 1), qparams, input_ids, images,
            question_ids, attention_mask=attention_mask)
        train_flat, frozen_flat = qlora_partition(lparams)
        # full-rank multimodal subset trains in bf16 (see module docstring)
        train_flat = {k: (v if k.endswith(("/lora_a", "/lora_b"))
                          else v.astype(jnp.bfloat16))
                      for k, v in train_flat.items()}
        return train_flat, frozen_flat

    train_flat, frozen_flat = jax.jit(init_fn)(rng)
    np.asarray(next(iter(train_flat.values())))  # fence
    log(f"init done in {time.time() - t0:.1f}s")

    n_lora = sum(int(v.size) for k, v in train_flat.items()
                 if k.endswith(("/lora_a", "/lora_b")))
    n_full = sum(int(v.size) for k, v in train_flat.items()
                 if not k.endswith(("/lora_a", "/lora_b")))
    frozen_bytes = sum(int(v.size * v.dtype.itemsize)
                       for v in frozen_flat.values())
    log(f"params: lora {n_lora / 1e6:.1f}M fp32 + full-rank "
        f"{n_full / 1e6:.1f}M bf16 trainable; frozen {QUANT} base "
        f"{frozen_bytes / 1e9:.2f} GB")

    schedule = optax.warmup_cosine_decay_schedule(0.0, 4e-6, 10, 1000)
    tx = optax.multi_transform(
        {"lora": optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=0.0),
         "full": optax.adafactor(schedule, min_dim_size_to_factor=128)},
        lambda tree: {k: ("lora" if k.endswith(("/lora_a", "/lora_b"))
                          else "full") for k in tree})

    ce_chunk = int(os.environ.get("TRAIN_CE_CHUNK", "0"))

    def loss_fn(params, b):
        if ce_chunk:  # never materialize the (B, S, 152k) logits
            from u2tokenizer_tpu.train.sft import chunked_lm_loss

            return chunked_lm_loss(model, params, b, ce_chunk)
        logits, _, _ = model.apply(
            params, b["input_ids"], b["images"], b["question_ids"],
            attention_mask=b["attention_mask"])
        return cross_entropy_loss(logits, b["labels"])

    step_fn = make_qlora_train_step(tx, loss_fn)
    opt_state = tx.init(train_flat)
    train_step = jax.jit(step_fn, donate_argnums=(0, 1))

    log(f"compiling the 8B {QUANT}-base QLoRA train step")
    t0 = time.time()
    train_flat, opt_state, loss, acc, gn = train_step(
        train_flat, opt_state, frozen_flat, batch)
    l0 = float(np.asarray(loss))
    log(f"first step (compile+run) {time.time() - t0:.1f}s, loss {l0:.4f}")

    times, losses = [], [l0]
    for i in range(N_STEPS):
        t0 = time.time()
        train_flat, opt_state, loss, acc, gn = train_step(
            train_flat, opt_state, frozen_flat, batch)
        l = float(np.asarray(loss))  # fence (axon: fetch, not block)
        times.append(time.time() - t0)
        losses.append(l)
        log(f"step {i + 1}: {times[-1]:.2f}s loss {l:.4f} "
            f"grad_norm {float(np.asarray(gn)):.3f}")

    s_step = float(np.median(times))
    tokens_per_s = B * s / s_step

    # FLOPs ledger (same conventions as tools_train_17b.py): useful =
    # decoder fwd + bwd-dX (no base dW) ~= 3x fwd over S tokens + frozen
    # vision fwd + full-rank μ²tok fwd+bwd; hardware adds the remat
    # recompute pass (~1x fwd).
    n_dec = 8.2e9 if not TINY else 1e6
    vit_flops = 2 * 90e6 * B * cfg.num_chunks * 2049 if not TINY else 0
    u2_flops = 2 * n_full * B * 2048 * 3
    useful = 2 * n_dec * B * s * 3 + vit_flops + u2_flops
    mfu = useful / s_step / 197e12
    result = {
        "metric": "8b_qlora_sft_step",
        "value": round(s_step, 3), "unit": "s/step",
        "detail": {
            "quant": QUANT, "batch": B, "seq": s,
            "tokens_per_s": round(tokens_per_s, 1),
            "mfu_estimate": round(mfu, 3),
            "loss_first": round(losses[0], 4),
            "loss_last": round(losses[-1], 4),
            "lora_params_m": round(n_lora / 1e6, 1),
            "full_rank_params_m": round(n_full / 1e6, 1),
            "frozen_base_gb": round(frozen_bytes / 1e9, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
