"""Flagship-scale on-chip DPO proof: one real μ²Qwen3-1.7B stage-2 step.

The reference needs DeepSpeed ZeRO-3 + CPU offload on 4×80 GB A100 to hold
policy + reference for stage-2 DPO (/root/reference/src/train/
dpo_u2trainer.py:29-59, script/amos_mm_stage2.sh). This tool runs the full
DPO step — concatenated chosen/rejected forward, chunked completion
log-probs for BOTH policy and reference (train/dpo.py:213), sigmoid DPO
loss at the reference hyperparameters (β=0.1, lr 4e-6) — on ONE 16 GB TPU
v5e chip at stage-2 geometry: B preference pairs (2B sequences), S=1024
(prompt 256 + completion 768), full 8-chunk (32,256,256) vision path.

Memory design (what replaces ZeRO-3 + offload):
  * the frozen bf16 base (decoder + vision, ~3.6 GB) is SHARED between
    policy and reference — the policy is base + LoRA adapters + trainable
    μ²tokenizer/projector, the reference is base + the initial (frozen
    bf16) μ²tokenizer/projector with no adapters. Zero duplicated decoder
    memory, no second process, no offload.
  * chunked completion stats (ce_chunk): neither forward materializes the
    (2B, S, 152k) logits tensor — the dominant stage-2 activation.
  * decoder remat bounds the policy-backward activations.
  * LoRA on the decoder linears + fully-trainable μ²tokenizer/projector
    (same documented deviation as tools_train_17b.py: full-rank decoder
    fp32 + Adam state does not fit one chip; a multi-chip mesh shards it).

Prints one JSON line: s/step, memory budget, reward/margin telemetry.
Run on the real chip (no JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.traverse_util import flatten_dict, unflatten_dict

from u2tokenizer_tpu.config import DPOConfig, U2ModelConfig
from u2tokenizer_tpu.models.u2_model import U2CausalLM
from u2tokenizer_tpu.train.dpo import make_dpo_loss_fn
from u2tokenizer_tpu.train.lora import (LoraConfig, apply_lora,
                                        init_lora_params)

B = int(os.environ.get("TRAIN_B", "1"))  # preference PAIRS (2B sequences)
PROMPT = int(os.environ.get("DPO_PROMPT", "256"))
COMP = int(os.environ.get("DPO_COMP", "768"))
N_STEPS = int(os.environ.get("TRAIN_STEPS", "4"))
CE_CHUNK = int(os.environ.get("TRAIN_CE_CHUNK", "256"))  # 0 = full logits
TINY = os.environ.get("TRAIN_TINY", "0") == "1"  # CPU smoke config


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def trainable_path(path: str) -> bool:
    return "u2tokenizer" in path or "mm_projector" in path


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    cfg = U2ModelConfig.tiny() if TINY else U2ModelConfig()  # μ²Qwen3-1.7B
    model = U2CausalLM(cfg, dtype=jnp.bfloat16, remat=True)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    S = PROMPT + COMP

    # synthetic stage-2 batch at real geometry: (2B, S) concatenated
    # chosen/rejected rows, completion mask over the completion tail
    # (collate_preference_batch layout, train/dpo.py:35-83)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2 * B, S), 0,
                             cfg.llm.vocab_size).astype(jnp.int32)
    attention_mask = jnp.ones((2 * B, S), jnp.int32)
    comp_mask = jnp.zeros((2 * B, S), jnp.float32).at[:, PROMPT:].set(1.0)
    images = jax.random.normal(rng, (B, cfg.num_chunks, d, h, w),
                               jnp.bfloat16)
    question_ids = jnp.ones((B, 64), jnp.int32)
    batch = {"input_ids": ids, "attention_mask": attention_mask,
             "completion_mask": comp_mask, "images": images,
             "question_ids": question_ids}

    log("init: materializing 1.7B params (bf16 frozen / fp32 trainable)")
    t0 = time.time()

    def init_fn(r):
        params = model.init(r, ids[:1], images[:1], question_ids[:1],
                            attention_mask=attention_mask[:1])
        flat = flatten_dict(params, sep="/")
        train_flat, frozen_flat, ref_train_flat = {}, {}, {}
        for key, val in flat.items():
            if trainable_path(key):
                train_flat[key] = val.astype(jnp.float32)
                # the reference keeps the INITIAL μ²tok/projector, frozen
                ref_train_flat[key] = (val.astype(jnp.bfloat16)
                                       if val.ndim >= 2 else val)
            else:
                frozen_flat[key] = (val.astype(jnp.bfloat16)
                                    if val.ndim >= 2 else val)
        return train_flat, frozen_flat, ref_train_flat

    train_flat, frozen_flat, ref_train_flat = jax.jit(init_fn)(rng)
    np.asarray(next(iter(train_flat.values())))  # fence
    log(f"init done in {time.time() - t0:.1f}s")

    lcfg = LoraConfig(r=16, alpha=32)
    lora = init_lora_params(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            unflatten_dict(frozen_flat, sep="/")),
        lcfg, jax.random.PRNGKey(2))
    lora = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                  lora)

    n_train = sum(int(x.size) for x in train_flat.values())
    n_lora = sum(int(x.size) for x in jax.tree_util.tree_leaves(lora))
    n_frozen = sum(int(x.size) for x in frozen_flat.values())
    log(f"params: trainable {n_train / 1e6:.1f}M + lora {n_lora / 1e6:.1f}M,"
        f" frozen-shared {n_frozen / 1e9:.2f}B "
        f"+ ref μ²tok/projector copy {n_train * 2 / 1e9:.2f} GB bf16")

    dcfg = DPOConfig(beta=0.1, learning_rate=4e-6, ce_chunk=CE_CHUNK)
    dpo_loss_fn = make_dpo_loss_fn(model, dcfg)
    schedule = optax.warmup_cosine_decay_schedule(0.0, dcfg.learning_rate,
                                                  10, 1000)
    tx = optax.multi_transform(
        {"lora": optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                             weight_decay=0.0),
         "train": optax.adafactor(schedule, min_dim_size_to_factor=128)},
        {"lora": "lora", "train": "train"})

    def loss_fn(wparams, frozen_flat, ref_train_flat, batch):
        merged = dict(frozen_flat)
        merged.update(wparams["train"])
        policy = apply_lora(unflatten_dict(merged, sep="/"),
                            wparams["lora"], lcfg)
        ref_merged = dict(frozen_flat)
        ref_merged.update(ref_train_flat)
        ref = unflatten_dict(ref_merged, sep="/")
        return dpo_loss_fn(policy, ref, batch)

    wparams = {"train": train_flat, "lora": lora}
    opt_state = tx.init(wparams)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(wparams, opt_state, frozen_flat, ref_train_flat, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            wparams, frozen_flat, ref_train_flat, batch)
        updates, opt_state = tx.update(grads, opt_state, wparams)
        wparams = optax.apply_updates(wparams, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return wparams, opt_state, metrics

    log(f"compiling the 1.7B DPO step (policy fwd+bwd + ref fwd, "
        f"2x{B} rows, S={S}, ce_chunk={CE_CHUNK})")
    t0 = time.time()
    wparams, opt_state, metrics = train_step(wparams, opt_state,
                                             frozen_flat, ref_train_flat,
                                             batch)
    l0 = float(np.asarray(metrics["loss"]))
    log(f"first step (compile+run) {time.time() - t0:.1f}s, loss {l0:.4f}")

    times, losses, margins = [], [l0], []
    for i in range(N_STEPS):
        t0 = time.time()
        wparams, opt_state, metrics = train_step(
            wparams, opt_state, frozen_flat, ref_train_flat, batch)
        l = float(np.asarray(metrics["loss"]))  # fence
        times.append(time.time() - t0)
        losses.append(l)
        margins.append(float(np.asarray(metrics["rewards_margin"])))
        log(f"step {i + 1}: {times[-1]:.2f}s loss {l:.4f} "
            f"margin {margins[-1]:.4f} "
            f"grad_norm {float(np.asarray(metrics['grad_norm'])):.3f}")

    s_step = float(np.median(times))
    # FLOPs ledger: decoder 2·N·T over 2B·S tokens — policy fwd+bwd (3x)
    # + ref fwd (1x); vision fwd over 2B rows × 8 chunks × 2049 tokens per
    # model (ref recomputes its own vision pass); μ²tok+TTA small.
    n_dec, n_vit = 1.7e9, 90e6
    dec_fwd = 2 * n_dec * 2 * B * S
    vit_fwd = 2 * n_vit * 2 * B * cfg.num_chunks * 2049
    useful = dec_fwd * 4 + vit_fwd * 2 + 2 * 360e6 * 2 * B * 2048 * 4
    mfu = useful / s_step / 197e12

    print(json.dumps({
        "metric": "1.7b_dpo_seconds_per_step",
        "value": round(s_step, 3),
        "unit": "s/step",
        "detail": {
            "model": "u2-qwen3-1.7b policy (LoRA r16 + trainable "
                     "u2tok/projector) + frozen ref sharing the bf16 base",
            "pairs": B, "rows": 2 * B, "seq_len": S,
            "prompt_len": PROMPT, "completion_len": COMP,
            "vision": f"{cfg.num_chunks}x{(d, h, w)} per row, both models",
            "ce_chunk": CE_CHUNK,
            "pairs_per_hour": round(B * 3600.0 / s_step, 1),
            "mfu_estimate": round(mfu, 4),
            "loss_first": round(losses[0], 4),
            "loss_last": round(losses[-1], 4),
            "rewards_margin_last": round(margins[-1], 5),
            "trainable_params_m": round((n_train + n_lora) / 1e6, 1),
            "frozen_params_b": round(n_frozen / 1e9, 3),
            "hyperparams": "sigmoid DPO beta=0.1, AdamW lr 4e-6 cosine, "
                           "bf16, remat (amos_mm_stage2.sh parity)",
        },
    }))


if __name__ == "__main__":
    main()
