"""Autoregressive generation: embeds-seeded prefill + KV-cache decode.

Replaces HF GenerationMixin for the μ² inference path
(reference call stack SURVEY.md §3.3: u2*ForCausalLM.generate precomputes
inputs_embeds from the vision stack, then decodes token-by-token with a KV
cache — green_refactored/lu2_model.py:52-66).

TPU design: one jitted prefill over the (static-length, right-padded) prompt
followed by a jitted lax.scan over max_new_tokens. Per-row prompt lengths are
handled with masks: decode token i lives at cache slot S+i for every row, its
RoPE position is the row's true prompt_len+i, and attention masks out the
[prompt_len, S) pad gap. Early-stopped rows keep emitting pad_token_id.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import GenerationConfig, U2ModelConfig
from ..ops.sampling import sample
from .llm.decoder import KVCache
from .u2_model import U2CausalLM, causal_padding_mask


def make_generate_fn(
    model,
    gen: GenerationConfig,
    cache_dtype=jnp.bfloat16,
) -> Callable:
    """Build a jittable generate(params, inputs_embeds, prompt_len, rng).

    ``model`` is any module exposing forward_embeds/embed_tokens/decode_step
    (U2CausalLM or a bare CausalLM, e.g. a GREEN judge).

    Args:
      inputs_embeds: (B, S, E) right-padded prompt embeddings.
      prompt_len: (B,) int32 true prompt lengths (<= S).
      rng: PRNG key (unused when not sampling, but required positionally).

    Returns:
      (B, max_new_tokens) int32 generated ids, pad-filled after EOS.
    """
    llm_cfg = model.cfg.llm if hasattr(model.cfg, "llm") else model.cfg

    def generate(params, inputs_embeds, prompt_len, rng):
        b, s, _ = inputs_embeds.shape
        total = s + gen.max_new_tokens
        cache = KVCache.create(llm_cfg, b, total, cache_dtype)

        # --- prefill ---
        att = (jnp.arange(s)[None, :] < prompt_len[:, None]).astype(jnp.int32)
        mask = causal_padding_mask(att)
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        _, hidden, cache = model.apply(
            params, inputs_embeds, attention_mask=None, cache=cache,
            write_index=jnp.int32(0), positions=positions, mask=mask,
            lens=prompt_len.astype(jnp.int32), compute_logits=False,
            method="forward_embeds")
        last_hidden = jnp.take_along_axis(
            hidden, (prompt_len - 1)[:, None, None], axis=1)  # (B, 1, E)
        last = model.apply(params, last_hidden, method="lm_logits")[:, 0]
        rng, sub = jax.random.split(rng)
        tok0 = sample(sub, last, do_sample=gen.do_sample,
                      temperature=gen.temperature, top_p=gen.top_p)
        done0 = tok0 == gen.eos_token_id

        kv_pos = jnp.arange(total, dtype=jnp.int32)

        def step(carry, i):
            cache, tok, done, rng = carry
            rng, sub = jax.random.split(rng)
            emb = model.apply(params, tok[:, None],
                              method="embed_tokens")
            pos = (prompt_len + i)[:, None].astype(jnp.int32)
            key_ok = (kv_pos[None, :] < prompt_len[:, None]) | (
                (kv_pos[None, :] >= s) & (kv_pos[None, :] <= s + i))
            mask = key_ok[:, None, None, :]
            logits, _, cache = model.apply(
                params, emb, pos, mask, cache, jnp.int32(s) + i,
                method="decode_step")
            nxt = sample(sub, logits[:, 0], do_sample=gen.do_sample,
                         temperature=gen.temperature, top_p=gen.top_p)
            nxt = jnp.where(done, jnp.int32(gen.pad_token_id), nxt)
            done = done | (nxt == gen.eos_token_id)
            return (cache, nxt, done, rng), nxt

        (cache, _, _, _), rest = jax.lax.scan(
            step, (cache, tok0, done0, rng),
            jnp.arange(gen.max_new_tokens - 1, dtype=jnp.int32))
        tokens = jnp.concatenate([tok0[:, None], rest.T], axis=1)
        return tokens

    return generate


def make_multimodal_generate_fn(
    model: U2CausalLM,
    gen: GenerationConfig,
    cache_dtype=jnp.bfloat16,
    jit: bool = True,
) -> Callable:
    """generate(params, input_ids, images, question_ids, prompt_len, rng):
    vision encode + splice + prefill + decode, end-to-end jitted.

    ``images`` may be None for text-only generation (matches the
    vision_input=None branch of the reference generate, u2qwen3.py:125-126).
    """
    gen_fn = make_generate_fn(model, gen, cache_dtype)

    def generate(params, input_ids, images, question_ids, prompt_len, rng):
        embeds = model.apply(params, input_ids, images, question_ids,
                             method="prepare_inputs_embeds")
        return gen_fn(params, embeds, prompt_len, rng)

    if jit:
        generate = jax.jit(generate)
    return generate
