"""8B serving memory/stage probe (r4 VERDICT next #8).

The r4 sweep found all-int4 8B saturates at B48 (179.9 r/min) and LOSES
at B64 (171.6) with vision microbatch 32 + prefill chunk 256 — both
overhead-adding mitigations for activation peaks. This tool answers WHERE
the memory and time go, on the real chip, without running a full bench:

  * PROBE=mem: AOT-compile the three stage programs (embeds / prefill /
    decode-chunk) at the requested geometry and print XLA's
    memory_analysis per program (argument/output/temp bytes) — the
    direct reading of which stage's peak binds the batch.
  * PROBE=time: run the staged generate once (decode_chunk splits the
    program host-side) and print per-stage wall clock.

Env: PM_BATCH (48), PM_VMB (32), PM_PREFILL_CHUNK (256; 0 = unchunked),
PM_WQ (int4), PM_KV (int4), PM_MODEL (8b|1.7b), PROBE (mem|time).
Prints one JSON line.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("PM_BATCH", "48"))
VMB = int(os.environ.get("PM_VMB", "32"))
PFC = int(os.environ.get("PM_PREFILL_CHUNK", "256")) or None
WQ = os.environ.get("PM_WQ", "int4")
KV = os.environ.get("PM_KV", "int4")
MODEL = os.environ.get("PM_MODEL", "8b")
PROBE = os.environ.get("PROBE", "mem")
PROMPT_LEN, MAX_NEW = 1024, 768
# 0 = fused single-program prefill+decode (the bench/serve shipping
# path); >0 = the staged relay path (one prefill program + host-driven
# decode chunks, REALWEIGHTS_RUNBOOK relay jobs)
DECODE_CHUNK = int(os.environ.get("PM_DECODE_CHUNK", "768")) or None


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _ma(compiled) -> dict:
    ma = compiled.memory_analysis()
    return {
        "arg_gb": round(ma.argument_size_in_bytes / 1e9, 3),
        "out_gb": round(ma.output_size_in_bytes / 1e9, 3),
        "alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
        "peak_gb": round((ma.argument_size_in_bytes
                          + ma.output_size_in_bytes
                          - ma.alias_size_in_bytes
                          + ma.temp_size_in_bytes) / 1e9, 3),
    }


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from u2tokenizer_tpu.config import (GenerationConfig, LLMConfig,
                                        U2ModelConfig)
    from u2tokenizer_tpu.models.generate import (_microbatched_embeds,
                                                 make_generate_fn)
    from u2tokenizer_tpu.models.quantize import quantized_llm_config
    from u2tokenizer_tpu.models.u2_model import U2CausalLM

    global PROMPT_LEN, MAX_NEW
    cfg = U2ModelConfig()
    if MODEL == "8b":
        cfg = dataclasses.replace(cfg, llm=LLMConfig.qwen3_8b())
    elif MODEL == "tiny":  # CPU smoke of both probe paths
        jax.config.update("jax_platforms", "cpu")
        cfg = U2ModelConfig.tiny()
        PROMPT_LEN, MAX_NEW = 32, 8
    model = U2CausalLM(quantized_llm_config(cfg, WQ), dtype=jnp.bfloat16)
    d, h, w = cfg.vision.input_spatial
    rng = jax.random.PRNGKey(0)

    # structural quantized params (bench.py int4 recipe): zeros/ones tree
    # from eval_shape — throughput/memory are weight-value independent
    ids1 = jnp.zeros((1, PROMPT_LEN), jnp.int32)
    img1 = jnp.zeros((1, cfg.num_chunks, d, h, w), jnp.bfloat16)
    q1 = jnp.ones((1, 64), jnp.int32)
    abs_tree = jax.eval_shape(lambda r: model.init(r, ids1, img1, q1), rng)
    dt = lambda a: jnp.bfloat16 if (a.dtype == jnp.float32
                                    and len(a.shape) >= 2) else a.dtype
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, dt(a)), abs_tree))()
    np.asarray(jax.tree_util.tree_leaves(params)[0])
    log(f"probe: params ready ({MODEL}, wq={WQ})")

    gen = GenerationConfig(max_new_tokens=MAX_NEW, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    ids = jnp.zeros((B, PROMPT_LEN), jnp.int32)
    images = jnp.zeros((B, cfg.num_chunks, d, h, w), jnp.bfloat16)
    qids = jnp.ones((B, 64), jnp.int32)
    plen = jnp.full((B,), PROMPT_LEN, jnp.int32)

    embeds_fn = jax.jit(functools.partial(_microbatched_embeds, model,
                                          vision_microbatch=VMB))

    result = {"model": MODEL, "batch": B, "vmb": VMB,
              "prefill_chunk": PFC or 0, "wq": WQ, "kv": KV,
              "probe": PROBE}
    if PROBE == "mem":
        def try_ma(tag, lower_fn):
            # an out-of-HBM COMPILE is itself the diagnosis (XLA prints
            # the program/argument breakdown) — record it instead of dying
            try:
                result[tag] = _ma(lower_fn().compile())
            except Exception as e:
                # keep the TAIL — XLA puts the allocation breakdown at the
                # end; the r5d B64 artifact kept the head and lost the
                # actual reason under relay boilerplate
                msg = str(e)
                result[tag] = {"compile_error": msg[-2500:]
                               if len(msg) > 2500 else msg}
            log(f"{tag}: {result[tag]}")

        try_ma("embeds", lambda: embeds_fn.lower(params, ids, images, qids))
        # the staged gen_fn hides its jits; compile the unstaged whole
        # program instead (prefill+decode scan in one executable) — its
        # temp is the serving peak the batch must fit alongside weights
        from u2tokenizer_tpu.models.generate import (
            make_multimodal_generate_fn)
        whole = make_multimodal_generate_fn(
            model, gen, cache_dtype=KV, jit=False,
            vision_microbatch=VMB, prefill_chunk=PFC)
        try_ma("generate", lambda: jax.jit(whole).lower(
            params, ids, images, qids, plen, jax.random.PRNGKey(1)))
        # prefill-stage proxy: same program at 2 new tokens — its peak is
        # the prefill residency the decode chunks must also fit under
        gen2 = dataclasses.replace(gen, max_new_tokens=2)
        pre2 = make_multimodal_generate_fn(
            model, gen2, cache_dtype=KV, jit=False,
            vision_microbatch=VMB, prefill_chunk=PFC)
        try_ma("prefill_proxy", lambda: jax.jit(pre2).lower(
            params, ids, images, qids, plen, jax.random.PRNGKey(1)))
    else:
        # decode_chunk -> make_generate_fn returns a host-level fn whose
        # prefill/decode stages are separately jitted (the staged relay
        # path); DECODE_CHUNK=0 probes the fused shipping path instead.
        # Only the time probe runs it — the mem probe compiles the
        # unstaged whole program below.
        gen_fn = make_generate_fn(model, gen, KV, PFC,
                                  decode_chunk=DECODE_CHUNK)
        if DECODE_CHUNK is None:  # fused path returns a jittable, not a jit
            gen_fn = jax.jit(gen_fn)
        t0 = time.time()
        embeds = embeds_fn(params, ids, images, qids)
        np.asarray(embeds[0, 0, :2].astype(jnp.float32))
        t_emb_c = time.time() - t0
        t0 = time.time()
        embeds = embeds_fn(params, ids, images, qids)
        np.asarray(embeds[0, 0, :2].astype(jnp.float32))
        t_emb = time.time() - t0
        # the CT volume batch (B x chunks x D x H x W bf16, ~2 GB at B64)
        # is only an embeds-stage input — holding it across prefill+decode
        # OOMed the B48 probe where the bench's identical config fits
        del images, ids
        result.update({
            "embeds_s": round(t_emb, 2),
            "embeds_compile_s": round(t_emb_c, 2),
        })
        try:
            # an OOM here IS the staged-path diagnosis (the r5d B48 run
            # died in prefill dispatch): record it and still emit the
            # embeds timings above
            t0 = time.time()
            toks = gen_fn(params, embeds, plen, jax.random.PRNGKey(1))
            np.asarray(toks[:2, :2])
            t_dec_c = time.time() - t0
            t0 = time.time()
            toks = gen_fn(params, embeds, plen, jax.random.PRNGKey(1))
            np.asarray(toks[:2, :2])
            t_dec = time.time() - t0
            result.update({
                "prefill_decode_s": round(t_dec, 2),
                "prefill_decode_compile_s": round(t_dec_c, 2),
                "total_s": round(t_emb + t_dec, 2),
                "reports_per_min": round(B / (t_emb + t_dec) * 60, 1),
            })
        except Exception as e:
            msg = str(e)
            result["prefill_decode_error"] = (msg[-2500:]
                                              if len(msg) > 2500 else msg)
            log(f"prefill/decode stage failed: {result['prefill_decode_error']}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
