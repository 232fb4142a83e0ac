"""End-to-end DPO-data pipeline bench: pred_then_green reports/min/chip.

The reference's actual bottleneck is not single greedy decoding but the
GREEN-scored DPO data pipeline (green_refactored/pred_then_green.py): per
case, 8 sampled predictions (top-p 0.9, 768 new tokens, lu2_model.py:63)
followed by judge scoring of each prediction (GREEN-RadPhi2-class LLM,
~600-token judgments at 2048-token prompts, green.py:96-105). This tool
measures that pipeline on one chip with the serving configuration:

  stage 1 (predict): μ²Qwen3-1.7B int8, 8 samples/case as one fused batch
    of cases×8 rows, nucleus sampling through the bucketed top-p warp —
    optionally speculative (spec sampling is exact-distribution; its
    acceptance with random weights is ~1, so the default measures the
    plain sampled path and reports the speculative crossover separately).
  stage 2 (judge): ~2.7B judge decoder (GREEN-RadPhi2 geometry), greedy
    600-token judgments with n-gram speculative decoding (judge outputs
    quote report sentences from the prompt — high-acceptance content),
    batch = all predictions.

Each stage runs in its OWN PROCESS (PG_STAGE=predict|judge; report combines
them) so the two multi-GB models never share the 16 GB chip — the fp32
judge init alone peaks ~11 GB. Orchestration:

  PG_STAGE=predict python tools_bench_pred_green.py
  PG_STAGE=judge   python tools_bench_pred_green.py
  PG_STAGE=report  python tools_bench_pred_green.py   # one JSON line

Throughput is weight-value independent (same reasoning as bench.py); judge
speculative acceptance is content-dependent and measured in forced-content
mode over scripted judgment text that quotes the embedded report (the
structure real GREEN outputs have).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CASES = int(os.environ.get("PG_CASES", "8"))
N_SAMPLES = int(os.environ.get("PG_SAMPLES", "8"))
PRED_TOKENS = int(os.environ.get("PG_PRED_TOKENS", "768"))
JUDGE_TOKENS = int(os.environ.get("PG_JUDGE_TOKENS", "600"))
JUDGE_PROMPT = int(os.environ.get("PG_JUDGE_PROMPT", "2048"))
JUDGE_BATCH = int(os.environ.get("PG_JUDGE_BATCH", "16"))
STAGE = os.environ.get("PG_STAGE", "report")
STATE = os.environ.get("PG_STATE", "/tmp/pred_green_state.json")
# shared-prefix fan-out decode (prefill once per case, joint-softmax decode
# against the case-shared prompt KV) — exact same output distribution as
# the tiled path (tests/test_fanout.py); PG_FANOUT=0 measures the old
# tile-everything baseline for comparison
FANOUT = os.environ.get("PG_FANOUT", "1") == "1"
# PG_PRED_SPEC=1: speculative SAMPLING on the predict stage, composed with
# fan-out (case-shared prompt KV; models/speculative.py fanout=). Uses
# forced-content report scripts so acceptance reflects realistic report
# text, like the judge stage. Exact top-p distribution either way.
PRED_SPEC = os.environ.get("PG_PRED_SPEC", "0") == "1"
# judge-stage shared-prefix prefill: a case's N_SAMPLES judgments share the
# [chat head ; GREEN template ; reference report] prompt tokens — prefill
# them once per case (generate.shared_prefix_prefill), identical output.
# PG_JUDGE_SHARE=0 measures the old per-row prefill baseline.
JUDGE_SHARE = os.environ.get("PG_JUDGE_SHARE", "1") == "1"
# PG_JUDGE_FANOUT=1: fanout_split — the shared split lives in a per-CASE
# prefix cache streamed once per case at decode (gqa_sdpa_fanout) and the
# per-row cache holds only [prompt tail ; judgment]: less resident memory
# (share1 at B16 OOMed by 1.5 GB from the tiled full-size caches) AND less
# per-step decode traffic. Output-identical (tests/test_shared_prefix.py).
JUDGE_FANOUT = os.environ.get("PG_JUDGE_FANOUT", "0") == "1"
# shared tokens per judge prompt (template ~600 + reference report ~400 of
# the 2048-token prompt; candidate + instructions are per-row)
JUDGE_SHARED_TOKENS = int(os.environ.get("PG_JUDGE_SHARED_TOKENS", "1024"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _load_state() -> dict:
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {}


def _save(key: str, value) -> None:
    state = _load_state()
    state[key] = value
    with open(STATE, "w") as f:
        json.dump(state, f)


def stage_predict():
    from u2tokenizer_tpu.config import GenerationConfig, U2ModelConfig
    from u2tokenizer_tpu.models.quantize import (cast_for_inference,
                                                 quantize_llm_weights,
                                                 quantized_llm_config)
    from u2tokenizer_tpu.models.u2_model import U2CausalLM

    rng = jax.random.PRNGKey(0)
    cfg = U2ModelConfig()
    model = U2CausalLM(cfg, dtype=jnp.bfloat16)
    d, h, w = cfg.vision.input_spatial
    b_pred = CASES * N_SAMPLES
    # each case's volume encoded ONCE, predictions fan out over samples —
    # the reference re-encodes per sample (pred_then_green.py:77); vision
    # reuse is a framework win we measure honestly by encoding CASES
    # volumes and tiling the embeddings.
    images = jax.random.normal(rng, (CASES, cfg.num_chunks, d, h, w),
                               jnp.bfloat16)
    # per-CASE inputs; the tiled path repeats rows, the fan-out path shares
    input_ids = jnp.zeros((CASES, 1024), jnp.int32)
    question_ids = jnp.ones((CASES, 64), jnp.int32)
    prompt_len = jnp.full((CASES,), 1024, jnp.int32)

    log(f"stage1: init 1.7B int8 ({CASES} cases x {N_SAMPLES} samples)")
    params = jax.jit(lambda r: model.init(
        r, input_ids[:1], images[:1], question_ids[:1]))(rng)
    # donate through the staging jits: init fp32 (8.6 GB) + bf16 cast
    # + int8 copies otherwise coexist and can OOM the 16 GB chip
    params = jax.jit(cast_for_inference, donate_argnums=0)(params)
    params = jax.jit(quantize_llm_weights, donate_argnums=0)(params)
    model = U2CausalLM(quantized_llm_config(cfg), dtype=jnp.bfloat16)
    np.asarray(jax.tree_util.tree_leaves(params)[0])

    gen = GenerationConfig(max_new_tokens=PRED_TOKENS, do_sample=True,
                           top_p=0.9, eos_token_id=-2, pad_token_id=0)

    script = None
    if PRED_SPEC:
        # speculative sampling composed with fan-out: n-gram drafts verified
        # against the exact top-p warp, prompt KV shared per case; forced
        # report-content scripts make the acceptance realistic (same
        # honest-content protocol as the judge stage)
        from u2tokenizer_tpu.data.synthetic_reports import (
            report_token_scripts)
        from u2tokenizer_tpu.models.speculative import (
            make_spec_multimodal_generate_fn)

        script = jnp.asarray(report_token_scripts(
            b_pred, PRED_TOKENS + 8, cfg.llm.vocab_size, seed=21))
        if FANOUT:
            base_fn = make_spec_multimodal_generate_fn(
                model, gen, cache_dtype="int8", forced_content=True,
                fanout=N_SAMPLES, return_stats=True)
            predict = lambda p, i, im, q, pl, r: base_fn(
                p, i, im, q, pl, r, script)
        else:
            # tiled spec baseline: encode CASES volumes ONCE and tile the
            # EMBEDS (matching the non-spec tiled baseline) — repeating the
            # images would re-run the ViT per sample row and flatter any
            # spec+fanout comparison
            from u2tokenizer_tpu.models.generate import _microbatched_embeds
            from u2tokenizer_tpu.models.speculative import (
                make_spec_generate_fn)

            spec_fn = make_spec_generate_fn(
                model, gen, cache_dtype="int8", forced_content=True,
                return_stats=True)

            def predict(p, i, im, q, pl, r):
                embeds_c = _microbatched_embeds(model, p, i, im, q, 128)
                return spec_fn(p, jnp.repeat(embeds_c, N_SAMPLES, 0),
                               jnp.repeat(i, N_SAMPLES, 0),
                               jnp.repeat(pl, N_SAMPLES, 0), r, script)

            predict = jax.jit(predict)
        log("stage1: compiling speculative sampled generate "
            f"({'fan-out shared prefix' if FANOUT else 'tiled rows'})")
    elif FANOUT:
        # shared-prefix fan-out: vision encode AND prefill once per case;
        # the decode attends [case-shared prompt KV ; per-row suffix] with
        # a joint softmax — prompt-KV HBM traffic and prefill FLOPs divided
        # by N_SAMPLES, output distribution identical (tests/test_fanout.py)
        from u2tokenizer_tpu.models.generate import (
            make_fanout_multimodal_generate_fn)
        predict = make_fanout_multimodal_generate_fn(
            model, gen, N_SAMPLES, cache_dtype="int8")
        log("stage1: compiling fan-out sampled generate (shared prefix)")
    else:
        def predict(params, input_ids, images, question_ids, prompt_len,
                    rng):
            # encode CASES volumes once, tile to CASES*N_SAMPLES rows
            from u2tokenizer_tpu.models.generate import (_microbatched_embeds,
                                                         make_generate_fn)

            embeds_c = _microbatched_embeds(
                model, params, input_ids, images, question_ids, 128)
            embeds = jnp.repeat(embeds_c, N_SAMPLES, axis=0)
            return make_generate_fn(model, gen, cache_dtype="int8")(
                params, embeds,
                jnp.repeat(prompt_len, N_SAMPLES, axis=0), rng)

        predict = jax.jit(predict)
        log("stage1: compiling sampled generate (bucketed top-p warp)")
    t0 = time.time()
    np.asarray(jax.tree_util.tree_leaves(predict(
        params, input_ids, images, question_ids, prompt_len,
        jax.random.PRNGKey(1)))[0])
    log(f"stage1 compile+run {time.time() - t0:.1f}s")
    t0 = time.time()
    res = predict(params, input_ids, images, question_ids, prompt_len,
                  jax.random.PRNGKey(2))
    accept = None
    if PRED_SPEC:
        toks, steps = res
        np.asarray(toks)
        accept = PRED_TOKENS / max(int(np.asarray(steps)), 1)
    else:
        np.asarray(res)
    predict_s = time.time() - t0
    mode = (("spec+" if PRED_SPEC else "")
            + ("fanout" if FANOUT else "tiled"))
    log(f"stage1: {predict_s:.1f}s for {b_pred} sampled predictions "
        f"({mode}"
        + (f", {accept:.2f} accepted/step" if accept else "") + ")")
    _save("predict_s", predict_s)
    _save("predict_mode", mode)
    if accept:
        _save("predict_accept", accept)


def stage_judge():
    from u2tokenizer_tpu.config import GenerationConfig, LLMConfig
    from u2tokenizer_tpu.data.synthetic_reports import report_token_scripts
    from u2tokenizer_tpu.models.llm.decoder import CausalLM
    from u2tokenizer_tpu.models.quantize import (cast_for_inference,
                                                 quantize_llm_weights,
                                                 quantized_llm_config)
    from u2tokenizer_tpu.models.speculative import make_spec_generate_fn

    rng = jax.random.PRNGKey(0)
    b_pred = CASES * N_SAMPLES
    # GREEN-RadPhi2 geometry: the framework's phi-2 2.7B preset
    jcfg = LLMConfig.phi2()
    judge = CausalLM(jcfg, dtype=jnp.bfloat16)
    jb = JUDGE_BATCH
    j_len = jnp.full((jb,), JUDGE_PROMPT, jnp.int32)
    log("stage2: init 2.7B judge int8")
    jparams = jax.jit(lambda r: judge.init(
        r, jnp.zeros((1, 8, jcfg.hidden_size), jnp.bfloat16),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 1, 8, 8), bool)))(rng)
    jparams = jax.jit(cast_for_inference, donate_argnums=0)(jparams)
    jparams = jax.jit(quantize_llm_weights, donate_argnums=0)(jparams)
    judge = CausalLM(quantized_llm_config(jcfg), dtype=jnp.bfloat16)
    np.asarray(jax.tree_util.tree_leaves(jparams)[0])

    jgen = GenerationConfig(max_new_tokens=JUDGE_TOKENS, do_sample=False,
                            eos_token_id=-2, pad_token_id=0)
    # judge outputs quote the embedded reports: forced-content scripts that
    # interleave prompt n-grams (realistic high-acceptance judge text)
    script = report_token_scripts(jb, JUDGE_TOKENS + 8, jcfg.vocab_size,
                                  seed=11)
    prompt_np = np.zeros((jb, JUDGE_PROMPT), np.int32)
    # realistic GREEN prompt structure: a case's N_SAMPLES judgments share
    # the [template ; reference report] head and differ in the candidate
    # tail (green_refactored/utils.py:318-332) — rows are case-grouped
    rng_np = np.random.default_rng(12)
    if jb % N_SAMPLES == 0:
        shared_heads = rng_np.integers(
            1, jcfg.vocab_size, (jb // N_SAMPLES, JUDGE_SHARED_TOKENS))
        prompt_np[:, :JUDGE_SHARED_TOKENS] = np.repeat(
            shared_heads, N_SAMPLES, axis=0)
    else:  # non-divisible batch: per-row heads, sharing falls back off
        prompt_np[:, :JUDGE_SHARED_TOKENS] = rng_np.integers(
            1, jcfg.vocab_size, (jb, JUDGE_SHARED_TOKENS))
    # embed the quoted report inside the per-row candidate tail (as GREEN's
    # prompt does) so the drafter has real history to match
    prompt_np[:, -JUDGE_TOKENS:] = script[:, :JUDGE_TOKENS]
    j_ids = jnp.asarray(prompt_np)

    fs = sp = None
    if JUDGE_FANOUT and jb % N_SAMPLES == 0:
        fs = (N_SAMPLES, JUDGE_SHARED_TOKENS)
        log(f"stage2: fanout_split — shared {JUDGE_SHARED_TOKENS}-token "
            "prefix cached once per case, per-row tail-only caches")
    elif JUDGE_SHARE and jb % N_SAMPLES == 0:
        sp = (N_SAMPLES, JUDGE_SHARED_TOKENS)
        log(f"stage2: shared-prefix prefill ({JUDGE_SHARED_TOKENS} of "
            f"{JUDGE_PROMPT} prompt tokens once per case)")
    jfn = make_spec_generate_fn(judge, jgen, cache_dtype="int8",
                                return_stats=True, forced_content=True,
                                shared_prefix=sp, fanout_split=fs)

    def judge_step(params, ids, lens, rng, script):
        embeds = judge.apply(params, ids, method="embed_tokens")
        return jfn(params, embeds, ids, lens, rng, script)

    judge_step = jax.jit(judge_step)
    log("stage2: compiling judge speculative decode")
    t0 = time.time()
    toks, steps = judge_step(jparams, j_ids, j_len, jax.random.PRNGKey(3),
                             jnp.asarray(script))
    np.asarray(toks)
    log(f"stage2 compile+run {time.time() - t0:.1f}s")
    n_batches = (b_pred + jb - 1) // jb
    t0 = time.time()
    for i in range(n_batches):
        toks, steps = judge_step(jparams, j_ids, j_len,
                                 jax.random.PRNGKey(4 + i),
                                 jnp.asarray(script))
        np.asarray(toks)
    judge_s = time.time() - t0
    steps_i = int(np.asarray(steps))
    accept = JUDGE_TOKENS / max(steps_i, 1)
    log(f"stage2: {judge_s:.1f}s for {b_pred} judgments "
        f"({accept:.2f} accepted/step on quoted-report content)")
    _save("judge_s", judge_s)
    _save("judge_accept", accept)
    _save("judge_mode", "fanout_split" if fs
          else ("shared_prefix" if sp else "per_row_prefill"))


def report():
    r = _load_state()
    missing = {"predict_s", "judge_s"} - set(r)
    if missing:
        print(json.dumps({"error": f"missing stages: {sorted(missing)}",
                          "state": r}))
        sys.exit(1)
    total_s = r["predict_s"] + r["judge_s"]
    cases_per_min = CASES * 60.0 / total_s
    print(json.dumps({
        "metric": "pred_then_green_cases_per_min",
        "value": round(cases_per_min, 3),
        "unit": "cases/min/chip",
        "detail": {
            "cases": CASES, "samples_per_case": N_SAMPLES,
            "predict_seconds": round(r["predict_s"], 1),
            "judge_seconds": round(r["judge_s"], 1),
            "predict_tokens": PRED_TOKENS, "judge_tokens": JUDGE_TOKENS,
            "judge_model": "phi2-2.7B-geometry int8 (GREEN-RadPhi2 class)",
            "judge_accept_per_step": round(r["judge_accept"], 2),
            "predict_mode": r.get("predict_mode", "tiled"),
            "judge_mode": r.get("judge_mode", "per_row_prefill"),
            "policy": "u2-qwen3-1.7b int8, nucleus top-p 0.9 via the "
                      "bucketed warp, vision encoded once per case",
        },
    }))


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if STAGE == "predict":
        stage_predict()
    elif STAGE == "judge":
        stage_judge()
    else:
        report()


if __name__ == "__main__":
    main()
