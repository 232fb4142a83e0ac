"""Speculative SAMPLING crossover measurement (r2 VERDICT weak #6 / next #5).

Round 2 shipped exact-distribution speculative sampling but it was a net
loss (34.8 vs 8.2 s/batch): each verify step warped kb positions with a
full-vocab sort. The bucketed top-p warp (ops/sampling.py) removes that
cost; this tool measures the new per-verify-step price and reports the
CROSSOVER ACCEPTANCE — the mean accepted tokens/step above which
speculative sampling beats plain sampling:

  plain:  t_plain = OH + T * tau_plain        (T = max_new_tokens steps)
  spec:   t_spec  = OH + (T / accept) * tau_spec
  spec wins  <=>  accept > tau_spec / tau_plain

With random weights spec acceptance is ~1 (drafts rarely hit the sampled
continuation), so the honest measurement is the component costs: run both
loops to completion, derive tau from (time - shared-overhead)/steps where
the shared overhead (vision + prefill) is measured via a short-decode run.
Done criterion from the verdict: crossover <= 2.

Prints one JSON line with tau_plain, tau_spec, crossover, s/batch both.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("SS_BATCH", "16"))
T = int(os.environ.get("SS_TOKENS", "768"))
SHORT = int(os.environ.get("SS_SHORT", "16"))
# SS_TEMP < 1 sharpens the random-weight logits so the nucleus fits the
# top-k prefix — measuring the warp's FAST path (the real peaked-model
# regime); SS_TEMP=1 measures the exact full-sort fallback (flat logits).
TEMP = float(os.environ.get("SS_TEMP", "1.0"))
# One variant per process: the axon backend does not reliably reuse the
# persistent compile cache for these multi-minute programs across
# processes, so each (path, length) variant compiles and measures in its
# own invocation and appends to SS_STATE; MODE=report combines them.
#   SS_MODE = plain_short | spec_short | plain_full | spec_full | report
MODE = os.environ.get("SS_MODE", "report")
STATE = os.environ.get("SS_STATE", "/tmp/spec_sampling_state.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _load_state() -> dict:
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {}


def _save_state(state: dict) -> None:
    with open(STATE, "w") as f:
        json.dump(state, f)


def report():
    raw = _load_state()
    sfx = "" if TEMP == 1.0 else f"_t{TEMP}"
    # *_steps / *_T keys carry the suffix between the stem and the field
    r = {}
    for stem in ("plain_short", "plain_full", "spec_short", "spec_full",
                 "forced_full"):
        if f"{stem}{sfx}" in raw:
            r[stem] = raw[f"{stem}{sfx}"]
        for field in ("steps", "T"):
            if f"{stem}{sfx}_{field}" in raw:
                r[f"{stem}_{field}"] = raw[f"{stem}{sfx}_{field}"]
    # tau_spec (s per verify step) can come from either full spec leg:
    # forced_content runs the identical verify compute, only the accept
    # test differs, so (time - short) / (steps - short_steps) is the same
    # quantity. The random-acceptance spec_full leg at T=768 reproducibly
    # crashes the axon TPU worker (~66 s single-program wall clock; the
    # 50 s plain and 39 s forced legs survive), so it is measured at a
    # shorter T and the forced leg doubles as the fallback.
    spec_src = ("spec_full" if "spec_full" in r and "spec_full_steps" in r
                else "forced_full" if "forced_full" in r
                and "forced_full_steps" in r else None)
    need = {"plain_short", "plain_full", "spec_short", "spec_short_steps"}
    missing = need - set(r)
    if missing or spec_src is None:
        if spec_src is None:
            missing |= {"spec_full|forced_full(+_steps)"}
        print(json.dumps({"error": f"missing measurements: {sorted(missing)}",
                          "state": raw}))
        sys.exit(1)
    # legacy state files (pre-r4) lack per-leg _T keys; falling back to the
    # reporting process's env constants can mislabel legs measured at a
    # different token count — surface that in the report (ADVICE r4).
    warnings = [f"{stem}_T missing from state: assuming the current "
                f"SS_TOKENS/SS_SHORT env values"
                for stem in dict.fromkeys(  # dedup: spec_src may BE forced_full
                    ("plain_full", "plain_short", "spec_short", spec_src,
                     "forced_full"))
                if f"{stem}_T" not in r and stem in r]
    t_plain_full = r.get("plain_full_T", T)
    t_plain_short = r.get("plain_short_T", SHORT)
    if t_plain_full == t_plain_short:
        print(json.dumps({
            "error": "plain legs recorded at the same token count "
                     f"({t_plain_full}): tau_plain undefined — re-measure "
                     "with distinct SS_TOKENS/SS_SHORT",
            "state": raw}))
        sys.exit(1)
    tau_plain = ((r["plain_full"] - r["plain_short"])
                 / (t_plain_full - t_plain_short))
    steps_delta = r[f"{spec_src}_steps"] - r["spec_short_steps"]
    tau_spec = (r[spec_src] - r["spec_short"]) / max(steps_delta, 1)
    crossover = tau_spec / tau_plain
    accept_measured = None
    if "spec_full" in r and "spec_full_steps" in r:
        accept_measured = (r.get("spec_full_T", T)
                           / max(r["spec_full_steps"], 1))
    forced = {}
    # acceptance/speedup need the measured verify-step count; without it
    # the fields would be fabricated (ADVICE r4) — omit them instead.
    if "forced_full" in r and "forced_full_steps" in r:
        t_forced = r.get("forced_full_T", T)
        facc = t_forced / max(r["forced_full_steps"], 1)
        # compare at matched token counts: plain cost is content-
        # independent and linear in steps past the shared overhead
        plain_at_forced_T = (r["plain_short"]
                             + tau_plain * (t_forced - t_plain_short))
        forced = {
            "forced_content_spec_s_per_batch": round(r["forced_full"], 2),
            "forced_content_tokens": t_forced,
            "forced_content_accept_per_step": round(facc, 2),
            "forced_content_speedup_vs_plain": round(
                plain_at_forced_T / r["forced_full"], 2),
            "forced_note": "spec sampling on scripted AMOS-style report "
                           "content (identical compute, content-driven "
                           "acceptance) vs content-independent plain "
                           "sampled decode at the same token count",
        }
    rand = {}
    if accept_measured is not None:
        rand = {
            "spec_s_per_batch_at_random_accept": round(r["spec_full"], 2),
            "spec_random_tokens": r.get("spec_full_T", T),
            "accept_random_weights": round(accept_measured, 2),
        }
    print(json.dumps({
        "metric": "spec_sampling_crossover_accept",
        "value": round(crossover, 3),
        "unit": "accepted_tokens_per_step",
        "detail": {
            "batch": B, "max_new_tokens": T, "temperature": TEMP,
            "tau_plain_ms_per_token": round(tau_plain * 1000, 3),
            "tau_spec_ms_per_verify_step": round(tau_spec * 1000, 3),
            "tau_spec_source": spec_src,
            **({"warnings": warnings} if warnings else {}),
            "plain_s_per_batch": round(r["plain_full"], 2),
            **rand,
            "note": "spec sampling beats plain whenever content acceptance "
                    "exceeds the crossover; exact output distribution "
                    "either way",
            **forced,
        },
    }))


def main():
    if MODE == "report":
        report()
        return
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from u2tokenizer_tpu.config import GenerationConfig, U2ModelConfig
    from u2tokenizer_tpu.models.generate import make_multimodal_generate_fn
    from u2tokenizer_tpu.models.quantize import (cast_for_inference,
                                                 quantize_llm_weights,
                                                 quantized_llm_config)
    from u2tokenizer_tpu.models.speculative import (
        make_spec_multimodal_generate_fn)
    from u2tokenizer_tpu.models.u2_model import U2CausalLM

    cfg = U2ModelConfig()
    model = U2CausalLM(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    images = jax.random.normal(rng, (B, cfg.num_chunks, d, h, w),
                               jnp.bfloat16)
    ids = jnp.zeros((B, 1024), jnp.int32)
    qids = jnp.ones((B, 64), jnp.int32)
    plen = jnp.full((B,), 1024, jnp.int32)

    log("init 1.7B int8")
    params = jax.jit(lambda r: model.init(r, ids[:1], images[:1],
                                          qids[:1]))(rng)
    # donate through the staging jits: init fp32 (8.6 GB) + bf16 cast
    # + int8 copies otherwise coexist and can OOM the 16 GB chip
    params = jax.jit(cast_for_inference, donate_argnums=0)(params)
    params = jax.jit(quantize_llm_weights, donate_argnums=0)(params)
    model = U2CausalLM(quantized_llm_config(cfg), dtype=jnp.bfloat16)
    np.asarray(jax.tree_util.tree_leaves(params)[0])

    def timed(fn, *args, n=2):
        out = fn(*args)
        np.asarray(out[0] if isinstance(out, tuple) else out)
        t0 = time.time()
        for i in range(n):
            out = fn(*args)
            np.asarray(out[0] if isinstance(out, tuple) else out)
        return (time.time() - t0) / n, out

    path, length = MODE.split("_")
    tokens = SHORT if length == "short" else T
    gen = GenerationConfig(max_new_tokens=tokens, do_sample=True,
                           top_p=0.9, temperature=TEMP,
                           eos_token_id=-2, pad_token_id=0)
    state = _load_state()
    mode_key = MODE if TEMP == 1.0 else f"{MODE}_t{TEMP}"
    if path == "forced":
        # spec SAMPLING under content-controlled realistic report text:
        # acceptance = draft==script (models/speculative.py forced_content
        # with do_sample=True keeps the whole warp live), so this measures
        # the sampled-serving wall-clock of a model emitting AMOS-style
        # reports — the honest "acceptance >= 2 on realistic content"
        # datapoint. Compare directly against plain_full/plain_short:
        # plain sampled decode cost is content-independent (fixed T steps).
        from u2tokenizer_tpu.data.synthetic_reports import (
            report_token_scripts)
        script = jnp.asarray(report_token_scripts(
            B, tokens + 8, cfg.llm.vocab_size, seed=7))
        fn = jax.jit(make_spec_multimodal_generate_fn(
            model, gen, cache_dtype="int8", jit=False, return_stats=True,
            forced_content=True))
        log(f"compiling forced-content speculative sampled decode ({length})")
        t, out = timed(lambda *a: fn(*a, script), params, ids, images,
                       qids, plen, jax.random.PRNGKey(1))
        state[mode_key] = t
        state[f"{mode_key}_steps"] = int(np.asarray(out[1]))
        state[f"{mode_key}_T"] = tokens
        log(f"forced {length}: {t:.2f}s/batch, "
            f"{state[f'{mode_key}_steps']} verify steps "
            f"({tokens / max(state[f'{mode_key}_steps'], 1):.2f} acc/step)")
        _save_state(state)
        print(json.dumps({mode_key: state[mode_key]}))
        return
    if path == "plain":
        fn = jax.jit(make_multimodal_generate_fn(
            model, gen, cache_dtype="int8", jit=False))
        log(f"compiling plain sampled decode ({length}: {tokens} tokens)")
        t, _ = timed(fn, params, ids, images, qids, plen,
                     jax.random.PRNGKey(1))
        state[mode_key] = t
        state[f"{mode_key}_T"] = tokens
        log(f"plain {length}: {t:.2f}s/batch")
    else:
        fn = jax.jit(make_spec_multimodal_generate_fn(
            model, gen, cache_dtype="int8", jit=False, return_stats=True))
        log(f"compiling speculative sampled decode ({length})")
        t, out = timed(fn, params, ids, images, qids, plen,
                       jax.random.PRNGKey(1))
        state[mode_key] = t
        state[f"{mode_key}_steps"] = int(np.asarray(out[1]))
        state[f"{mode_key}_T"] = tokens
        log(f"spec {length}: {t:.2f}s/batch, {state[f'{mode_key}_steps']} "
            f"verify steps")
    _save_state(state)
    print(json.dumps({mode_key: state[mode_key]}))


if __name__ == "__main__":
    main()
