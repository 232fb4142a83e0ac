"""Continuous-batching (slot engine) throughput on the real chip, 1.7B.

Run from the repo root: ``python tools_bench_slots.py`` (results recorded
in BENCHMARKS.md "Continuous batching").

Short decode (64 new tokens) so the run is bounded; 16 text requests over
8 slots with mid-flight admission. Reports tokens/s and per-dispatch cost —
on the axon relay each host->device dispatch costs ~30-40 ms, which
dominates; the speculative engine divides dispatch count by ~acceptance.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from u2tokenizer_tpu.config import GenerationConfig, LLMConfig
from u2tokenizer_tpu.models.llm.decoder import CausalLM
from u2tokenizer_tpu.models.quantize import (cast_for_inference,
                                             quantize_llm_weights,
                                             quantized_llm_config)
from u2tokenizer_tpu.models.slot_serving import Engine

PROMPT, MAX_NEW, SLOTS, NREQ = 1024, 64, 8, 16

cfg = LLMConfig.qwen3_1_7b()
model = CausalLM(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
emb0 = jnp.zeros((1, 8, cfg.hidden_size), jnp.bfloat16)
t0 = time.time()
params = jax.jit(lambda r: model.init(r, emb0, jnp.zeros((1, 8), jnp.int32),
                                      jnp.ones((1, 1, 8, 8), bool)))(rng)
params = jax.jit(lambda p: quantize_llm_weights(cast_for_inference(p)))(params)
np.asarray(jax.tree_util.tree_leaves(params)[0])
qmodel = CausalLM(quantized_llm_config(cfg), dtype=jnp.bfloat16)
print(f"init {time.time()-t0:.0f}s", flush=True)

gen = GenerationConfig(max_new_tokens=MAX_NEW, do_sample=False,
                       eos_token_id=-2, pad_token_id=0)
reqs = [np.asarray(jax.random.randint(jax.random.PRNGKey(i), (1, PROMPT),
                                      1, cfg.vocab_size), np.int32)
        for i in range(NREQ)]

# rows: plain engine, spec pinned at each ladder rung (kb=1 is the bottom
# rung the adaptive thresholds need; per-dispatch cost c(k) calibrates the
# ladder), and the adaptive engine itself
ROWS = [("plain", False, 8), ("spec-kb1", True, 1), ("spec-kb2", True, 2),
        ("spec-kb4", True, 4), ("spec-kb8", True, 8),
        ("adaptive", "auto", 8)]

summary = {}
for label, spec, kb in ROWS:
    eng2 = Engine(qmodel, params, gen, num_slots=SLOTS, prompt_buf=PROMPT,
                  cache_dtype="int8", speculative=spec, block_len=kb)
    # warm the jits with one request, then (adaptive) pre-compile EVERY
    # ladder rung's decode so no compile lands inside the timed loop —
    # jitted closures are per Engine instance
    t0 = time.time()
    eng2.submit(reqs[0])
    eng2.run()
    if spec == "auto":
        for kbx in eng2._kb_ladder:
            # fetch every leaf (the decode returns a pytree, and on axon
            # only a fetch synchronizes)
            for leaf in jax.tree_util.tree_leaves(eng2._decode_for(kbx)(
                    params, eng2.state, jax.random.PRNGKey(0))):
                np.asarray(leaf)
    print(f"{label}: warm-up (compiles) {time.time()-t0:.0f}s", flush=True)
    # reset results/stats/policy so the timed run is clean
    eng2._results.clear()
    eng2.spec_stats = {"emitted_tokens": 0, "verify_steps": 0}
    if spec == "auto":
        eng2._rung = len(eng2._kb_ladder) - 1
        eng2._accept_window.clear()
        eng2._plain_dispatches = 0
    for r in reqs:
        eng2.submit(r)
    steps = 0
    t0 = time.time()
    while eng2._queue or eng2._by_slot:
        eng2.step()
        steps += 1
    dt = time.time() - t0
    out = eng2._results
    toks = sum(len(v) for v in out.values())
    extra = ""
    if spec:
        ss = eng2.spec_stats
        acc = ss["emitted_tokens"] / max(ss["verify_steps"], 1)
        extra = f", accept {acc:.2f}/step, final kb={eng2.spec_block_len}"
    print(f"{label}: {NREQ} reqs x {MAX_NEW} tok on {SLOTS} slots: "
          f"{dt:.1f}s, {toks} tokens -> {toks/dt:.0f} tok/s, "
          f"{steps} dispatches ({dt/steps*1e3:.0f} ms/dispatch){extra}",
          flush=True)
    row = {"seconds": round(dt, 2), "tokens": toks,
           "tok_per_s": round(toks / dt, 1), "dispatches": steps,
           "ms_per_dispatch": round(dt / steps * 1e3, 1)}
    if spec:
        ss = eng2.spec_stats
        row["accept_per_step"] = round(
            ss["emitted_tokens"] / max(ss["verify_steps"], 1), 2)
        row["final_kb"] = eng2.spec_block_len
    summary[label] = row

# one machine-readable line for the artifact dir: per-rung dispatch cost
# c(k) is what calibrates the adaptive ladder's thresholds (BENCHMARKS.md
# "Continuous batching"); crossover accept for rung k vs plain is
# c(k)/c(plain) when dispatch latency dominates.
ck = {lbl: summary[lbl]["ms_per_dispatch"] for lbl in summary}
print(json.dumps({"metric": "slot_ladder_ms_per_dispatch",
                  "value": ck.get("plain"), "unit": "ms",
                  "detail": {"rows": summary,
                             "config": {"prompt": PROMPT, "max_new": MAX_NEW,
                                        "slots": SLOTS, "nreq": NREQ}}}))
