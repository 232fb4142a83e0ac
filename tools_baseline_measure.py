"""Measure the reference decode path (HF torch, CPU) vs ours (jax, CPU) at
identical tiny shapes, and derive the A40 baseline from measured algorithmic
ratios + published A40 specs. Writes BASELINE_MEASURED.json."""
import json, os, time
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import torch

torch.set_num_threads(1)  # this host has one core; keep it honest

def measure_torch(decode_tokens=16):
    from transformers import Qwen3Config, Qwen3ForCausalLM
    # 0.12B-scale model: same architecture family, measurable on 1 CPU core
    cfg = Qwen3Config(vocab_size=8192, hidden_size=768, intermediate_size=2304,
                      num_hidden_layers=12, num_attention_heads=12,
                      num_key_value_heads=4, head_dim=64,
                      max_position_embeddings=2048, tie_word_embeddings=True)
    model = Qwen3ForCausalLM(cfg).eval()
    n_params = sum(p.numel() for p in model.parameters())
    ids = torch.randint(0, 8192, (1, 256))
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=4, do_sample=False)  # warmup
        t0 = time.time()
        out = model.generate(ids, max_new_tokens=decode_tokens, do_sample=False)
        dt = time.time() - t0
    return n_params, dt / decode_tokens

def measure_ours(decode_tokens=16):
    import jax, jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    from u2tokenizer_tpu.config import GenerationConfig, LLMConfig
    from u2tokenizer_tpu.models.generate import make_generate_fn
    from u2tokenizer_tpu.models.llm.decoder import CausalLM
    cfg = LLMConfig(vocab_size=8192, hidden_size=768, intermediate_size=2304,
                    num_layers=12, num_heads=12, num_kv_heads=4, head_dim=64,
                    max_position_embeddings=2048, rope_theta=1e6)
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (1, 256), 0, 8192)
    emb0 = jnp.zeros((1, 256, 768), jnp.float32)
    params = model.init(rng, emb0, jnp.zeros((1, 256), jnp.int32),
                        jnp.ones((1, 1, 256, 256), bool))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    gen = GenerationConfig(max_new_tokens=decode_tokens, eos_token_id=-2)
    fn = jax.jit(make_generate_fn(model, gen, cache_dtype=jnp.float32))
    emb = model.apply(params, ids, method="embed_tokens")
    plen = jnp.full((1,), 256, jnp.int32)
    np.asarray(fn(params, emb, plen, rng))  # compile+warmup
    t0 = time.time()
    np.asarray(fn(params, emb, plen, rng))
    dt = time.time() - t0
    return n_params, dt / decode_tokens

tp, t_tok_torch = measure_torch()
op, t_tok_ours = measure_ours()
result = {
  "host": "single-core CPU (same machine, same shapes, fp32)",
  "model_shape": "qwen3-family 0.12B, 12L/768h, prompt 256",
  "torch_params": tp, "jax_params": op,
  "torch_s_per_token_cpu": round(t_tok_torch, 4),
  "ours_s_per_token_cpu": round(t_tok_ours, 4),
  "algorithmic_ratio_ours_vs_torch": round(t_tok_torch / t_tok_ours, 3),
  "derivation": {
    "a40_hbm_gbps": 696, "a40_bf16_weights_gb": 3.4,
    "a40_weight_stream_floor_s_per_token": round(3.4/696, 5),
    "hf_overhead_factor_measured_on_cpu": None,  # filled below
  },
}
# HF per-step overhead factor: measured torch time / torch weight-stream floor
# on THIS host (fp32 bytes / measured single-core CPU stream rate is unknown;
# instead compare torch against our jax time at identical shapes: the factor
# by which HF generate exceeds a tight decode loop under the same backend).
result["derivation"]["hf_overhead_factor_measured_on_cpu"] = round(
    t_tok_torch / t_tok_ours, 3)
# Derived A40 rate for mu2-qwen3-1.7B, 768-token reports:
# weight-stream floor * measured HF overhead factor + vision/prefill share
# (~10% per BENCHMARKS profile)
floor = 3.4 / 696
s_per_tok = floor * result["derivation"]["hf_overhead_factor_measured_on_cpu"]
s_per_report = s_per_tok * 768 * 1.1
result["derived_a40_reports_per_min"] = round(60.0 / s_per_report, 2)
with open("BASELINE_MEASURED.json", "w") as f:
    json.dump(result, f, indent=2)
print(json.dumps(result, indent=2))
