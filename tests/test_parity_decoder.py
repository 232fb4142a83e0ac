"""Decoder parity vs. HF transformers (tiny random-weight models as oracle).

Validates the full decoder semantics — RMSNorm, GQA+RoPE (+Qwen3 q/k norm),
SwiGLU, tied/untied lm_head — and the weight converter, for all three
families the reference wraps (u2llama.py / u2phi3.py / u2qwen3.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # golden-parity vs the torch/HF oracle
import torch

from u2tokenizer_tpu.config import LLMConfig
from u2tokenizer_tpu.models.hf_weights import convert_decoder, llm_config_from_hf
from u2tokenizer_tpu.models.llm.decoder import CausalLM


def _hf_tiny(family):
    if family == "qwen3":
        from transformers import Qwen3Config, Qwen3ForCausalLM
        cfg = Qwen3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, rope_theta=10000.0, rms_norm_eps=1e-6,
            tie_word_embeddings=True, max_position_embeddings=256)
        return Qwen3ForCausalLM(cfg), cfg
    if family == "llama":
        from transformers import LlamaConfig, LlamaForCausalLM
        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-5,
            tie_word_embeddings=False, max_position_embeddings=256,
            attention_bias=False)
        return LlamaForCausalLM(cfg), cfg
    if family == "phi2":
        from transformers import PhiConfig, PhiForCausalLM
        cfg = PhiConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            partial_rotary_factor=0.5, rope_theta=10000.0,
            layer_norm_eps=1e-5, tie_word_embeddings=False,
            max_position_embeddings=256, pad_token_id=0)
        return PhiForCausalLM(cfg), cfg
    if family == "phi3":
        from transformers import Phi3Config, Phi3ForCausalLM
        cfg = Phi3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            rope_theta=10000.0, rms_norm_eps=1e-5,
            tie_word_embeddings=False, max_position_embeddings=256,
            pad_token_id=0)
        return Phi3ForCausalLM(cfg), cfg
    raise ValueError(family)


@pytest.mark.parametrize("family", ["qwen3", "llama", "phi3", "phi2"])
def test_decoder_logits_parity(family):
    torch.manual_seed(0)
    hf_model, hf_cfg = _hf_tiny(family)
    hf_model.eval()

    cfg = llm_config_from_hf(hf_cfg)
    assert cfg.model_type == family
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = {"params": convert_decoder(sd, cfg)}

    model = CausalLM(cfg, dtype=jnp.float32)
    ids = torch.randint(0, 128, (2, 12), generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = hf_model(ids).logits.numpy()

    ids_j = jnp.asarray(ids.numpy())
    embeds = model.apply(params, ids_j, method=CausalLM.embed_tokens)
    s = ids_j.shape[1]
    positions = jnp.broadcast_to(jnp.arange(s), (2, s))
    mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
    logits, _, _ = model.apply(params, embeds, positions, mask)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("family", ["qwen3", "llama"])
def test_decoder_gradient_parity(family):
    """Training-path parity vs HF autograd: d(loss)/d(inputs_embeds) and
    every parameter gradient (pushed through the same HF->flax converter,
    whose ops are all linear and index-preserving) must match. SFT/DPO and
    (Q)LoRA train through this stack, so the backward is load-bearing."""
    import jax

    torch.manual_seed(0)
    hf_model, hf_cfg = _hf_tiny(family)
    hf_model.eval()
    cfg = llm_config_from_hf(hf_cfg)
    sd = {k: v.detach().numpy().copy()
          for k, v in hf_model.state_dict().items()}
    params = {"params": convert_decoder(sd, cfg)}
    model = CausalLM(cfg, dtype=jnp.float32)

    g = torch.Generator().manual_seed(2)
    b, s = 2, 12
    emb_t = torch.randn(b, s, hf_cfg.hidden_size, generator=g) * 0.1
    emb_t.requires_grad_(True)
    w = torch.randn(b, s, hf_cfg.vocab_size, generator=g)
    (hf_model(inputs_embeds=emb_t).logits * w).sum().backward()
    ref_demb = emb_t.grad.numpy()
    grad_sd = {k: (p.grad if p.grad is not None
                   else torch.zeros_like(p)).numpy().copy()
               for k, p in hf_model.named_parameters()}
    # state_dict keys not in named_parameters (tied weights alias): map
    # them to the named parameter they alias
    for k in sd:
        if k not in grad_sd:
            base = k.replace("lm_head.weight", "model.embed_tokens.weight")
            grad_sd[k] = grad_sd[base]
    ref_grads = convert_decoder(grad_sd, cfg)

    positions = jnp.broadcast_to(jnp.arange(s), (b, s))
    mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
    wj = jnp.asarray(w.numpy())

    def loss(p, emb):
        logits, _, _ = model.apply(p, emb, positions, mask)
        return (logits * wj).sum()

    gp, demb = jax.grad(loss, argnums=(0, 1))(
        params, jnp.asarray(emb_t.detach().numpy()))
    np.testing.assert_allclose(np.asarray(demb), ref_demb,
                               rtol=2e-4, atol=2e-4)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(ref_grads))
    flat_g = jax.tree_util.tree_leaves_with_path(gp["params"])
    assert flat_g and len(flat_g) == len(flat_r)
    for path, gr in flat_g:
        r = np.asarray(flat_r[path])
        scale = max(1.0, float(np.abs(r).max()))
        np.testing.assert_allclose(
            np.asarray(gr), r, rtol=0, atol=2e-4 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_decoder_cache_consistency():
    """Cached decode must equal the uncached forward at every position."""
    import jax

    cfg = LLMConfig.tiny(vocab_size=64)
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    s = 10
    ids = jax.random.randint(rng, (1, s), 0, 64)
    positions = jnp.broadcast_to(jnp.arange(s), (1, s))
    mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
    embeds_fn = lambda p, i: model.apply(p, i, method=CausalLM.embed_tokens)
    params = model.init(rng, embeds_fn({}, ids) if False else jnp.zeros((1, s, cfg.hidden_size)), positions, mask)
    embeds = embeds_fn(params, ids)
    full_logits, _, _ = model.apply(params, embeds, positions, mask)

    from u2tokenizer_tpu.models.llm.decoder import KVCache
    cache = KVCache.create(cfg, 1, s, dtype=jnp.float32)
    # prefill first 4
    pre = 4
    logits_p, _, cache = model.apply(
        params, embeds[:, :pre], positions[:, :pre],
        jnp.tril(jnp.ones((pre, pre), bool))[None, None], cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full_logits[:, :pre]),
                               rtol=1e-5, atol=1e-5)
    # decode the rest one-by-one
    kv_pos = jnp.arange(s)
    for t in range(pre, s):
        step_mask = (kv_pos <= t)[None, None, None, :]
        logits_t, _, cache = model.apply(
            params, embeds[:, t:t + 1], positions[:, t:t + 1],
            step_mask, cache, jnp.int32(t))
        np.testing.assert_allclose(
            np.asarray(logits_t[:, 0]), np.asarray(full_logits[:, t]),
            rtol=1e-5, atol=1e-5)


def test_int8_cache_decode_close_to_fp32():
    """Quantized-cache decode must track the exact decode closely (int8
    per-row symmetric quantization)."""
    import jax

    from u2tokenizer_tpu.models.llm.decoder import KVCache

    cfg = LLMConfig.tiny(vocab_size=64)
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    s = 12
    ids = jax.random.randint(rng, (1, s), 0, 64)
    positions = jnp.broadcast_to(jnp.arange(s), (1, s))
    params = model.init(rng, jnp.zeros((1, s, cfg.hidden_size)), positions,
                        jnp.tril(jnp.ones((s, s), bool))[None, None])
    embeds = model.apply(params, ids, method=CausalLM.embed_tokens)

    def run(dtype):
        cache = KVCache.create(cfg, 1, s, dtype=dtype)
        pre = 6
        _, _, cache = model.apply(
            params, embeds[:, :pre], positions[:, :pre],
            jnp.tril(jnp.ones((pre, pre), bool))[None, None], cache,
            jnp.int32(0))
        outs = []
        kv_pos = jnp.arange(s)
        for t in range(pre, s):
            logits_t, _, cache = model.apply(
                params, embeds[:, t:t + 1], positions[:, t:t + 1],
                (kv_pos <= t)[None, None, None, :], cache, jnp.int32(t))
            outs.append(np.asarray(logits_t[:, 0]))
        return np.stack(outs)

    exact = run(jnp.float32)
    quant = run("int8")
    # logits track closely; greedy tokens identical for this model
    assert np.abs(exact - quant).max() < 0.15 * np.abs(exact).max()
    np.testing.assert_array_equal(exact.argmax(-1), quant.argmax(-1))
