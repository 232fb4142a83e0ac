"""Vocab-resize + adapter-subset tests (initialize_vision_tokenizer parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from u2tokenizer_tpu.config import LLMConfig, U2ModelConfig
from u2tokenizer_tpu.models.llm.decoder import CausalLM
from u2tokenizer_tpu.models.u2_model import U2CausalLM
from u2tokenizer_tpu.models.vocab import (
    extract_adapter_params,
    merge_adapter_params,
    resize_token_embeddings,
    resized_config,
)


def _tiny_params(tie=True):
    cfg = LLMConfig.tiny(vocab_size=64)
    if not tie:
        import dataclasses
        cfg = dataclasses.replace(cfg, tie_word_embeddings=False)
    model = CausalLM(cfg, dtype=jnp.float32)
    s = 6
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, s, cfg.hidden_size)),
                        jnp.zeros((1, s), jnp.int32),
                        jnp.tril(jnp.ones((s, s), bool))[None, None])
    return cfg, model, params


def test_resize_grows_with_mean_init():
    cfg, model, params = _tiny_params(tie=False)
    embed_before = np.asarray(params["params"]["model"]["embed_tokens"]).copy()
    head_before = np.asarray(params["params"]["lm_head"]["kernel"]).copy()

    params = resize_token_embeddings(params, 68)  # +4 tokens
    embed = np.asarray(params["params"]["model"]["embed_tokens"])
    head = np.asarray(params["params"]["lm_head"]["kernel"])
    assert embed.shape == (68, cfg.hidden_size)
    assert head.shape == (cfg.hidden_size, 68)
    np.testing.assert_array_equal(embed[:64], embed_before)
    np.testing.assert_array_equal(head[:, :64], head_before)
    # new rows = mean of old (u2_arch.py:124-133)
    np.testing.assert_allclose(embed[64:],
                               np.repeat(embed_before.mean(0, keepdims=True),
                                         4, axis=0), rtol=1e-6)
    np.testing.assert_allclose(head[:, 64:],
                               np.repeat(head_before.mean(1, keepdims=True),
                                         4, axis=1), rtol=1e-6)

    # model forward works at the resized vocab
    import dataclasses
    cfg2 = dataclasses.replace(cfg, vocab_size=68)
    model2 = CausalLM(cfg2, dtype=jnp.float32)
    s = 6
    logits, _, _ = model2.apply(
        params, jnp.zeros((1, s, cfg.hidden_size)),
        jnp.zeros((1, s), jnp.int32),
        jnp.tril(jnp.ones((s, s), bool))[None, None])
    assert logits.shape[-1] == 68


def test_resize_tied_and_noop():
    cfg, model, params = _tiny_params(tie=True)
    same = resize_token_embeddings(params, 64)
    assert np.asarray(same["params"]["model"]["embed_tokens"]).shape[0] == 64
    grown = resize_token_embeddings(params, 70)
    assert np.asarray(grown["params"]["model"]["embed_tokens"]).shape[0] == 70
    assert resized_config(U2ModelConfig.tiny(), 70).llm.vocab_size == 70


def test_adapter_extract_and_merge():
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    d, h, w = cfg.vision.input_spatial
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 8), jnp.int32),
                        jax.random.normal(rng, (1, cfg.num_chunks, d, h, w)),
                        jnp.ones((1, 4), jnp.int32))
    adapter = extract_adapter_params(params)
    assert adapter, "no adapter params found"
    assert all(("mm_projector" in k) or ("embed_tokens" in k) for k in adapter)

    # perturb adapter, merge back, verify only those leaves changed
    perturbed = {k: v + 1.0 for k, v in adapter.items()}
    merged = merge_adapter_params(params, perturbed)
    q_before = np.asarray(params["params"]["u2tokenizer"]["query_tokens"])
    q_after = np.asarray(merged["params"]["u2tokenizer"]["query_tokens"])
    np.testing.assert_array_equal(q_before, q_after)
    emb_after = np.asarray(merged["params"]["llm"]["model"]["embed_tokens"])
    emb_orig = np.asarray(params["params"]["llm"]["model"]["embed_tokens"])
    np.testing.assert_allclose(emb_after, emb_orig + 1.0, rtol=1e-6)
