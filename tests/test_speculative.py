"""Speculative greedy decoding: exact parity with the plain decode loop.

The acceptance rule makes speculative greedy provably identical to
step-by-step greedy (models/speculative.py); these tests check that claim
end-to-end on tiny models, plus the drafting and stopping edge cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import GenerationConfig, LLMConfig
from u2tokenizer_tpu.models.generate import make_generate_fn
from u2tokenizer_tpu.models.llm.decoder import CausalLM
from u2tokenizer_tpu.models.speculative import (make_spec_generate_fn,
                                                ngram_draft)


def test_ngram_draft_matches_history():
    # history: ... 5 6 7 8 9 ... then context (5, 6) again at the end
    hist = jnp.array([[1, 5, 6, 7, 8, 9, 2, 5, 6, -1, -1, -1]], jnp.int32)
    idx_last = jnp.array([8], jnp.int32)  # the trailing 6
    d = ngram_draft(hist, idx_last, jnp.array([5]), jnp.array([6]), 3)
    np.testing.assert_array_equal(np.asarray(d), [[7, 8, 9]])


def test_ngram_draft_fallback_no_match():
    hist = jnp.array([[1, 2, 3, 4, -1, -1]], jnp.int32)
    d = ngram_draft(hist, jnp.array([3], jnp.int32),
                    jnp.array([9]), jnp.array([8]), 4)
    np.testing.assert_array_equal(np.asarray(d), [[8, 8, 8, 8]])


def test_ngram_draft_excludes_self_match():
    # the context bigram itself is the only occurrence -> fallback
    hist = jnp.array([[1, 2, 5, 6, -1, -1]], jnp.int32)
    d = ngram_draft(hist, jnp.array([3], jnp.int32),
                    jnp.array([5]), jnp.array([6]), 2)
    np.testing.assert_array_equal(np.asarray(d), [[6, 6]])


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    s = 24
    # row 0: strongly periodic prompt (drafting should accept); row 1 random
    base = jnp.tile(jnp.array([7, 11, 13, 17], jnp.int32), s // 4)
    ids = jnp.stack([
        base,
        jax.random.randint(jax.random.PRNGKey(1), (s,), 0, cfg.vocab_size),
    ]).astype(jnp.int32)
    emb_init = jnp.zeros((2, s, cfg.hidden_size), jnp.float32)
    params = model.init(rng, emb_init, jnp.zeros((2, s), jnp.int32),
                        jnp.ones((1, 1, s, s), bool))
    prompt_len = jnp.array([s, s - 5], jnp.int32)
    return cfg, model, params, ids, prompt_len


def _embeds(model, params, ids, prompt_len):
    att = jnp.arange(ids.shape[1])[None, :] < prompt_len[:, None]
    return model.apply(params, ids * att, method="embed_tokens")


@pytest.mark.parametrize("cache_dtype", [jnp.float32, "int8", "int4"])
def test_spec_matches_plain_greedy(tiny_lm, cache_dtype):
    cfg, model, params, ids, prompt_len = tiny_lm
    gen = GenerationConfig(max_new_tokens=16, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids, prompt_len)
    rng = jax.random.PRNGKey(3)
    plain = np.asarray(make_generate_fn(model, gen, cache_dtype)(
        params, emb, prompt_len, rng))
    spec = np.asarray(make_spec_generate_fn(model, gen, cache_dtype,
                                            block_len=4)(
        params, emb, ids, prompt_len, rng))
    np.testing.assert_array_equal(spec, plain)


def test_spec_eos_stopping_matches(tiny_lm):
    cfg, model, params, ids, prompt_len = tiny_lm
    # pick as EOS a token the plain loop actually emits mid-stream
    probe = GenerationConfig(max_new_tokens=12, do_sample=False,
                             eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids, prompt_len)
    rng = jax.random.PRNGKey(3)
    toks = np.asarray(make_generate_fn(model, probe, jnp.float32)(
        params, emb, prompt_len, rng))
    eos = int(toks[0, 4])
    gen = GenerationConfig(max_new_tokens=12, do_sample=False,
                           eos_token_id=eos, pad_token_id=0)
    plain = np.asarray(make_generate_fn(model, gen, jnp.float32)(
        params, emb, prompt_len, rng))
    spec = np.asarray(make_spec_generate_fn(model, gen, jnp.float32,
                                            block_len=4)(
        params, emb, ids, prompt_len, rng))
    np.testing.assert_array_equal(spec, plain)
    assert (plain[0] == eos).any()  # the stop actually triggered


def test_spec_block_len_invariance(tiny_lm):
    """Output must not depend on the draft block size."""
    cfg, model, params, ids, prompt_len = tiny_lm
    gen = GenerationConfig(max_new_tokens=10, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids, prompt_len)
    rng = jax.random.PRNGKey(3)
    outs = [
        np.asarray(make_spec_generate_fn(model, gen, jnp.float32,
                                         block_len=k)(
            params, emb, ids, prompt_len, rng))
        for k in (1, 2, 6)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_spec_rejects_sampling():
    gen = GenerationConfig(max_new_tokens=4, do_sample=True,
                           eos_token_id=-2, pad_token_id=0)
    model = CausalLM(LLMConfig.tiny(), dtype=jnp.float32)
    with pytest.raises(ValueError):
        make_spec_generate_fn(model, gen)


def test_spec_multimodal_matches_plain():
    from u2tokenizer_tpu.config import U2ModelConfig
    from u2tokenizer_tpu.models.generate import make_multimodal_generate_fn
    from u2tokenizer_tpu.models.speculative import (
        make_spec_multimodal_generate_fn)
    from u2tokenizer_tpu.models.u2_model import U2CausalLM

    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    b, s = 2, 20
    d, h, w = cfg.vision.input_spatial
    images = jax.random.normal(rng, (b, cfg.num_chunks, d, h, w))
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                             cfg.llm.vocab_size).astype(jnp.int32)
    qids = jnp.ones((b, 6), jnp.int32)
    params = model.init(rng, ids, images, qids)
    prompt_len = jnp.array([s, s - 4], jnp.int32)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    plain = np.asarray(make_multimodal_generate_fn(
        model, gen, jnp.float32, jit=False)(
        params, ids, images, qids, prompt_len, jax.random.PRNGKey(3)))
    spec = np.asarray(make_spec_multimodal_generate_fn(
        model, gen, jnp.float32, block_len=4, jit=False)(
        params, ids, images, qids, prompt_len, jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(spec, plain)
