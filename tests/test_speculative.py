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


def test_spec_sampling_near_zero_temperature_matches_greedy(tiny_lm):
    """Rejection sampling at temperature->0 degenerates to greedy, so the
    speculative sampler must reproduce the plain greedy tokens exactly."""
    cfg, model, params, ids, prompt_len = tiny_lm
    emb = _embeds(model, params, ids, prompt_len)
    rng = jax.random.PRNGKey(3)
    greedy_cfg = GenerationConfig(max_new_tokens=10, do_sample=False,
                                  eos_token_id=-2, pad_token_id=0)
    plain = np.asarray(make_generate_fn(model, greedy_cfg, jnp.float32)(
        params, emb, prompt_len, rng))
    samp_cfg = GenerationConfig(max_new_tokens=10, do_sample=True,
                                temperature=1e-4, top_p=1.0,
                                eos_token_id=-2, pad_token_id=0)
    spec = np.asarray(make_spec_generate_fn(model, samp_cfg, jnp.float32,
                                            block_len=4)(
        params, emb, ids, prompt_len, rng))
    np.testing.assert_array_equal(spec, plain)


@pytest.fixture(scope="module")
def micro_vocab_lm():
    """12-token vocab model: small enough support to compare empirical
    sampling distributions."""
    cfg = LLMConfig.tiny(vocab_size=12)
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    s = 8
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, s), 0,
                             cfg.vocab_size).astype(jnp.int32)
    emb_init = jnp.zeros((1, s, cfg.hidden_size), jnp.float32)
    params = model.init(rng, emb_init, jnp.zeros((1, s), jnp.int32),
                        jnp.ones((1, 1, s, s), bool))
    return cfg, model, params, ids, jnp.array([s], jnp.int32)


def test_spec_sampling_distribution_matches_plain(micro_vocab_lm):
    """Speculative sampling must emit the same distribution as plain
    sampling (trajectories differ — randomness is consumed differently —
    but per-position marginals over many seeds must agree)."""
    cfg, model, params, ids, prompt_len = micro_vocab_lm
    gen = GenerationConfig(max_new_tokens=4, do_sample=True,
                           temperature=1.3, top_p=0.8,
                           eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids, prompt_len)
    plain_fn = jax.jit(make_generate_fn(model, gen, jnp.float32))
    spec_fn = jax.jit(make_spec_generate_fn(model, gen, jnp.float32,
                                            block_len=3))
    n = 400
    plain_counts = np.zeros((4, cfg.vocab_size))
    spec_counts = np.zeros((4, cfg.vocab_size))
    for i in range(n):
        key = jax.random.PRNGKey(100 + i)
        p = np.asarray(plain_fn(params, emb, prompt_len, key))[0]
        q = np.asarray(spec_fn(params, emb, ids, prompt_len, key))[0]
        for pos in range(4):
            plain_counts[pos, p[pos]] += 1
            spec_counts[pos, q[pos]] += 1
    for pos in range(4):
        tv = 0.5 * np.abs(plain_counts[pos] / n
                          - spec_counts[pos] / n).sum()
        assert tv < 0.3, (pos, tv, plain_counts[pos], spec_counts[pos])


def test_spec_sampling_pad_after_eos(tiny_lm):
    """In sampling mode an emitted EOS must stop the row: pads after."""
    cfg, model, params, ids, prompt_len = tiny_lm
    emb = _embeds(model, params, ids, prompt_len)
    # probe a token the sampler actually emits, then make it the EOS
    gen0 = GenerationConfig(max_new_tokens=8, do_sample=True, top_p=0.9,
                            eos_token_id=-2, pad_token_id=-3)
    toks = np.asarray(make_spec_generate_fn(model, gen0, jnp.float32,
                                            block_len=4)(
        params, emb, ids, prompt_len, jax.random.PRNGKey(5)))
    eos = int(toks[0, 2])
    gen = GenerationConfig(max_new_tokens=8, do_sample=True, top_p=0.9,
                           eos_token_id=eos, pad_token_id=-3)
    toks = np.asarray(make_spec_generate_fn(model, gen, jnp.float32,
                                            block_len=4)(
        params, emb, ids, prompt_len, jax.random.PRNGKey(5)))
    for row in toks:
        hits = np.where(row == eos)[0]
        if hits.size:
            assert (row[hits[0] + 1:] == -3).all(), row


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


def test_ngram_draft_trigram_disambiguates():
    # (5, 6) appears twice with different continuations; the trigram
    # context (9, 5, 6) must select the second occurrence's continuation
    hist = jnp.array([[1, 5, 6, 7, 2, 9, 5, 6, 8, 3, 9, 5, 6, -1, -1]],
                     jnp.int32)
    idx_last = jnp.array([12], jnp.int32)
    # bigram alone: most recent (5,6) before idx_last is at 6..7 -> 8
    d2 = ngram_draft(hist, idx_last, jnp.array([5]), jnp.array([6]), 2)
    np.testing.assert_array_equal(np.asarray(d2), [[8, 3]])
    # trigram (9,5,6): matches at 5..7 -> continuation 8, 3 too — make the
    # earlier occurrence differ: context (1,5,6) -> 7, 2
    d3 = ngram_draft(hist, idx_last, jnp.array([5]), jnp.array([6]), 2,
                     c00=jnp.array([1]))
    np.testing.assert_array_equal(np.asarray(d3), [[7, 2]])
    # no trigram match -> falls back to the bigram continuation
    d3f = ngram_draft(hist, idx_last, jnp.array([5]), jnp.array([6]), 2,
                      c00=jnp.array([4]))
    np.testing.assert_array_equal(np.asarray(d3f), [[8, 3]])
