"""Shared-prefix two-phase prefill: parity with one-shot prefill.

The GREEN judge scores 8 candidates against one reference per case
(green_refactored/pred_then_green.py:105-137); their prompts share the
[template ; reference report] token prefix. generate.shared_prefix_prefill
prefills the shared prefix once per group and continuation-prefills the
per-row tails — the cache and first sampled position must equal the
one-shot prefill's exactly (float caches), so the plain AND speculative
decode loops produce identical tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import GenerationConfig, LLMConfig
from u2tokenizer_tpu.models.generate import make_generate_fn
from u2tokenizer_tpu.models.llm.decoder import CausalLM
from u2tokenizer_tpu.models.speculative import make_spec_generate_fn


@pytest.fixture(scope="module")
def grouped_lm():
    """2 cases x 3 rows; within a case, rows share the first SPLIT tokens
    and differ afterwards, with unequal prompt lengths (right-padded)."""
    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    n, c, s, split = 3, 2, 24, 12
    b = c * n
    rng = jax.random.PRNGKey(0)
    shared = jax.random.randint(jax.random.PRNGKey(1), (c, split), 0,
                                cfg.vocab_size)
    tails = jax.random.randint(jax.random.PRNGKey(2), (b, s - split), 0,
                               cfg.vocab_size)
    ids = jnp.concatenate(
        [jnp.repeat(shared, n, axis=0), tails], axis=1).astype(jnp.int32)
    prompt_len = jnp.array([24, 20, 18, 24, 22, 16], jnp.int32)
    # zero out pad columns so embeds are identical across paths
    att = jnp.arange(s)[None, :] < prompt_len[:, None]
    ids = ids * att
    emb0 = jnp.zeros((b, s, cfg.hidden_size), jnp.float32)
    params = model.init(rng, emb0, jnp.zeros((b, s), jnp.int32),
                        jnp.tril(jnp.ones((s, s), bool))[None, None])
    return cfg, model, params, ids, prompt_len, n, split


def _embeds(model, params, ids):
    return model.apply(params, ids, method="embed_tokens")


@pytest.mark.parametrize("cache_dtype", [jnp.float32, "int8"])
@pytest.mark.parametrize("do_sample", [False, True])
def test_shared_prefix_matches_oneshot(grouped_lm, cache_dtype, do_sample):
    cfg, model, params, ids, prompt_len, n, split = grouped_lm
    gen = GenerationConfig(max_new_tokens=8, do_sample=do_sample, top_p=0.9,
                           eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids)
    rng = jax.random.PRNGKey(5)

    plain = np.asarray(make_generate_fn(model, gen, cache_dtype)(
        params, emb, prompt_len, rng))
    shared = np.asarray(
        make_generate_fn(model, gen, cache_dtype,
                         shared_prefix=(n, split))(
            params, emb, prompt_len, rng))
    np.testing.assert_array_equal(shared, plain)


def test_shared_prefix_speculative_greedy(grouped_lm):
    """Speculative decode on a shared-prefix prefill: bit-identical to the
    plain greedy loop (the spec contract) AND to spec without sharing."""
    cfg, model, params, ids, prompt_len, n, split = grouped_lm
    gen = GenerationConfig(max_new_tokens=10, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids)
    rng = jax.random.PRNGKey(5)

    plain = np.asarray(make_generate_fn(model, gen, jnp.float32)(
        params, emb, prompt_len, rng))
    spec = np.asarray(make_spec_generate_fn(model, gen, jnp.float32)(
        params, emb, ids, prompt_len, rng))
    spec_shared = np.asarray(
        make_spec_generate_fn(model, gen, jnp.float32,
                              shared_prefix=(n, split))(
            params, emb, ids, prompt_len, rng))
    np.testing.assert_array_equal(spec, plain)
    np.testing.assert_array_equal(spec_shared, plain)


def test_jax_judge_share_prefix_identical():
    """JaxJudge with share_prefix produces exactly the share_prefix=False
    outputs on a grouped batch (one reference, several candidates)."""
    from u2tokenizer_tpu.eval.green import JaxJudge

    class _Tok:
        eos_token_id = 2
        pad_token_id = 0
        eos_token = "</s>"

        def __call__(self, text):
            # deterministic toy tokenizer: bytes -> small vocab ids
            return {"input_ids": [3 + (b % 60) for b in text.encode()]}

        def decode(self, toks, skip_special_tokens=True):
            return " ".join(str(t) for t in toks)

    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    emb0 = jnp.zeros((1, 8, cfg.hidden_size), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), emb0,
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.tril(jnp.ones((8, 8), bool))[None, None])
    ref = ("The lungs are clear without focal consolidation. " * 40)
    prompts = [f"TEMPLATE {ref} CANDIDATE {i}: some differing finding {i}"
               for i in range(4)]

    outs = {}
    for share in (False, True):
        judge = JaxJudge(model, params, _Tok(), batch_size=4,
                         max_length=640, max_new_tokens=6,
                         chat_format=False, speculative=True,
                         share_prefix=share)
        outs[share] = judge(prompts)
    assert outs[True] == outs[False]
    # the grouped batch actually took the shared path (split > 0 compiled)
    judge = JaxJudge(model, params, _Tok(), batch_size=4, max_length=640,
                     max_new_tokens=6, chat_format=False, speculative=True)
    judge(prompts)
    assert any(split > 0 for (_, split) in judge._gen_cache)


def test_jax_judge_share_prefix_empty_prompt():
    """A batch containing an empty tokenization (width 0) must clamp the
    shared split to 0, not -256 (regression: min(lcp, width-1)//256*256
    went negative and compiled a bogus shared-prefix decode)."""
    from u2tokenizer_tpu.eval.green import JaxJudge

    class _Tok:
        eos_token_id = 2
        pad_token_id = 0
        eos_token = "</s>"

        def __call__(self, text):
            return {"input_ids": [3 + (b % 60) for b in text.encode()]}

        def decode(self, toks, skip_special_tokens=True):
            return " ".join(str(t) for t in toks)

    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    emb0 = jnp.zeros((1, 8, cfg.hidden_size), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), emb0,
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.tril(jnp.ones((8, 8), bool))[None, None])
    judge = JaxJudge(model, params, _Tok(), batch_size=2, max_length=64,
                     max_new_tokens=4, chat_format=False,
                     share_prefix=True)
    outs = judge(["", "some finding"])
    assert len(outs) == 2
    assert all(split == 0 for (_, split) in judge._gen_cache)


@pytest.mark.parametrize("cache_dtype", [jnp.float32, "int8"])
def test_fanout_split_speculative_greedy(grouped_lm, cache_dtype):
    """fanout_split: the shared split lives in a per-CASE prefix cache
    (streamed once per case at decode via gqa_sdpa_fanout) and the per-row
    suffix cache holds only [prompt tail ; generated] — bit-identical to
    the plain greedy loop, with the shared keys never duplicated (unlike
    shared_prefix=, which tiles them back into full-size caches)."""
    cfg, model, params, ids, prompt_len, n, split = grouped_lm
    gen = GenerationConfig(max_new_tokens=10, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids)
    rng = jax.random.PRNGKey(5)

    plain = np.asarray(make_generate_fn(model, gen, cache_dtype)(
        params, emb, prompt_len, rng))
    fan = np.asarray(make_spec_generate_fn(
        model, gen, cache_dtype, fanout_split=(n, split))(
        params, emb, ids, prompt_len, rng))
    np.testing.assert_array_equal(fan, plain)


def test_fanout_split_chunked_tail_prefill():
    """A tail long enough to trigger the chunked phase-2 prefill (s2=64 ->
    two 32-token chunks) still matches the one-shot plain loop."""
    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    n, c, split = 2, 2, 12
    b, s = c * n, 76  # s2 = 64
    shared = jax.random.randint(jax.random.PRNGKey(1), (c, split), 0,
                                cfg.vocab_size)
    tails = jax.random.randint(jax.random.PRNGKey(2), (b, s - split), 0,
                               cfg.vocab_size)
    ids = jnp.concatenate(
        [jnp.repeat(shared, n, axis=0), tails], axis=1).astype(jnp.int32)
    prompt_len = jnp.array([76, 60, 44, 70], jnp.int32)
    ids = ids * (jnp.arange(s)[None, :] < prompt_len[:, None])
    emb0 = jnp.zeros((b, s, cfg.hidden_size), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), emb0,
                        jnp.zeros((b, s), jnp.int32),
                        jnp.tril(jnp.ones((s, s), bool))[None, None])
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids)
    rng = jax.random.PRNGKey(5)
    plain = np.asarray(make_generate_fn(model, gen, jnp.float32)(
        params, emb, prompt_len, rng))
    fan = np.asarray(make_spec_generate_fn(
        model, gen, jnp.float32, fanout_split=(n, split))(
        params, emb, ids, prompt_len, rng))
    np.testing.assert_array_equal(fan, plain)
