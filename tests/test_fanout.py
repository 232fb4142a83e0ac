"""Fan-out decoding (case-shared prompt prefix): parity with tiled decode.

The GREEN/DPO protocol samples num_return_sequences=8 completions from the
same prompt (green_refactored/pred_then_green.py:77). The fan-out generate
path prefills once per case and decodes all samples against a shared prefix
cache (ops/attention.gqa_sdpa_fanout). The joint softmax over
[prefix ; suffix] keys is mathematically identical to attending the tiled
concatenated cache, so greedy fan-out output must equal plain greedy on
row-tiled inputs, and sampled fan-out must match plain sampling given the
same rng consumption order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import GenerationConfig, LLMConfig, U2ModelConfig
from u2tokenizer_tpu.models.generate import (make_fanout_generate_fn,
                                             make_fanout_multimodal_generate_fn,
                                             make_generate_fn,
                                             make_multimodal_generate_fn)
from u2tokenizer_tpu.models.llm.decoder import CausalLM
from u2tokenizer_tpu.models.u2_model import U2CausalLM
from u2tokenizer_tpu.ops.attention import gqa_sdpa_fanout, gqa_sdpa_headmajor


def test_gqa_sdpa_fanout_matches_concat():
    """Joint prefix+suffix softmax == plain attention over the tiled
    concatenated cache."""
    rng = jax.random.PRNGKey(0)
    c, n, h, hkv, d, sp, st = 2, 3, 4, 2, 8, 6, 5
    b = c * n
    ks = jax.random.split(rng, 5)
    q = jax.random.normal(ks[0], (b, 1, h, d))
    pk = jax.random.normal(ks[1], (c, hkv, sp, d))
    pv = jax.random.normal(ks[2], (c, hkv, sp, d))
    sk = jax.random.normal(ks[3], (b, hkv, st, d))
    sv = jax.random.normal(ks[4], (b, hkv, st, d))
    pmask = jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    smask = jnp.broadcast_to(
        (jnp.arange(st) <= 2)[None, None, None, :], (b, 1, 1, st))

    out = gqa_sdpa_fanout(q, pk, pv, sk, sv, prefix_mask=pmask,
                          suffix_mask=smask)

    # reference: tile the prefix per sample row, concat, one softmax
    pk_t = jnp.repeat(pk, n, axis=0)
    pv_t = jnp.repeat(pv, n, axis=0)
    k_all = jnp.concatenate([pk_t, sk], axis=2)
    v_all = jnp.concatenate([pv_t, sv], axis=2)
    m_all = jnp.concatenate(
        [jnp.broadcast_to(jnp.repeat(pmask, n, axis=0)[:, None, None, :],
                          (b, 1, 1, sp)),
         smask], axis=-1)
    ref = gqa_sdpa_headmajor(q, k_all, v_all, mask=m_all)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    c, s = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (c, s), 0,
                             cfg.vocab_size).astype(jnp.int32)
    emb_init = jnp.zeros((c, s, cfg.hidden_size), jnp.float32)
    params = model.init(rng, emb_init, jnp.zeros((c, s), jnp.int32),
                        jnp.ones((1, 1, s, s), bool))
    prompt_len = jnp.array([s, s - 4], jnp.int32)
    return cfg, model, params, ids, prompt_len


def _embeds(model, params, ids, prompt_len):
    att = jnp.arange(ids.shape[1])[None, :] < prompt_len[:, None]
    return model.apply(params, ids * att, method="embed_tokens")


@pytest.mark.parametrize("cache_dtype", [jnp.float32, "int8"])
@pytest.mark.parametrize("do_sample", [False, True])
def test_fanout_matches_tiled_plain(tiny_lm, cache_dtype, do_sample):
    """fanout(C cases, n samples) == plain generate on n-tiled rows.

    Greedy: exact token equality (identical math, fp-reassociation only).
    Sampled: the rng split order matches the plain loop, so with identical
    logits the categorical draws coincide too.
    """
    cfg, model, params, ids, prompt_len = tiny_lm
    n = 3
    gen = GenerationConfig(max_new_tokens=8, do_sample=do_sample, top_p=0.9,
                           eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids, prompt_len)
    rng = jax.random.PRNGKey(7)

    fan = np.asarray(make_fanout_generate_fn(model, gen, n, cache_dtype)(
        params, emb, prompt_len, rng))

    emb_t = jnp.repeat(emb, n, axis=0)
    plen_t = jnp.repeat(prompt_len, n, axis=0)
    plain = np.asarray(make_generate_fn(model, gen, cache_dtype)(
        params, emb_t, plen_t, rng))

    assert fan.shape == (2 * n, 8)
    np.testing.assert_array_equal(fan, plain)


def test_fanout_eos_stops_rows(tiny_lm):
    """Rows that emit EOS keep padding afterwards, same as the plain loop."""
    cfg, model, params, ids, prompt_len = tiny_lm
    n = 2
    emb = _embeds(model, params, ids, prompt_len)
    # find the greedy continuation and set eos to its second token so the
    # fan-out loop must stop after two emissions
    probe = GenerationConfig(max_new_tokens=4, do_sample=False,
                             eos_token_id=-2, pad_token_id=0)
    toks = np.asarray(make_generate_fn(model, probe, jnp.float32)(
        params, emb, prompt_len, jax.random.PRNGKey(0)))
    eos = int(toks[0, 1])
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           eos_token_id=eos, pad_token_id=0)
    fan = np.asarray(make_fanout_generate_fn(model, gen, n, jnp.float32)(
        params, emb, prompt_len, jax.random.PRNGKey(0)))
    row = fan[0]
    stop = int(np.argmax(row == eos))
    assert (row[stop + 1:] == 0).all()


@pytest.mark.parametrize("cache_dtype", [jnp.float32, "int8"])
def test_spec_fanout_matches_plain_greedy(tiny_lm, cache_dtype):
    """Speculative fan-out (case-shared prompt KV + per-row suffix cache,
    verify blocks through the joint-softmax path) keeps the speculative
    contract: greedy output bit-identical to the PLAIN greedy loop on
    n-tiled rows."""
    from u2tokenizer_tpu.models.speculative import make_spec_generate_fn

    cfg, model, params, ids, prompt_len = tiny_lm
    n = 3
    gen = GenerationConfig(max_new_tokens=12, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids, prompt_len)
    rng = jax.random.PRNGKey(11)

    spec_fan = np.asarray(
        make_spec_generate_fn(model, gen, cache_dtype, fanout=n)(
            params, emb, ids, prompt_len, rng))

    plain = np.asarray(
        make_generate_fn(model, gen, cache_dtype)(
            params, jnp.repeat(emb, n, axis=0),
            jnp.repeat(prompt_len, n, axis=0), rng))
    np.testing.assert_array_equal(spec_fan, plain)


def test_spec_fanout_sampled_distribution_path(tiny_lm):
    """Sampled speculative fan-out runs and rows draw independently;
    stats counter returns verify-step count."""
    from u2tokenizer_tpu.models.speculative import make_spec_generate_fn

    cfg, model, params, ids, prompt_len = tiny_lm
    n = 4
    gen = GenerationConfig(max_new_tokens=10, do_sample=True, top_p=0.9,
                           eos_token_id=-2, pad_token_id=0)
    emb = _embeds(model, params, ids, prompt_len)
    toks, steps = make_spec_generate_fn(
        model, gen, jnp.float32, fanout=n, return_stats=True)(
        params, emb, ids, prompt_len, jax.random.PRNGKey(13))
    toks = np.asarray(toks)
    assert toks.shape == (2 * n, 10)
    assert int(np.asarray(steps)) >= 1
    assert (toks[0] != toks[1]).any() or (toks[1] != toks[2]).any()


def test_fanout_multimodal_smoke():
    """End-to-end: vision encode + prefill once per case, decode fans out."""
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    c, t = 2, cfg.num_chunks
    d, h, w = cfg.vision.input_spatial
    images = jax.random.normal(rng, (c, t, d, h, w))
    input_ids = jnp.zeros((c, 24), jnp.int32)
    question_ids = jnp.ones((c, 6), jnp.int32)
    params = model.init(rng, input_ids, images, question_ids)
    prompt_len = jnp.array([24, 20], jnp.int32)
    n = 4
    gen = GenerationConfig(max_new_tokens=5, do_sample=True, top_p=0.9,
                           eos_token_id=-2, pad_token_id=0)
    fan_fn = make_fanout_multimodal_generate_fn(
        model, gen, n, cache_dtype=jnp.float32, jit=False)
    toks = np.asarray(fan_fn(params, input_ids, images, question_ids,
                             prompt_len, jax.random.PRNGKey(3)))
    assert toks.shape == (c * n, 5)
    # sample rows of a case share the prompt but draw independently:
    # at least one position should differ between two samples of case 0
    # (tiny random model => near-uniform logits)
    assert (toks[0] != toks[1]).any() or (toks[1] != toks[2]).any()

    # parity against the tiled plain multimodal path with the same rng
    plain_fn = make_multimodal_generate_fn(model, gen,
                                           cache_dtype=jnp.float32, jit=False)
    plain = np.asarray(plain_fn(
        params, jnp.repeat(input_ids, n, axis=0),
        jnp.repeat(images, n, axis=0), jnp.repeat(question_ids, n, axis=0),
        jnp.repeat(prompt_len, n, axis=0), jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(toks, plain)
