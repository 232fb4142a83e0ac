"""End-to-end smoke tests on the tiny config: shapes, jit, generate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import GenerationConfig, U2ModelConfig
from u2tokenizer_tpu.models.generate import make_multimodal_generate_fn
from u2tokenizer_tpu.models.u2_model import U2CausalLM


@pytest.fixture(scope="module")
def tiny_model():
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    b, t = 2, cfg.num_chunks
    d, h, w = cfg.vision.input_spatial
    images = jax.random.normal(rng, (b, t, d, h, w))
    input_ids = jnp.zeros((b, 24), jnp.int32)
    question_ids = jnp.ones((b, 6), jnp.int32)
    params = model.init(rng, input_ids, images, question_ids)
    return cfg, model, params, images, input_ids, question_ids


def test_forward_shapes(tiny_model):
    cfg, model, params, images, input_ids, question_ids = tiny_model
    logits, hidden, cache = model.apply(params, input_ids, images, question_ids)
    assert logits.shape == (2, 24, cfg.llm.vocab_size)
    assert hidden.shape == (2, 24, cfg.llm.hidden_size)
    assert cache is None
    assert np.isfinite(np.asarray(logits)).all()


def test_vision_token_count(tiny_model):
    cfg, model, params, images, input_ids, question_ids = tiny_model
    img_feats = model.apply(params, images, question_ids,
                            method=U2CausalLM.encode_vision)
    # u2t path aggregates to num_query_tokens
    assert img_feats.shape == (2, cfg.u2t.num_query_tokens, cfg.llm.hidden_size)


def test_splice_contract(tiny_model):
    """Image features must overwrite embedding rows [1, 1+n_img) exactly
    (reference u2_arch.py:115-116)."""
    cfg, model, params, images, input_ids, question_ids = tiny_model
    embeds = model.apply(params, input_ids,
                         method=U2CausalLM.embed_tokens)
    spliced = model.apply(params, input_ids, images, question_ids,
                          method=U2CausalLM.prepare_inputs_embeds)
    n = cfg.u2t.num_query_tokens
    assert spliced.shape == embeds.shape
    np.testing.assert_allclose(spliced[:, 0], embeds[:, 0], rtol=1e-6)
    np.testing.assert_allclose(spliced[:, 1 + n:], embeds[:, 1 + n:], rtol=1e-6)
    img = model.apply(params, images, question_ids,
                      method=U2CausalLM.encode_vision)
    np.testing.assert_allclose(spliced[:, 1:1 + n], img, rtol=1e-5, atol=1e-5)


def test_generate_greedy(tiny_model):
    cfg, model, params, images, input_ids, question_ids = tiny_model
    gen = GenerationConfig(max_new_tokens=5, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    gen_fn = make_multimodal_generate_fn(model, gen, cache_dtype=jnp.float32)
    prompt_len = jnp.array([24, 20], jnp.int32)
    toks = gen_fn(params, input_ids, images, question_ids, prompt_len,
                  jax.random.PRNGKey(1))
    assert toks.shape == (2, 5)
    assert toks.dtype == jnp.int32


def test_generate_matches_uncached_forward(tiny_model):
    """Greedy decode with the KV cache must match repeated full forwards."""
    cfg, model, params, images, input_ids, question_ids = tiny_model
    gen = GenerationConfig(max_new_tokens=4, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    gen_fn = make_multimodal_generate_fn(model, gen, cache_dtype=jnp.float32,
                                         jit=False)
    s = input_ids.shape[1]
    prompt_len = jnp.array([s, s], jnp.int32)
    toks = np.asarray(gen_fn(params, input_ids, images, question_ids,
                             prompt_len, jax.random.PRNGKey(1)))

    # Reference: full forward, append argmax, repeat (no cache).
    embeds = model.apply(params, input_ids, images, question_ids,
                         method=U2CausalLM.prepare_inputs_embeds)
    cur = embeds
    expected = []
    for _ in range(4):
        logits, _, _ = model.apply(params, cur,
                                   method=U2CausalLM.forward_embeds)
        nxt = int(np.asarray(jnp.argmax(logits[:, -1], axis=-1))[0])
        expected.append(np.asarray(jnp.argmax(logits[:, -1], axis=-1)))
        nxt_emb = model.apply(
            params, jnp.asarray(np.stack(expected[-1])[:, None]),
            method=U2CausalLM.embed_tokens)
        cur = jnp.concatenate([cur, nxt_emb], axis=1)
    expected = np.stack(expected, axis=1)
    np.testing.assert_array_equal(toks, expected)


def test_generate_single_token(tiny_model):
    """max_new_tokens=1 (the VQA choice-letter path, eval/vqa.py) runs the
    zero-iteration decode scan correctly."""
    cfg, model, params, images, input_ids, question_ids = tiny_model
    gen = GenerationConfig(max_new_tokens=1, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    gen_fn = make_multimodal_generate_fn(model, gen, cache_dtype=jnp.float32,
                                         jit=False)
    toks = gen_fn(params, input_ids, images, question_ids,
                  jnp.array([24, 20], jnp.int32), jax.random.PRNGKey(0))
    assert toks.shape == (2, 1)

    # must equal the argmax of a plain forward at the last valid position
    logits, _, _ = model.apply(params, input_ids, images, question_ids)
    assert int(toks[0, 0]) == int(jnp.argmax(logits[0, 23]))
    assert int(toks[1, 0]) == int(jnp.argmax(logits[1, 19]))


def test_decode_chunk_matches_single_program(tiny_model):
    """decode_chunk splits the decode scan into host-driven programs to
    bound single-program wall clock (the axon worker dies ≳60 s); the
    token stream must be bit-identical to the one-program path — same rng
    split sequence, same cache slots — for greedy AND sampled, and for
    chunk sizes that do and do not divide max_new_tokens-1."""
    cfg, model, params, images, input_ids, question_ids = tiny_model
    prompt_len = jnp.array([24, 20], jnp.int32)
    for do_sample in (False, True):
        gen = GenerationConfig(max_new_tokens=9, do_sample=do_sample,
                               top_p=0.9, temperature=0.7,
                               eos_token_id=-2, pad_token_id=0)
        ref_fn = make_multimodal_generate_fn(
            model, gen, cache_dtype=jnp.float32, jit=False)
        ref = np.asarray(ref_fn(params, input_ids, images, question_ids,
                                prompt_len, jax.random.PRNGKey(3)))
        for chunk in (1, 3, 4, 64):
            fn = make_multimodal_generate_fn(
                model, gen, cache_dtype=jnp.float32, decode_chunk=chunk)
            got = np.asarray(fn(params, input_ids, images, question_ids,
                                prompt_len, jax.random.PRNGKey(3)))
            np.testing.assert_array_equal(got, ref)


def test_decode_chunk_single_token(tiny_model):
    """max_new_tokens=1 with decode_chunk: zero decode chunks dispatch."""
    cfg, model, params, images, input_ids, question_ids = tiny_model
    gen = GenerationConfig(max_new_tokens=1, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    ref_fn = make_multimodal_generate_fn(model, gen, cache_dtype=jnp.float32,
                                         jit=False)
    fn = make_multimodal_generate_fn(model, gen, cache_dtype=jnp.float32,
                                     decode_chunk=8)
    args = (params, input_ids, images, question_ids,
            jnp.array([24, 20], jnp.int32), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(fn(*args)),
                                  np.asarray(ref_fn(*args)))
