"""Content-realistic speculative benchmarking pieces: synthetic report
corpus, drafter-exact acceptance simulation, and the forced-content decode
mode (compute-identical content control for honest acceptance numbers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import GenerationConfig, LLMConfig
from u2tokenizer_tpu.data.synthetic_reports import (
    ngram_acceptance_estimate,
    report_token_scripts,
    synthesize_report,
    words_to_ids,
)
from u2tokenizer_tpu.models.llm.decoder import CausalLM
from u2tokenizer_tpu.models.speculative import make_spec_generate_fn


def test_synthetic_reports_are_template_heavy_but_varied():
    import random

    rng = random.Random(0)
    reports = [synthesize_report(rng) for _ in range(8)]
    assert len(set(reports)) == 8  # varied
    # template-heavy: common radiology vocabulary recurs across cases
    joined = " ".join(reports)
    assert joined.count(" is ") > 10
    for r in reports:
        assert r.endswith(".") and len(r.split()) > 40


def test_word_ids_deterministic_and_in_range():
    ids = words_to_ids("the liver is normal the liver", 1000)
    assert ids.shape == (6,)
    assert (ids >= 16).all() and (ids < 1000).all()
    assert ids[0] == ids[4] and ids[1] == ids[5]  # same word, same id


def test_scripts_shape_and_acceptance_beats_random():
    """Report scripts must show materially higher n-gram acceptance than
    random token streams — the whole point of content-realistic benching."""
    v = 5000
    scripts = report_token_scripts(2, 256, v, seed=0)
    assert scripts.shape == (2, 256)
    acc_reports = ngram_acceptance_estimate(scripts, block_len=8)
    random_scripts = np.random.default_rng(0).integers(
        16, v, (2, 256)).astype(np.int32)
    acc_random = ngram_acceptance_estimate(random_scripts, block_len=8)
    assert acc_random < 1.2  # no structure -> ~1 token/step
    assert acc_reports > acc_random + 0.2  # templates draft ahead


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    s = 12
    emb_init = jnp.zeros((1, s, cfg.hidden_size), jnp.float32)
    params = model.init(rng, emb_init, jnp.zeros((1, s), jnp.int32),
                        jnp.ones((1, 1, s, s), bool))
    return cfg, model, params


def test_forced_content_emits_script_and_counts_steps(tiny_lm):
    """forced_content=True: output == script, and the verify-step count
    equals the drafter-exact simulation on the same (prompt, script).
    b=1 because the loop's global step count is the max over rows."""
    cfg, model, params = tiny_lm
    b, s, max_new = 1, 12, 48
    script = report_token_scripts(b, max_new + 8, cfg.vocab_size, seed=1)
    prompt = np.tile(np.arange(1, s + 1, dtype=np.int32), (b, 1))
    gen = GenerationConfig(max_new_tokens=max_new, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    gen_fn = make_spec_generate_fn(model, gen, cache_dtype=jnp.float32,
                                   return_stats=True, forced_content=True)
    embeds = model.apply(params, jnp.asarray(prompt), method="embed_tokens")
    toks, steps = gen_fn(params, embeds, jnp.asarray(prompt),
                         jnp.full((b,), s, jnp.int32), jax.random.PRNGKey(0),
                         jnp.asarray(script))
    np.testing.assert_array_equal(np.asarray(toks), script[:, :max_new])

    sim_acc = ngram_acceptance_estimate(script[:, :max_new], block_len=8,
                                        prompt=prompt)
    sim_steps = round((max_new - 1) / sim_acc)
    assert int(np.asarray(steps)) == sim_steps


def test_forced_content_sampled_emits_script_and_counts_steps(tiny_lm):
    """forced_content with do_sample=True: emitted tokens are the script,
    acceptance is content-driven (draft==script), and the step count equals
    the drafter-exact simulation — the sampled-serving cost model with
    controlled content."""
    cfg, model, params = tiny_lm
    b, s, max_new = 1, 12, 48
    script = report_token_scripts(b, max_new + 8, cfg.vocab_size, seed=3)
    prompt = np.tile(np.arange(1, s + 1, dtype=np.int32), (b, 1))
    gen = GenerationConfig(max_new_tokens=max_new, do_sample=True,
                           top_p=0.9, temperature=0.8,
                           eos_token_id=-2, pad_token_id=0)
    gen_fn = make_spec_generate_fn(model, gen, cache_dtype=jnp.float32,
                                   return_stats=True, forced_content=True)
    embeds = model.apply(params, jnp.asarray(prompt), method="embed_tokens")
    toks, steps = gen_fn(params, embeds, jnp.asarray(prompt),
                         jnp.full((b,), s, jnp.int32), jax.random.PRNGKey(0),
                         jnp.asarray(script))
    np.testing.assert_array_equal(np.asarray(toks), script[:, :max_new])

    from u2tokenizer_tpu.data.synthetic_reports import (
        ngram_acceptance_estimate)
    sim_acc = ngram_acceptance_estimate(script[:, :max_new], block_len=8,
                                        prompt=prompt)
    sim_steps = round((max_new - 1) / sim_acc)
    assert int(np.asarray(steps)) == sim_steps


def test_forced_content_multimodal_wrapper():
    from u2tokenizer_tpu.config import U2ModelConfig
    from u2tokenizer_tpu.models.speculative import (
        make_spec_multimodal_generate_fn)
    from u2tokenizer_tpu.models.u2_model import U2CausalLM

    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    b, s, max_new = 1, 16, 16
    images = jax.random.normal(rng, (b, cfg.num_chunks, d, h, w))
    ids = jnp.ones((b, s), jnp.int32)
    qids = jnp.ones((b, 4), jnp.int32)
    params = model.init(rng, ids, images, qids)
    script = report_token_scripts(b, max_new + 8, cfg.llm.vocab_size, seed=2)
    gen = GenerationConfig(max_new_tokens=max_new, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    gen_fn = make_spec_multimodal_generate_fn(
        model, gen, cache_dtype=jnp.float32, jit=False, return_stats=True,
        forced_content=True)
    toks, steps = gen_fn(params, ids, images, qids,
                         jnp.full((b,), s, jnp.int32),
                         jax.random.PRNGKey(1), jnp.asarray(script))
    np.testing.assert_array_equal(np.asarray(toks), script[:, :max_new])
    assert 1 <= int(np.asarray(steps)) <= max_new
