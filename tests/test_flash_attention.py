"""Flash-attention kernel tests (pallas interpret mode vs XLA SDPA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.ops.attention import gqa_sdpa, sdpa
from u2tokenizer_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_sdpa(causal):
    b, sq, h, d = 2, 128, 4, 32
    q, k, v = _rand((b, sq, h, d), 0), _rand((b, sq, h, d), 1), _rand((b, sq, h, d), 2)
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((sq, sq), bool))[None, None]
    ref = sdpa(q, k, v, mask=mask)
    out = flash_attention(q, k, v, causal=causal, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_gqa_and_lengths():
    b, sq, h, hkv, d = 2, 128, 8, 2, 32
    q = _rand((b, sq, h, d), 0)
    k = _rand((b, sq, hkv, d), 1)
    v = _rand((b, sq, hkv, d), 2)
    lens = jnp.array([100, 64], jnp.int32)
    key_ok = jnp.arange(sq)[None, :] < lens[:, None]
    mask = key_ok[:, None, None, :] & jnp.tril(jnp.ones((sq, sq), bool))[None, None]
    ref = gqa_sdpa(q, k, v, mask=mask)
    out = flash_attention(q, k, v, lens, causal=True, block_q=128,
                          interpret=True)
    # rows beyond each prompt are don't-care; compare valid rows only
    for i, l in enumerate([100, 64]):
        np.testing.assert_allclose(np.asarray(out)[i, :l],
                                   np.asarray(ref)[i, :l],
                                   rtol=2e-5, atol=2e-5)


def test_flash_unaligned_seq():
    """Sq=129 (the ViT's 2049-style off-by-one) must pad and unpad cleanly."""
    b, sq, h, d = 1, 129, 2, 32
    q, k, v = _rand((b, sq, h, d), 0), _rand((b, sq, h, d), 1), _rand((b, sq, h, d), 2)
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, block_q=128, interpret=True)
    assert out.shape == (b, sq, h, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_gradients_match():
    b, sq, h, d = 1, 64, 2, 16
    q, k, v = _rand((b, sq, h, d), 0), _rand((b, sq, h, d), 1), _rand((b, sq, h, d), 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, interpret=True) ** 2)

    def loss_ref(q, k, v):
        mask = jnp.tril(jnp.ones((sq, sq), bool))[None, None]
        return jnp.sum(sdpa(q, k, v, mask=mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_pallas_bwd_gqa_lens(causal):
    """The Pallas backward (interpret mode) must match the dense XLA vjp
    on the training shape class: GQA heads, unequal right-padded lengths,
    unaligned Sq (exercises q/kv padding in all three bwd kernels)."""
    b, sq, h, hkv, d = 2, 130, 4, 2, 32
    q = _rand((b, sq, h, d), 3)
    k = _rand((b, sq, hkv, d), 4)
    v = _rand((b, sq, hkv, d), 5)
    lens = jnp.array([130, 77], jnp.int32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, lens, causal=causal, block_q=128,
                              interpret=True)
        # weight rows so padded-row don't-cares drop out of the loss
        w = (jnp.arange(sq)[None, :] < lens[:, None]).astype(jnp.float32)
        return jnp.sum((out * w[:, :, None, None]) ** 2)

    def loss_ref(q, k, v):
        from u2tokenizer_tpu.ops.attention import gqa_sdpa

        key_ok = jnp.arange(sq)[None, :] < lens[:, None]
        mask = key_ok[:, None, None, :]
        if causal:
            mask = mask & jnp.tril(jnp.ones((sq, sq), bool))[None, None]
        out = gqa_sdpa(q, k, v, mask=mask)
        w = (jnp.arange(sq)[None, :] < lens[:, None]).astype(jnp.float32)
        return jnp.sum((out * w[:, :, None, None]) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("qdt", ["int8", "int4"])
def test_decode_attention_quantized_matches_reference(qdt):
    """Fused quantized decode kernel (interpret mode) vs the XLA
    quantized-GQA reference with the two-interval decode mask, for both
    cache dtypes the kernel accepts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from u2tokenizer_tpu.ops.attention import quantize_kv
    from u2tokenizer_tpu.ops.decode_attention import (_reference,
                                                      decode_attention_int8)

    b, sk, h, hkv, d = 2, 64, 4, 2, 32
    s_prompt = 40
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, 1, h, d), jnp.float32)
    kf = jax.random.normal(jax.random.PRNGKey(1), (b, sk, hkv, d))
    vf = jax.random.normal(jax.random.PRNGKey(2), (b, sk, hkv, d))
    dt = jnp.int4 if qdt == "int4" else jnp.int8
    k_int, k_s = quantize_kv(kf, dtype=dt)
    v_int, v_s = quantize_kv(vf, dtype=dt)
    k_int = jnp.transpose(k_int, (0, 2, 1, 3))  # head-major cache layout
    v_int = jnp.transpose(v_int, (0, 2, 1, 3))
    k_scale = jnp.transpose(k_s[..., 0], (0, 2, 1)).astype(jnp.float32)
    v_scale = jnp.transpose(v_s[..., 0], (0, 2, 1)).astype(jnp.float32)
    prompt_len = jnp.array([30, 17], jnp.int32)
    end = jnp.array([45, 45], jnp.int32)

    ref = _reference(q, k_int, k_scale, v_int, v_scale, prompt_len, end,
                     s_prompt, 1.0 / d ** 0.5)
    out = decode_attention_int8(q, k_int, k_scale, v_int, v_scale,
                                prompt_len, end, s_prompt, interpret=True)
    # kernel matmuls run in bf16 (fp32 accumulate) — the serving dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_generate_decode_bounds_consistency():
    """End-to-end: greedy tokens identical with and without the fused decode
    path wiring (on CPU both take the XLA reference, proving the bounds
    plumbing matches the mask semantics via _reference)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from u2tokenizer_tpu.config import GenerationConfig, LLMConfig
    from u2tokenizer_tpu.models.generate import make_generate_fn
    from u2tokenizer_tpu.models.llm.decoder import CausalLM

    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                             cfg.vocab_size)
    emb_init = jnp.zeros((2, 12, cfg.hidden_size), jnp.float32)
    params = model.init(rng, emb_init, jnp.zeros((2, 12), jnp.int32),
                        jnp.ones((1, 1, 12, 12), bool))
    prompt_len = jnp.array([12, 9], jnp.int32)
    att = jnp.arange(12)[None, :] < prompt_len[:, None]
    emb = model.apply(params, ids * att, method="embed_tokens")
    gen = GenerationConfig(max_new_tokens=6, eos_token_id=-2, pad_token_id=0)
    exact = make_generate_fn(model, gen, cache_dtype=jnp.float32)
    toks_exact = np.asarray(exact(params, emb, prompt_len,
                                  jax.random.PRNGKey(3)))
    int8 = make_generate_fn(model, gen, cache_dtype="int8")
    toks_int8 = np.asarray(int8(params, emb, prompt_len,
                                jax.random.PRNGKey(3)))
    assert toks_exact.shape == toks_int8.shape == (2, 6)
    # int8 cache quantization may flip near-ties on random weights; require
    # first-token agreement (prefill is exact in both paths)
    np.testing.assert_array_equal(toks_exact[:, 0], toks_int8[:, 0])


def test_flash_bwd_gate_selection(monkeypatch):
    """TPU backward selection: env forces win over the length auto-rule
    (measured crossover — BENCHMARKS.md S=1024 vs S=4096 A/B rows)."""
    from u2tokenizer_tpu.ops import flash_attention as fa

    monkeypatch.delenv("U2_FLASH_BWD", raising=False)
    assert not fa._flash_bwd_enabled(1024)
    assert not fa._flash_bwd_enabled(fa._FLASH_BWD_MIN_SEQ - 1)
    assert fa._flash_bwd_enabled(fa._FLASH_BWD_MIN_SEQ)
    assert fa._flash_bwd_enabled(4096)
    monkeypatch.setenv("U2_FLASH_BWD", "1")
    assert fa._flash_bwd_enabled(64)
    monkeypatch.setenv("U2_FLASH_BWD", "0")
    assert not fa._flash_bwd_enabled(8192)
