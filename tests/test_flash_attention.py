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
