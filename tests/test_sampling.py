"""Sampling ops: exactness of the bucketed top-p warp (top-k prefilter with
full-sort fallback) against the plain sort and HF's TopPLogitsWarper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.ops.sampling import _nucleus_threshold, top_p_filter


def _reference_filter(logits, top_p):
    """The plain full-sort nucleus filter (pre-bucketing semantics)."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
    thr = _nucleus_threshold(sorted_desc, lse, top_p)
    return jnp.where(logits >= thr, logits, -jnp.inf)


@pytest.mark.parametrize("top_p", [0.5, 0.9, 0.99])
def test_topk_fast_path_exact_on_peaked_logits(top_p):
    """Peaked rows (realistic LM case): nucleus fits in k=128, fast path."""
    rng = np.random.default_rng(0)
    v = 8192
    logits = rng.normal(0, 1, (4, v)).astype(np.float32)
    logits[:, :16] += 12.0  # concentrate mass on 16 tokens
    out = np.asarray(top_p_filter(jnp.asarray(logits), top_p))
    ref = np.asarray(_reference_filter(jnp.asarray(logits), top_p))
    np.testing.assert_array_equal(out, ref)
    assert np.isfinite(out).sum() < 4 * v  # actually filtered something


def test_fallback_when_nucleus_exceeds_k():
    """Near-uniform logits: nucleus ≈ top_p·V >> k -> the lax.cond fallback
    must produce the exact full-sort result."""
    rng = np.random.default_rng(1)
    v = 8192
    logits = rng.normal(0, 0.01, (3, v)).astype(np.float32)
    out = np.asarray(top_p_filter(jnp.asarray(logits), 0.9))
    ref = np.asarray(_reference_filter(jnp.asarray(logits), 0.9))
    np.testing.assert_array_equal(out, ref)
    # nucleus really is large (fallback case exercised)
    assert np.isfinite(out[0]).sum() > 1000


def test_small_vocab_path():
    rng = np.random.default_rng(2)
    logits = rng.normal(0, 2, (5, 64)).astype(np.float32)
    out = np.asarray(top_p_filter(jnp.asarray(logits), 0.9))
    ref = np.asarray(_reference_filter(jnp.asarray(logits), 0.9))
    np.testing.assert_array_equal(out, ref)


def test_matches_hf_top_p_warper():
    """Golden semantics: kept-token sets match transformers'
    TopPLogitsWarper across peaked and flat rows."""
    import torch
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.default_rng(3)
    v = 6000
    logits = rng.normal(0, 1, (6, v)).astype(np.float32)
    logits[:3, :8] += 10.0  # peaked rows (fast path), flat rows (fallback)
    for top_p in (0.5, 0.9):
        warper = TopPLogitsWarper(top_p=top_p)
        ref = warper(None, torch.tensor(logits)).numpy()
        out = np.asarray(top_p_filter(jnp.asarray(logits), top_p))
        np.testing.assert_array_equal(np.isfinite(out), np.isfinite(ref))


def test_jit_and_grad_free_usage():
    """The filter jits (the lax.cond predicate is traced) and preserves
    kept logits bit-exactly."""
    logits = jnp.asarray(
        np.random.default_rng(4).normal(0, 1, (2, 5000)).astype(np.float32))
    out = jax.jit(lambda x: top_p_filter(x, 0.9))(logits)
    kept = np.isfinite(np.asarray(out))
    np.testing.assert_array_equal(np.asarray(out)[kept],
                                  np.asarray(logits)[kept])
