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


def test_nucleus_accept_residual_pd_exact_both_branches():
    """p_draft from the k-space path must equal softmax(top_p_filter)[d]
    bit-for-bit in the contained case and the spill-past-k fallback."""
    from u2tokenizer_tpu.ops.sampling import nucleus_accept_residual

    rng = np.random.default_rng(5)
    v = 4096
    for peaked in (True, False):
        logits = rng.normal(0, 0.01, (4, v)).astype(np.float32)
        if peaked:
            logits[:, :12] += 15.0
        draft = jnp.asarray([0, 5, 400, -1], jnp.int32)
        lj = jnp.asarray(logits)
        p_d, fresh = nucleus_accept_residual(jax.random.PRNGKey(0), lj,
                                             draft, 0.9, k=128)
        ref_p = jax.nn.softmax(_reference_filter(lj, 0.9), axis=-1)
        expected = np.asarray(
            [float(ref_p[i, d]) if d >= 0 else 0.0
             for i, d in enumerate(np.asarray(draft))])
        np.testing.assert_allclose(np.asarray(p_d), expected,
                                   rtol=1e-5, atol=1e-8)
        # fresh is in the nucleus and differs from an in-nucleus draft
        finite = np.isfinite(np.asarray(_reference_filter(lj, 0.9)))
        for i, f in enumerate(np.asarray(fresh)):
            assert finite[i, f], (peaked, i)
            d = int(np.asarray(draft)[i])
            if d >= 0 and expected[i] > 0 and finite[i].sum() > 1:
                assert f != d


def test_nucleus_sample_distribution_matches_dense():
    """Empirical distribution of the k-space sampler matches the dense
    filtered-categorical over many keys (both support and frequencies)."""
    from u2tokenizer_tpu.ops.sampling import nucleus_sample

    rng = np.random.default_rng(6)
    v = 4096
    logits = rng.normal(0, 0.1, (1, v)).astype(np.float32)
    logits[0, :6] += np.asarray([9, 8.6, 8.2, 7.8, 7.4, 7.0])
    lj = jnp.asarray(logits)
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    fast_draws = np.asarray(jax.vmap(
        lambda k: nucleus_sample(k, lj, 0.9)[0])(keys))
    dense_draws = np.asarray(jax.vmap(
        lambda k: jax.random.categorical(
            k, _reference_filter(lj, 0.9), axis=-1)[0])(keys))
    # identical support
    assert set(fast_draws) <= set(range(6)) | set(dense_draws)
    # frequencies agree within sampling noise on the dominant tokens
    for tok in range(3):
        f1 = (fast_draws == tok).mean()
        f2 = (dense_draws == tok).mean()
        assert abs(f1 - f2) < 0.05, (tok, f1, f2)


def test_sample_routes_large_vocab_through_kspace():
    """sample() on a large vocab must stay exact: draws land in the
    nucleus and greedy is untouched."""
    from u2tokenizer_tpu.ops.sampling import sample

    rng = np.random.default_rng(8)
    logits = rng.normal(0, 0.1, (2, 5000)).astype(np.float32)
    logits[:, 0] += 10.0
    out = np.asarray(sample(jax.random.PRNGKey(0), jnp.asarray(logits),
                            do_sample=True, top_p=0.9))
    finite = np.isfinite(np.asarray(_reference_filter(
        jnp.asarray(logits), 0.9)))
    assert finite[0, out[0]] and finite[1, out[1]]
    g = np.asarray(sample(jax.random.PRNGKey(0), jnp.asarray(logits),
                          do_sample=False))
    np.testing.assert_array_equal(g, [0, 0])
