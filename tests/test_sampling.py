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
    # every draw lands inside the exact nucleus (this fixture's nucleus
    # spills past k=128 — ~1460 tokens — so it exercises the escalation
    # level, whose k-space categorical uses different-but-exact draws)
    finite = np.isfinite(np.asarray(_reference_filter(lj, 0.9)))[0]
    assert finite[fast_draws].all()
    # frequencies agree within sampling noise on the dominant tokens and
    # on the aggregate tail mass
    for tok in range(3):
        f1 = (fast_draws == tok).mean()
        f2 = (dense_draws == tok).mean()
        assert abs(f1 - f2) < 0.05, (tok, f1, f2)
    tail1 = (fast_draws >= 6).mean()
    tail2 = (dense_draws >= 6).mean()
    assert abs(tail1 - tail2) < 0.05, (tail1, tail2)


def test_nucleus_membership_bounds_bracket_exact_p():
    """member matches top_p_filter's kept set exactly (incl. threshold
    ties) and p_lo <= p_exact <= p_hi for every member draft."""
    from u2tokenizer_tpu.ops.sampling import (nucleus_membership_bounds,
                                              nucleus_p_draft)

    rng = np.random.default_rng(11)
    v = 2048
    logits = rng.normal(0, 2.0, (64, v)).astype(np.float32)
    # inject exact ties around likely thresholds
    logits[:, 100:110] = logits[:, 100][:, None]
    draft = rng.integers(0, v, 64).astype(np.int32)
    draft[:4] = np.arange(100, 104)  # tied tokens
    draft[4] = -1
    lj = jnp.asarray(logits)
    dj = jnp.asarray(draft)
    member, p_lo, p_hi = nucleus_membership_bounds(lj, dj, 0.9)
    filt = np.asarray(_reference_filter(lj, 0.9))
    kept = np.isfinite(filt)
    expected_member = np.array(
        [d >= 0 and kept[i, d] for i, d in enumerate(draft)])
    np.testing.assert_array_equal(np.asarray(member), expected_member)
    p = jax.nn.softmax(jnp.asarray(filt), axis=-1)
    p_exact = np.asarray(
        [float(p[i, d]) if d >= 0 and kept[i, d] else 0.0
         for i, d in enumerate(draft)])
    lo, hi = np.asarray(p_lo), np.asarray(p_hi)
    assert np.all(lo <= p_exact * (1 + 1e-6) + 1e-9)
    assert np.all(p_exact <= hi * (1 + 1e-6) + 1e-9)
    # the band is narrow: hi <= lo / top_p
    assert np.all(hi <= lo / 0.9 + 1e-9)
    # nucleus_p_draft agrees with the dense computation
    np.testing.assert_allclose(
        np.asarray(nucleus_p_draft(lj, dj, 0.9)), p_exact,
        rtol=1e-5, atol=1e-8)


def test_topk_nucleus_threshold_ties_match_dense():
    """k-space nucleus must keep ALL tokens tied at the threshold (the
    dense filter's >= thr semantics), or route the row to the dense
    fallback when ties spill past k."""
    from u2tokenizer_tpu.ops.sampling import nucleus_sample

    v = 4096
    logits = np.full((1, v), -10.0, np.float32)
    logits[0, :3] = [5.0, 4.0, 4.0]  # tie at the threshold
    lj = jnp.asarray(logits)
    # with top_p such that the nucleus boundary lands on the tie, both
    # tied tokens must be sampleable
    keys = jax.random.split(jax.random.PRNGKey(3), 600)
    draws = np.asarray(jax.vmap(
        lambda k: nucleus_sample(k, lj, 0.8)[0])(keys))
    dense = np.asarray(jax.vmap(
        lambda k: jax.random.categorical(
            k, _reference_filter(lj, 0.8), axis=-1)[0])(keys))
    assert set(draws) == set(dense)


def test_kspace_escalation_level_exact():
    """A batch with one row whose nucleus spills past k=128 but fits in
    k_escalate: the middle cascade level must produce dense-exact values
    (one flat row at B=64 must not force a full-vocab sort)."""
    from u2tokenizer_tpu.ops.sampling import (nucleus_accept_residual,
                                              nucleus_p_draft)

    rng = np.random.default_rng(12)
    v = 8192
    logits = rng.normal(0, 0.05, (8, v)).astype(np.float32)
    logits[:7, :10] += 14.0        # peaked rows: nucleus << 128
    logits[7, :512] += 14.0        # flat-ish row: nucleus ~460 in (128,2048)
    draft = np.asarray([0, 3, 9, 11, -1, 2, 5, 300], np.int32)
    lj, dj = jnp.asarray(logits), jnp.asarray(draft)

    ref_p = jax.nn.softmax(_reference_filter(lj, 0.9), axis=-1)
    expected = np.asarray([float(ref_p[i, d]) if d >= 0 else 0.0
                           for i, d in enumerate(draft)])
    np.testing.assert_allclose(np.asarray(nucleus_p_draft(lj, dj, 0.9)),
                               expected, rtol=1e-5, atol=1e-8)
    p_d, fresh = nucleus_accept_residual(jax.random.PRNGKey(1), lj, dj, 0.9)
    np.testing.assert_allclose(np.asarray(p_d), expected,
                               rtol=1e-5, atol=1e-8)
    finite = np.isfinite(np.asarray(_reference_filter(lj, 0.9)))
    for i, f in enumerate(np.asarray(fresh)):
        assert finite[i, f], i

    # nucleus past k_escalate too (uniform): final dense level still exact
    wide = rng.normal(0, 0.001, (2, v)).astype(np.float32)
    wj = jnp.asarray(wide)
    dw = jnp.asarray([5, 4000], jnp.int32)
    ref_w = jax.nn.softmax(_reference_filter(wj, 0.9), axis=-1)
    exp_w = np.asarray([float(ref_w[i, d])
                        if np.isfinite(np.asarray(
                            _reference_filter(wj, 0.9))[i, d]) else 0.0
                        for i, d in enumerate(np.asarray(dw))])
    np.testing.assert_allclose(np.asarray(nucleus_p_draft(wj, dw, 0.9)),
                               exp_w, rtol=1e-5, atol=1e-8)


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
