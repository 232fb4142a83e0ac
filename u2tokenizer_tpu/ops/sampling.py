"""Token sampling ops: greedy, temperature, top-p (nucleus).

Decode protocol parity: green_refactored/lu2_model.py:63 generates with
do_sample=True, top_p=0.9, temperature 1.0 (HF defaults otherwise);
eval paths use greedy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jax.Array) -> jax.Array:
    """(B, V) -> (B,) argmax token ids."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _nucleus_threshold(sorted_desc: jax.Array, lse: jax.Array,
                       top_p: float) -> jax.Array:
    """Smallest kept logit per row given descending-sorted logits (full or
    top-k prefix) and the FULL distribution's logsumexp."""
    probs = jnp.exp(sorted_desc - lse[..., None])
    cum = jnp.cumsum(probs, axis=-1)
    # Keep tokens where the cumulative probability *before* this token < top_p
    # (HF TopPLogitsWarper semantics: the first token crossing the threshold
    # is kept).
    keep = (cum - probs) < top_p
    num_keep = jnp.sum(keep, axis=-1)  # >= 1
    idx = jnp.clip(num_keep - 1, 0, sorted_desc.shape[-1] - 1)
    return jnp.take_along_axis(sorted_desc, idx[..., None], axis=-1)


def _dense_top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Full-sort nucleus filter — the cascade's final fallback, reached
    only when the k-prefilter levels already failed containment (so it
    must NOT rerun a prefilter the caller knows will fail)."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
    thr = _nucleus_threshold(sorted_desc, lse, top_p)
    return jnp.where(logits >= thr, logits, -jnp.inf)


def top_p_filter(logits: jax.Array, top_p: float,
                 k_prefilter: int = 128) -> jax.Array:
    """Mask logits outside the nucleus — EXACT top-p, with a bucketed fast
    path: for large vocabularies the threshold is found inside the top-k
    prefix (O(V·log k) lax.top_k instead of an O(V·log V) full sort — the
    dominant cost of sampled decoding at V≈152k, and of the per-position
    warp in speculative sampling). Exactness guard: when any row's nucleus
    spills past k (cum prob of its top-k < top_p), a lax.cond falls back to
    the full sort for the whole call — rare for peaked LM distributions at
    top_p=0.9, and bit-identical either way."""
    v = logits.shape[-1]
    if v <= max(4 * k_prefilter, 1024):  # small vocab: sort is cheap
        lse = jax.nn.logsumexp(logits, axis=-1)
        sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
        thr = _nucleus_threshold(sorted_desc, lse, top_p)
        return jnp.where(logits >= thr, logits, -jnp.inf)

    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    topv = jax.lax.top_k(logits.astype(jnp.float32), k_prefilter)[0]
    cum_k = jnp.exp(topv - lse[..., None]).sum(axis=-1)
    all_contained = jnp.all(cum_k >= top_p)

    def fast(_):
        return _nucleus_threshold(topv, lse, top_p)

    def slow(_):
        sorted_desc = jnp.sort(logits.astype(jnp.float32),
                               axis=-1)[..., ::-1]
        return _nucleus_threshold(sorted_desc, lse, top_p)

    thr = jax.lax.cond(all_contained, fast, slow, None)
    return jnp.where(logits >= thr.astype(logits.dtype), logits, -jnp.inf)


def sample(
    rng: jax.Array,
    logits: jax.Array,
    *,
    do_sample: bool,
    temperature: float = 1.0,
    top_p: float = 1.0,
) -> jax.Array:
    """(B, V) logits -> (B,) sampled token ids."""
    if not do_sample:
        return greedy(logits)
    if temperature != 1.0:
        logits = logits / temperature
    if top_p < 1.0:
        if logits.shape[-1] > 1024:
            return nucleus_sample(rng, logits, top_p)
        logits = top_p_filter(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# k-space nucleus sampling
# ---------------------------------------------------------------------------
#
# For large vocabularies the nucleus (top_p=0.9 on a peaked LM) almost
# always lives inside the top-k prefix, so sampling and the speculative
# accept/residual computation can run entirely in k-space after one
# O(V log k) lax.top_k — no full-vocab sort, softmax, or categorical.
# Containment is an ALL-ROWS condition, so at large batch one flat row
# would otherwise route the whole call to the dense path (at B=64 and a
# ~1% per-row spill rate that's ~half of all steps); instead the fallback
# ESCALATES through a wider prefix (k -> k_escalate -> full sort), each
# level's top_k running only when the previous level failed (nested
# lax.cond false-branches). Results are exact at every level.


def _topk_nucleus(logits: jax.Array, top_p: float, k: int):
    """(topv, topi, keep, lse_n, contained): descending top-k values/ids,
    the in-prefix nucleus mask, the nucleus logsumexp, and whether every
    row's nucleus is contained in the prefix.

    ``keep`` uses top_p_filter's THRESHOLD semantics (keep all values >= the
    smallest prefix-kept value), so tokens tied at the threshold are all
    kept — bf16-quantized logits tie often at V~152k. ``contained`` is
    conservative: a row whose threshold equals the k-th value may have ties
    spilling past the prefix, so it routes to the dense fallback."""
    k = min(k, logits.shape[-1])
    lf = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(lf, axis=-1, keepdims=True)
    topv, topi = jax.lax.top_k(lf, k)
    probs = jnp.exp(topv - lse)
    cum = jnp.cumsum(probs, axis=-1)
    keep_prefix = (cum - probs) < top_p  # keep_prefix[0] always True
    num_keep = jnp.sum(keep_prefix, axis=-1)
    thr = jnp.take_along_axis(
        topv, jnp.clip(num_keep - 1, 0)[:, None], axis=-1)
    keep = topv >= thr
    contained = jnp.all((cum[:, -1] >= top_p)
                        & ((thr[:, 0] > topv[:, -1])
                           | (k == logits.shape[-1])))
    masked = jnp.where(keep, probs, 0.0)
    lse_n = jnp.log(masked.sum(-1, keepdims=True)) + lse
    return topv, topi, keep, lse_n, contained


def _kspace_cascade(logits: jax.Array, top_p: float, make_fast, slow,
                    operand, k: int, k_escalate: int):
    """Escalating k-space dispatch: try ``make_fast(topv, topi, keep,
    lse_n)`` at prefix size k, then k_escalate, then ``slow`` (dense).
    Each wider top_k sits inside the previous lax.cond's false branch, so
    it only executes when that level actually failed containment."""
    v = logits.shape[-1]
    ks = [kx for kx in (k, k_escalate) if kx < v]
    if not ks:
        return slow(operand)

    def level(i):
        def run(op):
            topv, topi, keep, lse_n, contained = _topk_nucleus(
                logits, top_p, ks[i])
            nxt = level(i + 1) if i + 1 < len(ks) else slow
            return jax.lax.cond(contained,
                                make_fast(topv, topi, keep, lse_n),
                                nxt, op)
        return run

    return level(0)(operand)


def nucleus_sample(rng: jax.Array, logits: jax.Array, top_p: float,
                   k: int = 128, k_escalate: int = 2048) -> jax.Array:
    """Exact top-p sampling via the escalating k-space fast path."""

    def make_fast(topv, topi, keep, _lse_n):
        def fast(_):
            kl = jnp.where(keep, topv, -jnp.inf)
            j = jax.random.categorical(rng, kl, axis=-1)
            return jnp.take_along_axis(topi, j[:, None], axis=-1)[:, 0]
        return fast

    def slow(_):
        return jax.random.categorical(
            rng, _dense_top_p_filter(logits.astype(jnp.float32), top_p),
            axis=-1)

    return _kspace_cascade(logits, top_p, make_fast, slow, None,
                           k, k_escalate).astype(jnp.int32)


def nucleus_membership_bounds(logits: jax.Array, draft: jax.Array,
                              top_p: float):
    """Sort-free draft-acceptance bounds for the top-p-warped distribution.

    Returns (member, p_lo, p_hi) per row, all from two fused reduction
    passes over the vocab (logsumexp + a strictly-greater mass sum) — no
    top_k, no sort:

    * member: whether the draft is inside the nucleus. top_p_filter keeps
      ``{v: l_v >= thr}`` where thr is the smallest kept sorted value, and
      d is kept iff the total probability mass STRICTLY above l_d is
      < top_p (mass-above < top_p makes d's first sorted occurrence a kept
      position, so thr <= l_d; otherwise every occurrence falls past the
      keep prefix and thr > l_d).
    * p_lo <= p_warped(d) <= p_hi: the warped probability is
      p_full(d)/N with nucleus mass N in [max(top_p, P_above + p_full), 1]
      (the nucleus always reaches top_p, and membership is monotone in the
      logit so it contains everything above d plus d itself).

    A uniform u accepts certainly when u < p_lo and rejects certainly when
    u >= p_hi; only the narrow band in between (width <= p_full*(1/top_p-1))
    needs the exact normalizer. Rows with draft < 0 report member=False,
    p_lo = p_hi = 0.
    """
    b = logits.shape[0]
    rows = jnp.arange(b)
    lf = logits.astype(jnp.float32)
    d_safe = jnp.clip(draft, 0)
    l_d = lf[rows, d_safe]
    lse = jax.nn.logsumexp(lf, axis=-1)
    p_above = jnp.sum(
        jnp.where(lf > l_d[:, None], jnp.exp(lf - lse[:, None]), 0.0),
        axis=-1)
    member = (p_above < top_p) & (draft >= 0)
    p_full = jnp.exp(l_d - lse)
    p_lo = jnp.where(member, p_full, 0.0)
    p_hi = jnp.where(member,
                     jnp.minimum(p_full / jnp.maximum(top_p,
                                                      p_above + p_full),
                                 1.0),
                     0.0)
    return member, p_lo, p_hi


def nucleus_p_draft(logits: jax.Array, draft: jax.Array, top_p: float,
                    k: int = 128, k_escalate: int = 2048) -> jax.Array:
    """Exact warped probability of the draft token (escalating k-space
    fast path, dense fallback) — the p-only half of
    nucleus_accept_residual."""
    b = logits.shape[0]
    rows = jnp.arange(b)
    d_safe = jnp.clip(draft, 0)
    l_d = logits.astype(jnp.float32)[rows, d_safe]

    def make_fast(topv, topi, keep, lse_n):
        def fast(_):
            is_member = ((topi == d_safe[:, None]) & keep).any(-1)
            return jnp.where(is_member & (draft >= 0),
                             jnp.exp(l_d - lse_n[:, 0]), 0.0)
        return fast

    def slow(_):
        w = _dense_top_p_filter(logits.astype(jnp.float32), top_p)
        p = jax.nn.softmax(w, axis=-1)
        return jnp.where(draft >= 0, p[rows, d_safe], 0.0)

    return _kspace_cascade(logits, top_p, make_fast, slow, None,
                           k, k_escalate)


def nucleus_accept_residual(rng: jax.Array, logits: jax.Array,
                            draft: jax.Array, top_p: float,
                            k: int = 128, k_escalate: int = 2048):
    """Speculative-sampling step in k-space: returns (p_draft, fresh).

    p_draft: the draft token's probability under the top-p-warped target
    distribution (0 outside the nucleus; used as the acceptance
    probability for a point-mass draft). fresh: an exact draw from the
    warped distribution with the draft's mass removed (the rejection-
    sampling residual; the full warped distribution when draft < 0).
    ``logits`` must already be temperature-scaled.
    """
    b = logits.shape[0]
    rows = jnp.arange(b)
    d_safe = jnp.clip(draft, 0)
    l_d = logits.astype(jnp.float32)[rows, d_safe]

    def make_fast(topv, topi, keep, lse_n):
        def fast(key):
            # nucleus membership of the draft: it must match a KEPT slot
            is_member = ((topi == d_safe[:, None]) & keep).any(-1)
            p_d = jnp.where(is_member & (draft >= 0),
                            jnp.exp(l_d - lse_n[:, 0]), 0.0)
            kl = jnp.where(keep, topv, -jnp.inf)
            drop = (topi == d_safe[:, None]) & (draft >= 0)[:, None]
            kl = jnp.where(drop, -jnp.inf, kl)
            # a draft covering the whole nucleus leaves an empty residual;
            # the caller never uses fresh at that position (the draft was
            # accepted with probability 1), so use the unmasked nucleus
            empty = jnp.all(~jnp.isfinite(kl), axis=-1, keepdims=True)
            kl = jnp.where(empty, jnp.where(keep, topv, -jnp.inf), kl)
            j = jax.random.categorical(key, kl, axis=-1)
            fresh = jnp.take_along_axis(topi, j[:, None], axis=-1)[:, 0]
            return p_d, fresh
        return fast

    def slow(key):
        w = _dense_top_p_filter(logits.astype(jnp.float32), top_p)
        p = jax.nn.softmax(w, axis=-1)
        p_d = jnp.where(draft >= 0, p[rows, d_safe], 0.0)
        masked = w.at[rows, d_safe].set(-jnp.inf)
        w_res = jnp.where((draft >= 0)[:, None], masked, w)
        fresh = jax.random.categorical(key, w_res, axis=-1)
        return p_d, fresh

    p_d, fresh = _kspace_cascade(logits, top_p, make_fast, slow, rng,
                                 k, k_escalate)
    return p_d, fresh.astype(jnp.int32)
