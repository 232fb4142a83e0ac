"""Speculative greedy decoding with n-gram prompt/self-copy drafts.

Radiology reports are template-heavy — long spans repeat verbatim across the
prompt (which, in the GREEN/DPO pipelines, contains the reference report) and
within the generated text itself. A draft *model* is unnecessary: a bigram
match against the token history proposes the continuation that followed the
same context last time, and one batched verify forward accepts the longest
correct prefix. Greedy output is provably identical to step-by-step decoding
(the verify logits ARE the step logits); only the number of device steps
changes: each verify block of ``block_len`` tokens costs ~one decode step of
HBM traffic (the cache read is shared across the block's queries) but emits
1..block_len tokens.

Reference protocol being accelerated: the 768-token report decode of
green_refactored/lu2_model.py:63 (greedy eval paths; sampling paths fall back
to models/generate.py).

TPU design: the whole loop is one jitted ``lax.while_loop`` — drafting,
verification, acceptance and output writes all happen device-side (host
round-trips cost ~4 s on the axon relay). All shapes are static; per-row
divergence (rows accept different counts per step) is handled with per-row
write offsets (decoder.Attention scatters verify blocks at a (B,) index) and
masked scatters (mode="drop" turns non-emitted lanes into no-op writes).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import GenerationConfig
from ..ops.sampling import (nucleus_accept_residual,
                            nucleus_membership_bounds, nucleus_p_draft,
                            sample)
from .llm.decoder import KVCache
from .u2_model import causal_padding_mask


def ngram_draft(hist: jax.Array, idx_last: jax.Array, c0: jax.Array,
                c1: jax.Array, n_drafts: int,
                c00: Optional[jax.Array] = None) -> jax.Array:
    """Propose ``n_drafts`` continuation tokens by n-gram history match.

    hist: (B, L) token history; unwritten/gap positions hold -1.
    idx_last: (B,) history index of the newest token (the bigram (c0, c1)
      ends here; matches at or after it are excluded).
    c0, c1: (B,) the two newest tokens (c1 = pending last token).
    c00: optional (B,) third-newest token — when given, the most recent
      TRIGRAM (c00, c0, c1) match is preferred over the most recent bigram
      match (higher-precision continuations on real text; drafts only
      affect speed, never output).

    Returns (B, n_drafts) int32 drafts; rows with no match (or matches
    running into unwritten history) fall back to repeating c1 — a draft is
    only a guess, a wrong one costs nothing beyond the block's slack.
    """
    b, l = hist.shape
    pos = jnp.arange(l - 1)
    m2 = (hist[:, :-1] == c0[:, None]) & (hist[:, 1:] == c1[:, None])
    m2 = m2 & (pos[None, :] + 1 < idx_last[:, None])
    j = jnp.max(jnp.where(m2, pos[None, :], -1), axis=1)  # most recent
    if c00 is not None:
        # trigram match ending at p+1: hist[p-1]==c00 for bigram index p>=1
        m3 = m2[:, 1:] & (hist[:, :-2] == c00[:, None]) & (c00[:, None] >= 0)
        j3 = jnp.max(jnp.where(m3, pos[None, 1:], -1), axis=1)
        j = jnp.where(j3 >= 0, j3, j)
    idxs = jnp.clip(j[:, None] + 2 + jnp.arange(n_drafts)[None, :], 0, l - 1)
    d = jnp.take_along_axis(hist, idxs, axis=1)
    bad = (j[:, None] < 0) | (d < 0)
    return jnp.where(bad, c1[:, None], d).astype(jnp.int32)


def make_spec_generate_fn(
    model,
    gen: GenerationConfig,
    cache_dtype=jnp.bfloat16,
    block_len: int = 8,
    return_stats: bool = False,
    prefill_chunk: Optional[int] = None,
    forced_content: bool = False,
    shared_prefix: Optional[tuple] = None,
    fanout: Optional[int] = None,
    fanout_split: Optional[tuple] = None,
) -> Callable:
    """Build generate(params, inputs_embeds, prompt_ids, prompt_len, rng).

    Greedy-only speculative counterpart of generate.make_generate_fn: same
    signature plus ``prompt_ids`` (B, S) — the drafting history seed (pad
    columns beyond prompt_len are ignored). Returns (B, max_new_tokens) ids,
    pad-filled after EOS, bit-identical to the plain greedy loop.

    ``return_stats=True``: returns (tokens, n_verify_steps); mean accepted
    tokens per verify step = total_emitted / n_verify_steps.

    Sampling (``gen.do_sample=True``) uses point-mass-draft rejection
    sampling: draft d at a position with warped target distribution p is
    accepted with probability p(d); on rejection the token is drawn from p
    renormalized without d — which makes every emitted token an exact draw
    from p (Leviathan et al. speculative sampling with a deterministic
    draft). The OUTPUT DISTRIBUTION equals plain sampling; individual
    trajectories differ because randomness is consumed differently.

    ``forced_content=True``: generate takes a trailing ``script`` argument
    (B, >= max_new + block_len) and the EMITTED tokens come from the script
    instead of argmax / the sampled draw — every forward, cache update,
    logits computation and the n-gram drafting over the (scripted) history
    is unchanged, so wall-clock equals real serving whose model emits
    exactly that content. This is the content-controlled benchmark mode:
    random-weight greedy output degenerates into token cycles that flatter
    n-gram acceptance, so honest speculative numbers are measured by
    scripting realistic report text through the identical compute path.
    With ``do_sample=True`` the acceptance test becomes draft==script (a
    model whose sampled output is the script accepts exactly those drafts)
    while the full warp/accept/residual computation stays in the compiled
    program: the overrides are ``where(script >= 0, ...)`` selects whose
    predicate is a runtime input, so XLA cannot eliminate the sampling
    arithmetic — both select branches are computed. Script tokens must be
    >= 0 (real vocab ids).

    ``shared_prefix=(n, split)``: rows grouped n-per-case share their first
    ``split`` prompt tokens — the prefill runs two-phase (prefix once per
    group, per-row continuation; generate.shared_prefix_prefill) and the
    speculative decode is untouched. The GREEN judge's case of 8 judgments
    sharing [template ; reference report] cuts its prefill roughly in half.

    ``fanout=n``: speculative counterpart of generate.make_fanout_generate_fn
    for the FULLY-shared-prompt protocol (8 samples per case,
    pred_then_green.py:77): inputs become per-CASE — embeds (C, S, E),
    prompt_ids (C, S), prompt_len (C,) — and n rows per case decode against
    the case-shared prompt KV (prefilled once, streamed once per case via
    ops/attention.gqa_sdpa_fanout) plus a per-row suffix cache. Returns
    (C*n, max_new); row c*n+j is sample j of case c. ``script`` (forced
    content) stays per-ROW: (C*n, >= max_new + block). Composes the fan-out
    prompt-KV saving with speculative acceptance. Mutually exclusive with
    shared_prefix/prefill_chunk.

    ``fanout_split=(n, split)``: the PARTIALLY-shared-prompt protocol — the
    GREEN judge's: rows grouped n-per-case share their first ``split``
    prompt tokens but own distinct prompt tails (template + reference
    report shared; candidate + instructions per row,
    green_refactored/utils.py:318-332). Inputs stay per-ROW (B, S). The
    shared split is prefilled ONCE per case into a (B/n, split) prefix
    cache that the decode streams once per case (gqa_sdpa_fanout); the
    per-row suffix cache holds only [prompt tail ; generated] — vs
    shared_prefix= (which tiles the prefix KV back into a full-size
    per-row cache), this cuts both the judge's resident cache and its
    per-step decode traffic by the shared fraction. Tail prefill runs as a
    scan of 256-token chunks (the one-shot joint softmax over
    [split + tail] was a multi-GB transient — the judge share1 OOM).
    Requires split < prompt_len for every row. Mutually exclusive with
    fanout/shared_prefix/prefill_chunk.
    """
    llm_cfg = model.cfg.llm if hasattr(model.cfg, "llm") else model.cfg
    kb = block_len
    max_new = gen.max_new_tokens

    def generate(params, inputs_embeds, prompt_ids, prompt_len, rng,
                 script=None):
        nrows, s, _ = inputs_embeds.shape
        b = nrows * fanout if fanout else nrows
        # +kb slack: a verify block starting at the last live slot may write
        # up to kb-1 tokens past it (masked, later overwritten — never read).
        # fan-out: the per-row cache holds ONLY the suffix; the prompt lives
        # in the case-shared prefix cache.
        total = (max_new + kb) if fanout else (s + max_new + kb)
        prompt_len = prompt_len.astype(jnp.int32)

        prefix_cache = prefix_mask = None
        if fanout:
            # --- prefill once per case into the shared prefix cache ---
            prefix_cache = KVCache.create(llm_cfg, nrows, s, cache_dtype)
            att_c = (jnp.arange(s)[None, :] < prompt_len[:, None])
            mask_c = causal_padding_mask(att_c.astype(jnp.int32))
            positions = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32), (nrows, s))
            _, hidden, prefix_cache = model.apply(
                params, inputs_embeds, attention_mask=None,
                cache=prefix_cache, write_index=jnp.int32(0),
                positions=positions, mask=mask_c, lens=prompt_len,
                compute_logits=False, method="forward_embeds")
            last_hidden = jnp.take_along_axis(
                hidden, (prompt_len - 1)[:, None, None], axis=1)
            prefix_mask = att_c  # (C, S) valid prompt keys
            # fan out all per-row state (row c*n+j = sample j of case c)
            rep = lambda x: jnp.repeat(x, fanout, axis=0)
            last_hidden = rep(last_hidden)
            prompt_len = rep(prompt_len)
            prompt_ids = rep(prompt_ids)
            att = rep(att_c.astype(jnp.int32))
            cache = KVCache.create(llm_cfg, b, total, cache_dtype)
            last = model.apply(params, last_hidden, method="lm_logits")[:, 0]
            rng, sub = jax.random.split(rng)
            tok0 = sample(sub, last, do_sample=gen.do_sample,
                          temperature=gen.temperature, top_p=gen.top_p)
            return _decode_loop(params, cache, prefix_cache, prefix_mask,
                                tok0, att, prompt_ids, prompt_len, rng,
                                script, b, s, total)
        if fanout_split is not None:
            n, split = fanout_split
            c = b // n
            # --- phase 1: the shared split prefilled once per case ---
            prefix_cache = KVCache.create(llm_cfg, c, split, cache_dtype)
            pos_p = jnp.broadcast_to(
                jnp.arange(split, dtype=jnp.int32), (c, split))
            mask_p = jnp.tril(jnp.ones((split, split), bool))[None, None]
            _, _, prefix_cache = model.apply(
                params, inputs_embeds[::n, :split], attention_mask=None,
                cache=prefix_cache, write_index=jnp.int32(0),
                positions=pos_p, mask=mask_p,
                lens=jnp.full((c,), split, jnp.int32), compute_logits=False,
                method="forward_embeds")
            prefix_mask = jnp.ones((c, split), bool)

            # --- phase 2: per-row tail prefill into the suffix cache,
            # chunked (bounds the joint-softmax transient) ---
            total = (s - split) + max_new + kb
            cache = KVCache.create(llm_cfg, b, total, cache_dtype)
            s2 = s - split
            kvp = jnp.arange(total, dtype=jnp.int32)
            cs = s2
            for cand in (256, 128, 64, 32):
                if s2 > cand and s2 % cand == 0:
                    cs = cand
                    break
            chunks = jnp.swapaxes(
                inputs_embeds[:, split:].reshape(b, s2 // cs, cs, -1), 0, 1)

            def pre(cache, inp):
                ci, emb_c = inp
                base = ci * cs
                pos = jnp.broadcast_to(
                    split + base + jnp.arange(cs, dtype=jnp.int32), (b, cs))
                pmask = jnp.broadcast_to(
                    (kvp[None, :] <= (base + jnp.arange(cs))[:, None])[
                        None, None], (b, 1, cs, total))
                widx = jnp.full((b,), base, jnp.int32)
                _, hidden_c, cache = model.apply(
                    params, emb_c, pos, pmask, cache, widx,
                    prefix_cache=prefix_cache, prefix_mask=prefix_mask,
                    compute_logits=False, method="decode_step")
                return cache, hidden_c

            cache, hiddens = jax.lax.scan(
                pre, cache, (jnp.arange(s2 // cs), chunks))
            hidden = jnp.swapaxes(hiddens, 0, 1).reshape(b, s2, -1)
            last_hidden = jnp.take_along_axis(
                hidden, (prompt_len - 1 - split)[:, None, None], axis=1)
            last = model.apply(params, last_hidden, method="lm_logits")[:, 0]
            rng, sub = jax.random.split(rng)
            tok0 = sample(sub, last, do_sample=gen.do_sample,
                          temperature=gen.temperature, top_p=gen.top_p)
            att = (jnp.arange(s)[None, :]
                   < prompt_len[:, None]).astype(jnp.int32)
            return _decode_loop(params, cache, prefix_cache, prefix_mask,
                                tok0, att, prompt_ids, prompt_len, rng,
                                script, b, s, total, split=split)
        cache = KVCache.create(llm_cfg, b, total, cache_dtype)

        # --- prefill (identical to make_generate_fn, incl. the chunked and
        # shared-prefix variants; see generate.make_generate_fn) ---
        att = (jnp.arange(s)[None, :] < prompt_len[:, None]).astype(jnp.int32)
        if shared_prefix is not None:
            from .generate import shared_prefix_prefill

            last_hidden, cache = shared_prefix_prefill(
                model, params, inputs_embeds, prompt_len, cache,
                *shared_prefix)
        elif prefill_chunk and prefill_chunk < s and s % prefill_chunk == 0:
            cs = prefill_chunk
            kvp = jnp.arange(total, dtype=jnp.int32)
            chunks = jnp.swapaxes(
                inputs_embeds.reshape(b, s // cs, cs, -1), 0, 1)

            def pre(cache, inp):
                ci, emb_c = inp
                base = ci * cs
                pos = jnp.broadcast_to(
                    base + jnp.arange(cs, dtype=jnp.int32), (b, cs))
                pmask = (kvp[None, :]
                         <= (base + jnp.arange(cs))[:, None])[None, None]
                widx = jnp.full((b,), base, jnp.int32)
                _, hidden_c, cache = model.apply(
                    params, emb_c, attention_mask=None, cache=cache,
                    write_index=widx, positions=pos, mask=pmask,
                    compute_logits=False, method="forward_embeds")
                return cache, hidden_c

            cache, hiddens = jax.lax.scan(
                pre, cache, (jnp.arange(s // cs), chunks))
            hidden = jnp.swapaxes(hiddens, 0, 1).reshape(b, s, -1)
        else:
            mask = causal_padding_mask(att)
            positions = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32), (b, s))
            _, hidden, cache = model.apply(
                params, inputs_embeds, attention_mask=None, cache=cache,
                write_index=jnp.int32(0), positions=positions, mask=mask,
                lens=prompt_len, compute_logits=False,
                method="forward_embeds")
        if shared_prefix is None:
            last_hidden = jnp.take_along_axis(
                hidden, (prompt_len - 1)[:, None, None], axis=1)
        last = model.apply(params, last_hidden, method="lm_logits")[:, 0]
        rng, sub = jax.random.split(rng)
        tok0 = sample(sub, last, do_sample=gen.do_sample,
                      temperature=gen.temperature, top_p=gen.top_p)
        return _decode_loop(params, cache, None, None, tok0, att,
                            prompt_ids, prompt_len, rng, script, b, s,
                            total)

    def _decode_loop(params, cache, prefix_cache, prefix_mask, tok0, att,
                     prompt_ids, prompt_len, rng, script, b, s, total,
                     split=0):
        """Speculative verify/accept loop. ``prefix_cache`` None: the cache
        holds [prompt ; generated] at absolute slots (emitted index e at
        slot s+e). With a fan-out prefix cache: the per-row cache holds only
        the suffix (emitted index e at slot e) and every verify forward
        attends [case-shared prefix ; suffix] via the joint-softmax path
        (ops/attention.gqa_sdpa_fanout). ``split`` > 0 (fanout_split): the
        per-row cache holds [prompt tail ; generated] — tail token t at
        slot t-split, emitted index e at slot (s-split)+e — and the shared
        split keys come from the prefix cache."""
        cache_base = 0 if (prefix_cache is not None and split == 0) \
            else s - split
        if forced_content:
            # where-on-runtime-input keeps the real sampling of tok0 live
            s0 = script[:, 0].astype(jnp.int32)
            tok0 = jnp.where(s0 >= 0, s0, tok0)

        # token history for drafting: prompt at [0, prompt_len), -1 gap,
        # generated token j at s + j
        hist = jnp.full((b, s + max_new), -1, jnp.int32)
        hist = hist.at[:, :s].set(
            jnp.where(att.astype(bool), prompt_ids.astype(jnp.int32), -1))
        hist = hist.at[:, s].set(tok0)
        out = jnp.full((b, max_new), jnp.int32(gen.pad_token_id))
        out = out.at[:, 0].set(tok0)

        kv_pos = jnp.arange(total, dtype=jnp.int32)
        koff = jnp.arange(kb, dtype=jnp.int32)
        rows = jnp.arange(b)

        state = dict(
            cache=cache, hist=hist, out=out,
            pending=tok0,
            n_emit=jnp.ones((b,), jnp.int32),
            done=(tok0 == gen.eos_token_id),
            n_steps=jnp.int32(0),
            rng=rng,
        )

        def cond(st):
            return jnp.any(~st["done"] & (st["n_emit"] < max_new))

        def body(st):
            n_emit, done, pending = st["n_emit"], st["done"], st["pending"]
            n_w = n_emit - 1  # generated tokens whose KV is cached

            # -- draft: trigram-first (prev2, prev, pending) history match --
            idx_last = s + n_emit - 1
            prev = jnp.where(
                n_emit >= 2,
                jnp.take_along_axis(
                    st["hist"], jnp.clip(idx_last - 1, 0)[:, None],
                    axis=1)[:, 0],
                jnp.take_along_axis(
                    st["hist"], (prompt_len - 1)[:, None], axis=1)[:, 0])
            prev2_idx = jnp.where(
                n_emit >= 3, idx_last - 2,
                jnp.where(n_emit == 2, prompt_len - 1, prompt_len - 2))
            prev2 = jnp.take_along_axis(
                st["hist"], jnp.clip(prev2_idx, 0)[:, None], axis=1)[:, 0]
            drafts = ngram_draft(st["hist"], idx_last, prev, pending, kb - 1,
                                 c00=prev2)

            # -- one verify forward over [pending, d_1..d_{kb-1}] --
            f = jnp.concatenate([pending[:, None], drafts], axis=1)  # (B, kb)
            emb = model.apply(params, f, method="embed_tokens")
            pos = (prompt_len + n_w)[:, None] + koff[None, :]
            if prefix_cache is not None and split == 0:
                # suffix-only slots: emitted index e at slot e; the prompt
                # keys come from the shared prefix under prefix_mask
                key_ok = (kv_pos[None, None, :]
                          <= n_w[:, None, None] + koff[None, :, None])
            else:
                # [prompt tail ; generated] slots (split=0: full prompt)
                key_ok = (kv_pos[None, None, :]
                          < (prompt_len - split)[:, None, None]) | (
                    (kv_pos[None, None, :] >= cache_base) &
                    (kv_pos[None, None, :]
                     <= (cache_base + n_w)[:, None, None]
                     + koff[None, :, None]))
            logits, _, cache = model.apply(
                params, emb, pos, key_ok[:, None], st["cache"],
                cache_base + n_w, prefix_cache=prefix_cache,
                prefix_mask=prefix_mask, method="decode_step")
            rng = st["rng"]
            if not gen.do_sample:
                g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, kb)
                if forced_content:
                    # scripted continuation: position j's model output is
                    # the script token at emitted index n_emit + j. The
                    # where-on-script>=0 select (always true at runtime,
                    # unprovable at compile time) keeps the real argmax in
                    # the compiled program — identical FLOPs + HBM traffic.
                    idxs = n_emit[:, None] + koff[None, :]
                    s_tok = jnp.take_along_axis(
                        script.astype(jnp.int32),
                        jnp.clip(idxs, 0, script.shape[1] - 1), axis=1)
                    g = jnp.where(s_tok >= 0, s_tok, g)
                # -- longest accepted prefix: f[j] must equal g[j-1] --
                match = f[:, 1:] == g[:, :-1]                  # (B, kb-1)
                chain = jnp.cumprod(match.astype(jnp.int32), axis=1)
                c = 1 + jnp.sum(chain, axis=1)                 # (B,) in [1,kb]
            else:
                # -- rejection sampling against the warped target dists --
                # position j's logits govern emitted index n_w + 1 + j;
                # draft d_{j+1} = f[:, j+1] is accepted with prob p_j(d).
                #
                # Bounds-first design: draft membership and two-sided
                # acceptance bounds come from two fused reduction passes
                # over the vocab (nucleus_membership_bounds — no sort or
                # top_k), so certain accepts/rejects resolve immediately;
                # the exact warped normalizer (chunked k-space top_k over
                # all draft positions) runs under a lax.cond only when a
                # uniform lands in the narrow uncertainty band (width
                # <= p_full*(1/top_p - 1) per position). The rejection-
                # residual draw is only ever EMITTED at the boundary
                # position (the first rejection), so the accept+residual
                # warp runs on just (B, V) there — not (B*kb, V).
                rng, k_u, k_res = jax.random.split(rng, 3)
                # drafts aligned per position; the last position has none
                # (sentinel -1): after kb-1 accepts the fresh token comes
                # from the full warped distribution there.
                d_per_pos = jnp.concatenate(
                    [f[:, 1:], jnp.full((b, 1), -1, jnp.int32)], axis=1)
                w_all = logits if gen.temperature == 1.0 else (
                    logits / gen.temperature)
                w_pos = w_all[:, :-1, :].reshape(b * (kb - 1), -1)
                d_flat = f[:, 1:].reshape(-1)
                u = jax.random.uniform(k_u, (b, kb - 1))
                if gen.top_p < 1.0:
                    _, p_lo, p_hi = nucleus_membership_bounds(
                        w_pos, d_flat, gen.top_p)
                    p_lo = p_lo.reshape(b, kb - 1)
                    p_hi = p_hi.reshape(b, kb - 1)
                    uncertain = (u >= p_lo) & (u < p_hi)
                    unc_flat = uncertain.reshape(-1)
                    n_unc = jnp.sum(unc_flat.astype(jnp.int32))
                    # Fixed-budget exact resolution: the band is narrow but
                    # ANY of b*(kb-1) slots landing in it triggers exact
                    # resolution — near-certain per step at moderate
                    # peakedness — so the common case must be cheap. Gather
                    # up to m uncertain slots (expected count ~2-4; top_k
                    # on the flags lists set indices first), warp just
                    # those rows, scatter back. Overflow falls back to the
                    # all-positions chunked path.
                    m = min(max(b, 8), b * (kb - 1))

                    def exact_small(_):
                        flags, sel = jax.lax.top_k(
                            unc_flat.astype(jnp.float32), m)
                        p_sel = nucleus_p_draft(
                            w_pos[sel], d_flat[sel], gen.top_p)
                        p = jnp.zeros((b * (kb - 1),), jnp.float32)
                        p = p.at[sel].set(jnp.where(flags > 0, p_sel, 0.0))
                        return p.reshape(b, kb - 1)

                    def exact(_):
                        # chunked exact p over all draft positions; chunk
                        # rows bounded ~256 to cap the fp32/top_k
                        # transients that crashed the old dense path
                        budget = max(1, min(kb - 1, 256 // b))
                        cp = max(dv for dv in range(1, kb)
                                 if (kb - 1) % dv == 0 and dv <= budget)
                        nch = (kb - 1) // cp

                        def chunk(ci):
                            w_c = jax.lax.dynamic_slice_in_dim(
                                w_all, ci * cp, cp, axis=1)
                            d_c = jax.lax.dynamic_slice_in_dim(
                                d_per_pos, ci * cp, cp, axis=1)
                            return nucleus_p_draft(
                                w_c.reshape(b * cp, -1),
                                d_c.reshape(-1), gen.top_p,
                            ).reshape(b, cp)

                        if nch == 1:
                            return chunk(jnp.int32(0))
                        return jnp.moveaxis(
                            jax.lax.map(chunk, jnp.arange(nch)),
                            0, 1).reshape(b, kb - 1)

                    p_exact = jax.lax.cond(
                        n_unc > 0,
                        lambda _: jax.lax.cond(
                            n_unc <= m, exact_small, exact, None),
                        lambda _: jnp.zeros((b, kb - 1), jnp.float32),
                        None)
                    accept = jnp.where(uncertain, u < p_exact, u < p_lo)
                else:
                    # pure temperature sampling: p is the full softmax —
                    # exact from the logsumexp pass alone
                    wf = w_pos.astype(jnp.float32)
                    lse = jax.nn.logsumexp(wf, axis=-1)
                    l_d = wf[jnp.arange(b * (kb - 1)),
                             jnp.clip(d_flat, 0)]
                    accept = u < jnp.exp(l_d - lse).reshape(b, kb - 1)
                if forced_content:
                    # scripted sampled serving: the model's draw at emitted
                    # index n_emit + j IS the script token, so draft j+1 is
                    # accepted iff it matches it. The where-on-script>=0
                    # selects (always true at runtime, unprovable at compile
                    # time) keep the whole bounds/exact/residual computation
                    # live.
                    idxs = n_emit[:, None] + koff[None, :]
                    s_tok = jnp.take_along_axis(
                        script.astype(jnp.int32),
                        jnp.clip(idxs, 0, script.shape[1] - 1), axis=1)
                    accept = jnp.where(s_tok[:, :-1] >= 0,
                                       f[:, 1:] == s_tok[:, :-1], accept)
                chain = jnp.cumprod(accept.astype(jnp.int32), axis=1)
                n_acc = jnp.sum(chain, axis=1)                 # 0..kb-1
                c = n_acc + 1
                # boundary residual: position n_acc's draft was rejected
                # (or, at kb-1, the sentinel draws from the full warp)
                w_b = jnp.take_along_axis(
                    w_all, n_acc[:, None, None], axis=1)[:, 0]  # (B, V)
                d_b = jnp.take_along_axis(
                    d_per_pos, n_acc[:, None], axis=1)[:, 0]
                if gen.top_p < 1.0:
                    _, fresh_b = nucleus_accept_residual(
                        k_res, w_b, d_b, gen.top_p)
                else:
                    wbf = w_b.astype(jnp.float32)
                    masked = wbf.at[rows, jnp.clip(d_b, 0)].set(-jnp.inf)
                    w_res = jnp.where((d_b >= 0)[:, None], masked, wbf)
                    fresh_b = jax.random.categorical(
                        k_res, w_res, axis=-1).astype(jnp.int32)
                d_shift = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
                g = jnp.where(koff[None, :] < n_acc[:, None], d_shift,
                              fresh_b[:, None])
                if forced_content:
                    # accepted drafts equal the script by construction; the
                    # boundary position's "fresh draw" is scripted too
                    g = jnp.where(s_tok >= 0, s_tok, g)
            # EOS inside the block truncates it (the EOS itself is emitted)
            emitted_eos = (g == gen.eos_token_id) & (koff[None, :] < c[:, None])
            hit = jnp.any(emitted_eos, axis=1)
            first_eos = jnp.argmax(emitted_eos, axis=1)
            c = jnp.where(hit, jnp.minimum(c, first_eos + 1), c)
            c = jnp.minimum(c, max_new - n_emit)               # budget clip
            hit = jnp.any((g == gen.eos_token_id)
                          & (koff[None, :] < c[:, None]), axis=1)
            c = jnp.where(done, 0, c)
            hit = jnp.where(done, False, hit)

            # -- masked scatters of the emitted tokens --
            emit = koff[None, :] < c[:, None]
            idx = n_emit[:, None] + koff[None, :]
            idx_w = jnp.where(emit, idx, max_new)  # OOB -> dropped
            out = st["out"].at[rows[:, None], idx_w].set(
                g, mode="drop")
            hist = st["hist"].at[rows[:, None],
                                 jnp.where(emit, s + idx, s + max_new)].set(
                g, mode="drop")

            new_pending = jnp.where(
                c > 0,
                jnp.take_along_axis(
                    g, jnp.clip(c - 1, 0)[:, None], axis=1)[:, 0],
                pending)
            return dict(cache=cache, hist=hist, out=out, pending=new_pending,
                        n_emit=n_emit + c, done=done | hit,
                        n_steps=st["n_steps"] + 1, rng=rng)

        state = jax.lax.while_loop(cond, body, state)
        if return_stats:
            return state["out"], state["n_steps"]
        return state["out"]

    return generate


def make_spec_multimodal_generate_fn(
    model,
    gen: GenerationConfig,
    cache_dtype=jnp.bfloat16,
    block_len: int = 8,
    jit: bool = True,
    vision_microbatch: int = 128,
    return_stats: bool = False,
    prefill_chunk: Optional[int] = None,
    forced_content: bool = False,
    fanout: Optional[int] = None,
) -> Callable:
    """Speculative counterpart of generate.make_multimodal_generate_fn:
    generate(params, input_ids, images, question_ids, prompt_len, rng).
    ``forced_content``: see make_spec_generate_fn — appends a trailing
    ``script`` argument. ``fanout=n``: per-CASE inputs, vision encode +
    prefill once per case, n sample rows share the prompt KV (see
    make_spec_generate_fn); returns (C*n, max_new)."""
    from .generate import _microbatched_embeds

    gen_fn = make_spec_generate_fn(model, gen, cache_dtype, block_len,
                                   return_stats, prefill_chunk,
                                   forced_content, fanout=fanout)

    def generate(params, input_ids, images, question_ids, prompt_len, rng,
                 script=None):
        embeds = _microbatched_embeds(model, params, input_ids, images,
                                      question_ids, vision_microbatch)
        if forced_content:
            return gen_fn(params, embeds, input_ids, prompt_len, rng, script)
        return gen_fn(params, embeds, input_ids, prompt_len, rng)

    if jit:
        generate = jax.jit(generate)
    return generate
