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
        logits = top_p_filter(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
