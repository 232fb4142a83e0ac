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


def top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Mask logits outside the nucleus: keep the smallest set of tokens whose
    cumulative probability >= top_p (HF TopPLogitsWarper semantics: tokens
    with cumulative probability above the threshold are removed, but the
    first token above the threshold is kept)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # Keep tokens where the cumulative probability *before* this token < top_p.
    keep_sorted = (cum - sorted_probs) < top_p
    # Threshold logit: smallest kept logit per row.
    num_keep = jnp.sum(keep_sorted, axis=-1)  # >= 1
    idx = jnp.clip(num_keep - 1, 0, logits.shape[-1] - 1)
    threshold = jnp.take_along_axis(sorted_logits, idx[..., None], axis=-1)
    return jnp.where(logits >= threshold, logits, -jnp.inf)


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
