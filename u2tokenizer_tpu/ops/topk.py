"""Token-selection ops for the μ²tokenizer.

Hard top-k (reference src/model/u2tokenizer/svr.py:64-91) and the
differentiable soft selection (svr.py:93-117). The reference's DiffTS runs a
Python loop over all top_k selection heads; here it is a single einsum that
maps straight onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_topk_select(x: jax.Array, scores: jax.Array, k: int) -> jax.Array:
    """Select the k highest-scoring tokens.

    Args:
      x: (B, S, E) tokens (S = flattened frames*tokens).
      scores: (B, S) per-token scores.
      k: static number of tokens to keep.

    Returns:
      (B, k, E) tokens ordered by descending score, matching
      torch.topk + gather semantics (svr.py:79-89). Gradients flow only
      through the gathered tokens, not the scores — intentionally identical
      to the reference (SURVEY.md §7 "hard parts").
    """
    _, idx = jax.lax.top_k(scores, k)  # (B, k), sorted descending
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def soft_topk_select(x: jax.Array, scores: jax.Array, tau: float = 1.0) -> jax.Array:
    """Differentiable token selection (DiffTS).

    Args:
      x: (B, S, E) tokens.
      scores: (B, S, K) selection-head logits (score_net output, svr.py:97).
      tau: softmax temperature.

    Returns:
      (B, K, E): each output token is a softmax(scores/tau, over S)-weighted
      sum of all input tokens — the einsum form of svr.py:106-116.
    """
    weights = jax.nn.softmax(scores / tau, axis=1)  # (B, S, K), softmax over tokens
    return jnp.einsum("bsk,bse->bke", weights, x)
