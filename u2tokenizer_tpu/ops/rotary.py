"""Rotary position embedding ops (GPT-NeoX half-rotate layout).

Used by both the μ²tokenizer's RotaryMultiheadAttention (reference
src/model/u2tokenizer/rope.py:6-91, theta 10000, cached to max_seq_len) and
the Qwen3/Llama decoder stacks (theta per HF config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                 dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given positions.

    Args:
      positions: int array of any shape P (e.g. (S,) or (B, S)).
      head_dim: rotary dimension (must be even).

    Returns:
      (cos, sin), each shaped P + (head_dim,): frequencies for dim i and
      i + head_dim/2 are identical (concatenated-halves layout, matching
      rope.py:33-38).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half * 1.0))
    # reference: 10000 ** (arange(0, d, 2) / d) == theta ** (arange(half)/half)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # P + (half,)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    """(-x2, x1) for x split into halves along the last dim (rope.py:6-9)."""
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding.

    Args:
      x: (..., S, H, D) or (..., S, D) — cos/sin must broadcast against it
        after inserting the head axis.
      cos/sin: (S, D) or (B, S, D).
    """
    if cos.ndim < x.ndim:  # insert the head axis: (.., S, D) -> (.., S, 1, D)
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    c = cos.astype(x.dtype)
    s = sin.astype(x.dtype)
    return x * c + rotate_half(x) * s
