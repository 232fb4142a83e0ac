"""Rotary position embedding ops (GPT-NeoX half-rotate layout).

Used by both the μ²tokenizer's RotaryMultiheadAttention (reference
src/model/u2tokenizer/rope.py:6-91, theta 10000, cached to max_seq_len) and
the Qwen3/Llama decoder stacks (theta per HF config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def llama3_scale_inv_freq(inv_freq: jax.Array, factor: float,
                          low_freq_factor: float, high_freq_factor: float,
                          original_max_position: int) -> jax.Array:
    """Llama-3.x rope frequency rescaling (HF rope_scaling type 'llama3').

    Low-frequency components (wavelength > original context / low_freq_factor)
    are slowed by ``factor``; high-frequency ones kept; the band between is
    linearly interpolated. Required to load released Llama-3.2 μ² checkpoints
    (base_model_tokenizers/Llama-3.2-1B-Instruct/config.json rope_scaling).
    """
    wavelen = 2.0 * jnp.pi / inv_freq
    low_freq_wavelen = original_max_position / low_freq_factor
    high_freq_wavelen = original_max_position / high_freq_factor
    smooth = (original_max_position / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor)
    smoothed = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    out = jnp.where(wavelen > low_freq_wavelen, inv_freq / factor,
                    jnp.where(wavelen < high_freq_wavelen, inv_freq, smoothed))
    return out


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                 dtype=jnp.float32, scaling=None) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given positions.

    Args:
      positions: int array of any shape P (e.g. (S,) or (B, S)).
      head_dim: rotary dimension (must be even).
      scaling: optional (type, factor, low_freq, high_freq, original_max)
        tuple; only 'llama3' is implemented.

    Returns:
      (cos, sin), each shaped P + (head_dim,): frequencies for dim i and
      i + head_dim/2 are identical (concatenated-halves layout, matching
      rope.py:33-38).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half * 1.0))
    # reference: 10000 ** (arange(0, d, 2) / d) == theta ** (arange(half)/half)
    if scaling is not None and scaling[0]:
        kind, factor, low, high, orig = scaling
        if kind != "llama3":
            raise ValueError(f"unsupported rope scaling: {kind}")
        inv_freq = llama3_scale_inv_freq(inv_freq, factor, low, high, orig)
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
