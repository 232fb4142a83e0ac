"""Attention modules for the μ²tokenizer.

Three flavors, mirroring the reference's ``attn_type`` switch
(src/model/u2tokenizer/svr.py:10-18, tta.py:79-84):

  * ``RelativeMultiheadAttention`` — MHA + learned relative-position bias
    table (rma.py:5-83).
  * ``RotaryMultiheadAttention`` — MHA with rotary embeddings, theta 10000
    (rope.py:17-91).
  * ``MultiHeadCrossAttention`` — plain cross attention with the
    ``is_compress`` mode that skips W_v and the output projection
    (tta.py:7-70).

All operate batch-first on (B, S, E).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import relative_position_bias, sdpa
from ...ops.rotary import apply_rope, rope_cos_sin

Dtype = Any

# Attention-map introspection (the reference's return_attn paths feeding the
# demo notebook, svr.py:50-62 / tta.py:126-140): modules sow their softmax
# probabilities into the 'intermediates' collection; retrieve with
#   out, state = module.apply(params, ..., mutable=["intermediates"],
#                             capture_attention=True)


def _attn_probs(q, k, bias=None, scale=None):
    import jax

    depth = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (depth ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, e = x.shape
    return x.reshape(b, s, num_heads, e // num_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)


class RelativeMultiheadAttention(nn.Module):
    d_model: int
    num_heads: int
    max_seq_len: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, is_compress: bool = False,
                 capture_attention: bool = False):
        seq_len = query.shape[1]
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        q = _split_heads(dense("wq")(query), self.num_heads)
        k = _split_heads(dense("wk")(key), self.num_heads)
        if is_compress:
            v = _split_heads(value, self.num_heads)
        else:
            v = _split_heads(dense("wv")(value), self.num_heads)

        table = self.param(
            "relative_bias",
            nn.initializers.zeros,
            (2 * self.max_seq_len - 1, self.num_heads),
            jnp.float32,
        )
        bias = relative_position_bias(table, seq_len, self.max_seq_len)
        if capture_attention:
            self.sow("intermediates", "attn", _attn_probs(q, k, bias=bias))
        out = _merge_heads(sdpa(q, k, v, bias=bias))
        if is_compress:
            return out
        return dense("dense")(out)


class RotaryMultiheadAttention(nn.Module):
    d_model: int
    num_heads: int
    max_seq_len: int = 512
    theta: float = 10_000.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, capture_attention: bool = False):
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        q = _split_heads(dense("wq")(query), self.num_heads)
        k = _split_heads(dense("wk")(key), self.num_heads)
        v = _split_heads(dense("wv")(value), self.num_heads)

        head_dim = self.d_model // self.num_heads
        cos, sin = rope_cos_sin(jnp.arange(query.shape[1]), head_dim, self.theta)
        q = apply_rope(q, cos, sin)
        cos_k, sin_k = rope_cos_sin(jnp.arange(key.shape[1]), head_dim, self.theta)
        k = apply_rope(k, cos_k, sin_k)

        if capture_attention:
            self.sow("intermediates", "attn", _attn_probs(q, k))
        out = _merge_heads(sdpa(q, k, v))
        return dense("dense")(out)


class VanillaMultiheadAttention(nn.Module):
    """Plain batch-first MHA (the reference's fallback is nn.MultiheadAttention,
    svr.py:17-18 — note the reference feeds it batch-first tensors despite
    torch's seq-first default; we implement the batch-first semantics)."""

    d_model: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, capture_attention: bool = False):
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        q = _split_heads(dense("wq")(query), self.num_heads)
        k = _split_heads(dense("wk")(key), self.num_heads)
        v = _split_heads(dense("wv")(value), self.num_heads)
        if capture_attention:
            self.sow("intermediates", "attn", _attn_probs(q, k))
        out = _merge_heads(sdpa(q, k, v))
        return dense("dense")(out)


def make_self_attention(attn_type: str, d_model: int, num_heads: int,
                        max_seq_len: int, dtype: Dtype, name: str) -> nn.Module:
    if attn_type == "rma":
        return RelativeMultiheadAttention(
            d_model, num_heads, max_seq_len=max_seq_len, dtype=dtype, name=name)
    if attn_type == "rope":
        return RotaryMultiheadAttention(
            d_model, num_heads, max_seq_len=max_seq_len, dtype=dtype, name=name)
    return VanillaMultiheadAttention(d_model, num_heads, dtype=dtype, name=name)


class MultiHeadCrossAttention(nn.Module):
    """Cross attention (tta.py:7-70). ``is_compress=True`` attends raw values
    (no W_v) and skips the output projection — used by LinearAggregation."""

    d_model: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, is_compress: bool = False,
                 capture_attention: bool = False):
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        q = _split_heads(dense("wq")(query), self.num_heads)
        k = _split_heads(dense("wk")(value), self.num_heads)
        if is_compress:
            v = _split_heads(value, self.num_heads)
        else:
            v = _split_heads(dense("wv")(value), self.num_heads)
        if capture_attention:
            self.sow("intermediates", "attn", _attn_probs(q, k))
        out = _merge_heads(sdpa(q, k, v))
        if is_compress:
            return out
        return dense("dense")(out)
