"""TTA — Text-conditioned Token Aggregator.

Reference: src/model/u2tokenizer/tta.py. Per layer (tta.py:93-107): query
self-attention (+residual, LN), cross-attention to refined visual tokens
(+residual, LN), cross-attention to text-prompt token embeddings
(+residual, LN). A final ``LinearAggregation`` cross-attends the queries
onto the raw visual values with ``is_compress=True`` — no value projection
and no output projection (tta.py:47-65, 109-116).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .attention import MultiHeadCrossAttention, make_self_attention

Dtype = Any


class TextConditionTokenAttMap(nn.Module):
    """One TTA layer (tta.py:72-107)."""

    d_model: int
    num_heads: int
    attn_type: str = "rma"
    max_seq_len: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual_query, visual_value, text_value,
                 capture_attention: bool = False):
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        self_attn = make_self_attention(
            self.attn_type, self.d_model, self.num_heads,
            self.max_seq_len, self.dtype, "self_attention")
        cross_v = MultiHeadCrossAttention(
            self.d_model, self.num_heads, dtype=self.dtype,
            name="visual_cross_attention")
        cross_t = MultiHeadCrossAttention(
            self.d_model, self.num_heads, dtype=self.dtype,
            name="text_cross_attention")

        self_out = self_attn(visual_query, visual_query, visual_query,
                             capture_attention=capture_attention)
        self_out = ln("norm_self")(visual_query + self_out)
        cross_out = cross_v(self_out, visual_value,
                            capture_attention=capture_attention)
        cross_out_visual = ln("norm_cross_v")(self_out + cross_out)
        cross_out_vt = cross_t(cross_out_visual, text_value,
                               capture_attention=capture_attention)
        return ln("norm_cross_t")(cross_out_visual + cross_out_vt)


class LinearAggregation(nn.Module):
    """Final compressing cross attention (tta.py:109-116)."""

    d_model: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query_vt, visual_value):
        agg = MultiHeadCrossAttention(
            self.d_model, self.num_heads, dtype=self.dtype,
            name="linear_aggregator")
        return agg(query_vt, visual_value, is_compress=True)


class TextConditionTokenAggregator(nn.Module):
    """Full TTA stack (tta.py:118-140)."""

    d_model: int
    num_layers: int
    num_heads: int
    attn_type: str = "rma"
    max_seq_len: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, visual_value, text_value,
                 capture_attention: bool = False):
        for i in range(self.num_layers):
            # reference captures maps from the first layer only (tta.py:126-134)
            query = TextConditionTokenAttMap(
                self.d_model, self.num_heads, self.attn_type,
                self.max_seq_len, self.dtype, name=f"layers_vt_{i}")(
                    query, visual_value, text_value,
                    capture_attention=capture_attention and i == 0)
        return LinearAggregation(
            self.d_model, self.num_heads, self.dtype,
            name="layer_linagg")(query, visual_value)
