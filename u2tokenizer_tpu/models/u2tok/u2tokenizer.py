"""μ²Tokenizer top module: SVR refinement + TTA aggregation + learned queries.

Reference: src/model/u2tokenizer/u2Tokenizer.py:6-47 and builder.py:3-15.
``(B, T, N, E)`` refined visual tokens and ``(B, S_text, E)`` question-token
embeddings are fused into ``(B, num_query_tokens, E)`` aligned tokens that
splice into the decoder's input embeddings.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...config import U2TokenizerConfig
from .svr import SpatioTemporalVisualTokenRefiner
from .tta import TextConditionTokenAggregator

Dtype = Any


class U2Tokenizer(nn.Module):
    embed_size: int
    cfg: U2TokenizerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v_token: jnp.ndarray, t_token: jnp.ndarray,
                 capture_attention: bool = False) -> jnp.ndarray:
        b = v_token.shape[0]
        query_tokens = self.param(
            "query_tokens",
            nn.initializers.normal(stddev=0.02),
            (1, self.cfg.num_query_tokens, self.embed_size),
            jnp.float32,
        )
        query = jnp.broadcast_to(
            query_tokens.astype(self.dtype),
            (b, self.cfg.num_query_tokens, self.embed_size))

        v_token = SpatioTemporalVisualTokenRefiner(
            embed_size=self.embed_size,
            num_heads=self.cfg.num_heads,
            num_layers=self.cfg.num_layers,
            top_k=self.cfg.top_k,
            use_multi_scale=self.cfg.use_multi_scale,
            attn_type=self.cfg.attn_type,
            enable_diffts=self.cfg.enable_diffts,
            enable_dmtp=self.cfg.enable_dmtp,
            max_seq_len=self.cfg.max_seq_len,
            scales=self.cfg.scales,
            diffts_tau=self.cfg.diffts_tau,
            dtype=self.dtype,
            name="svt_module",
        )(v_token, capture_attention=capture_attention)

        return TextConditionTokenAggregator(
            d_model=self.embed_size,
            num_layers=self.cfg.num_layers,
            num_heads=self.cfg.num_heads,
            attn_type=self.cfg.attn_type,
            max_seq_len=self.cfg.max_seq_len,
            dtype=self.dtype,
            name="tta_module",
        )(query, v_token, t_token, capture_attention=capture_attention)
