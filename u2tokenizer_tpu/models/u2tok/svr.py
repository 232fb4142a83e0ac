"""SVR — Spatio-temporal Visual token Refiner.

Reference: src/model/u2tokenizer/svr.py. Per layer, tokens attend spatially
within each chunk (over N) and then temporally across chunks (over T); the
reference implements this by folding (B,T,N,E) to (B·T,N,E) and (B·N,T,E)
respectively (svr.py:23-40) — plain batched attention with NO residuals or
layer norms (a deliberate parity quirk). After the attention stack: token
selection (hard top-k or DiffTS), then optional multi-scale pooling (fixed
scales or gated DMTP).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.pooling import dynamic_multi_scale_pool, multi_scale_pool
from ...ops.topk import hard_topk_select, soft_topk_select
from .attention import make_self_attention

Dtype = Any


class SpatioTemporalAttentionLayer(nn.Module):
    """One factorized spatial+temporal attention layer (svr.py:7-40)."""

    embed_size: int
    num_heads: int
    attn_type: str = "rma"
    max_seq_len: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 capture_attention: bool = False) -> jnp.ndarray:
        b, t, n, e = x.shape
        spatial = make_self_attention(
            self.attn_type, self.embed_size, self.num_heads,
            self.max_seq_len, self.dtype, "spatial_attention")
        temporal = make_self_attention(
            self.attn_type, self.embed_size, self.num_heads,
            self.max_seq_len, self.dtype, "temporal_attention")

        xs = x.reshape(b * t, n, e)
        xs = spatial(xs, xs, xs, capture_attention=capture_attention)
        x = xs.reshape(b, t, n, e)

        xt = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * n, t, e)
        xt = temporal(xt, xt, xt, capture_attention=capture_attention)
        x = jnp.transpose(xt.reshape(b, n, t, e), (0, 2, 1, 3))
        return x


class TokenSelection(nn.Module):
    """Hard top-k over all T·N tokens (svr.py:64-91)."""

    embed_size: int
    top_k: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, n, e = x.shape
        scores = nn.Dense(1, dtype=self.dtype, name="score_net")(x)  # (B,T,N,1)
        flat = x.reshape(b, t * n, e)
        return hard_topk_select(flat, scores.reshape(b, t * n), self.top_k)


class DifferentiableTokenSelection(nn.Module):
    """Soft top-k: per-head softmax-weighted sums (svr.py:93-117), computed
    as one einsum instead of the reference's Python loop over heads."""

    embed_size: int
    top_k: int
    tau: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, n, e = x.shape
        scores = nn.Dense(self.top_k, dtype=self.dtype, name="score_net")(x)
        return soft_topk_select(
            x.reshape(b, t * n, e), scores.reshape(b, t * n, self.top_k), self.tau)


class DynamicMultiScalePooling(nn.Module):
    """Gated multi-scale pooling (svr.py:119-151)."""

    embed_size: int
    scales: Sequence[int] = (1, 2, 4)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("gate_kernel", nn.initializers.lecun_normal(),
                            (self.embed_size, 1), jnp.float32)
        bias = self.param("gate_bias", nn.initializers.zeros, (1,), jnp.float32)
        return dynamic_multi_scale_pool(x, kernel.astype(x.dtype),
                                        bias.astype(x.dtype), self.scales)


class SpatioTemporalVisualTokenRefiner(nn.Module):
    """Full SVR stack (svr.py:153-188)."""

    embed_size: int
    num_heads: int
    num_layers: int
    top_k: int
    use_multi_scale: bool = True
    attn_type: str = "rma"
    enable_diffts: bool = False
    enable_dmtp: bool = False
    max_seq_len: int = 512
    scales: Sequence[int] = (1, 2, 4)
    diffts_tau: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 capture_attention: bool = False) -> jnp.ndarray:
        for i in range(self.num_layers):
            # reference captures attention maps from the first layer only
            # (svr.py:50-62)
            x = SpatioTemporalAttentionLayer(
                self.embed_size, self.num_heads, self.attn_type,
                self.max_seq_len, self.dtype, name=f"layers_{i}")(
                    x, capture_attention=capture_attention and i == 0)

        if self.enable_diffts:
            x = DifferentiableTokenSelection(
                self.embed_size, self.top_k, self.diffts_tau, self.dtype,
                name="token_selection")(x)
        else:
            x = TokenSelection(self.embed_size, self.top_k, self.dtype,
                               name="token_selection")(x)

        if self.use_multi_scale:
            if self.enable_dmtp:
                x = DynamicMultiScalePooling(
                    self.embed_size, self.scales, self.dtype,
                    name="dynamic_pool")(x)
            else:
                x = multi_scale_pool(x, self.scales)
        return x
