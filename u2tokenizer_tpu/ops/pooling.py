"""Pooling ops: multi-scale token pooling and the SPP 3D average pool.

References: fixed multi-scale pooling src/model/u2tokenizer/svr.py:173-184,
dynamic gated pooling (DMTP) svr.py:119-151, spatial pooling projector
src/model/multimodal_projector/spatial_pooling_projector.py:34-52.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def avg_pool_tokens(x: jax.Array, scale: int) -> jax.Array:
    """Non-overlapping 1D average pool over the token axis.

    Equivalent to F.avg_pool1d(kernel=scale, stride=scale) on (B, S, E):
    trailing tokens that don't fill a window are dropped (floor semantics).
    """
    if scale == 1:
        return x
    b, s, e = x.shape
    s_out = s // scale
    return jnp.mean(x[:, : s_out * scale].reshape(b, s_out, scale, e), axis=2)


def multi_scale_pool(x: jax.Array, scales: Sequence[int] = (1, 2, 4)) -> jax.Array:
    """Fixed multi-scale pooling: concat of avg-pools at each scale
    (svr.py:177-184). For S=1024 and scales (1,2,4) → 1024+512+256 = 1792."""
    outs = [avg_pool_tokens(x, s) for s in scales if x.shape[1] >= s]
    return jnp.concatenate(outs, axis=1)


def dynamic_multi_scale_pool(
    x: jax.Array,
    gate_kernel: jax.Array,
    gate_bias: jax.Array,
    scales: Sequence[int] = (1, 2, 4),
) -> jax.Array:
    """DMTP: per-scale scalar gates, softmax over scales, weighted concat
    (svr.py:126-151).

    Args:
      x: (B, S, E).
      gate_kernel: (E, 1) gate linear weight; gate_bias: (1,).
    """
    pooled = [avg_pool_tokens(x, s) for s in scales if x.shape[1] >= s]
    gates = jnp.concatenate(
        [jnp.mean(p, axis=1) @ gate_kernel + gate_bias for p in pooled], axis=1
    )  # (B, num_scales)
    weights = jax.nn.softmax(gates, axis=1)
    weighted = [p * weights[:, i][:, None, None] for i, p in enumerate(pooled)]
    return jnp.concatenate(weighted, axis=1)


def spatial_pool_3d(x: jax.Array, grid: Tuple[int, int, int], pool: int) -> jax.Array:
    """SPP spatial pooling: (B, S, E) tokens viewed as a 3D ``grid``,
    avg_pool3d(kernel=pool, stride=pool), flattened back to tokens.

    Parity note: ``grid`` is the *declared* grid (64, 16, 2) from
    spatial_pooling_projector.py:14, not the runtime patch geometry — the
    index semantics of the reference's Rearrange are preserved exactly.
    """
    b, s, e = x.shape
    g0, g1, g2 = grid
    assert s == g0 * g1 * g2, f"token count {s} != grid {grid}"
    o0, o1, o2 = g0 // pool, g1 // pool, g2 // pool
    x = x.reshape(b, g0, g1, g2, e)[:, : o0 * pool, : o1 * pool, : o2 * pool]
    x = x.reshape(b, o0, pool, o1 * pool, o2 * pool, e)
    x = x.reshape(b, o0, pool, o1, pool, o2, pool, e)
    return jnp.mean(x, axis=(2, 4, 6)).reshape(b, o0 * o1 * o2, e)


def sequence_pool(x: jax.Array, pool: int) -> jax.Array:
    """SPP 'sequence' pooling: 1D avg pool with kernel pool**3
    (spatial_pooling_projector.py:44-47)."""
    return avg_pool_tokens(x, pool ** 3)
