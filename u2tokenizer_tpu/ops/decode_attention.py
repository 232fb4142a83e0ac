"""Pallas fused decode attention over the int8 KV cache.

The 768-step decode loop is cache-bandwidth bound (BENCHMARKS.md): per step
every layer streams its full (B, S, Hkv, D) int8 K/V plus scales. The XLA
einsum path expresses dequantization as separate convert/multiply ops whose
fusion is at the compiler's mercy; this kernel makes the ideal explicit —
one pass over the cache per (batch, kv-head), int8 converted in registers,
per-key scales folded into scores/probs, the decode position mask computed
from two scalars instead of a materialized (B, 1, 1, S) bool tensor.

Mask semantics (models/generate.py decode step): key j is visible iff
``j < prompt_len[b]`` (the right-padded prompt) or ``s_prompt <= j < end[b]``
(generated tokens so far, living at slots [s_prompt, s_prompt + step]).

Grid: (B, Hkv); each program handles the ``group`` q heads of one kv head —
q (group, D), K/V (S, D) int8, scales (S,) — all VMEM-resident (S=1792:
229 KB per int8 buffer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(plen_ref, end_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                   o_ref, *, s_prompt: int, scale: float):
    """One batch row per program over the head-major cache; static head loop.

    Blocks: q/out (1, Hkv, group, D); k/v (1, Hkv, S, D) int8, contiguous per
    head; scales (1, Hkv, S). One program per row keeps the grid small (the
    per-(b,h) variant measured ~10% slower from program overhead) and the
    3.7 MB k+v block still double-buffers within VMEM.
    """
    b = pl.program_id(0)
    sk = k_ref.shape[2]
    group = q_ref.shape[2]
    hkv = k_ref.shape[1]
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (group, sk), 1)
    visible = (kv_idx < plen_ref[b]) | (
        (kv_idx >= s_prompt) & (kv_idx < end_ref[b]))
    for h in range(hkv):  # static unroll; per-head K/V are contiguous
        q = (q_ref[0, h] * jnp.asarray(scale, q_ref.dtype))  # (group, D)
        scores = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k_ref[0, h].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (group, S)
        scores = scores * ks_ref[0, h].astype(jnp.float32)[None, :]
        scores = jnp.where(visible, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs_ref[0, h].astype(jnp.float32)[None, :]    # fold v scales
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0, h].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (group, D)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _reference(q, k_int, k_scale, v_int, v_scale, prompt_len, end,
               s_prompt, scale):
    """XLA fallback (CPU tests) with identical semantics."""
    from .attention import gqa_sdpa_quantized

    sk = k_int.shape[2]
    kv = jnp.arange(sk)
    visible = (kv[None, :] < prompt_len[:, None]) | (
        (kv[None, :] >= s_prompt) & (kv[None, :] < end[:, None]))
    return gqa_sdpa_quantized(q, k_int, k_scale, v_int, v_scale,
                              mask=visible[:, None, None, :], scale=scale)


def decode_attention_quantized(
    q: jax.Array,          # (B, 1, H, D)
    k_int: jax.Array,      # (B, Hkv, S, D) int8/int4 — head-major cache
    k_scale: jax.Array,    # (B, Hkv, S)
    v_int: jax.Array,      # (B, Hkv, S, D) int8/int4
    v_scale: jax.Array,    # (B, Hkv, S)
    prompt_len: jax.Array,  # (B,) int32
    end: jax.Array,         # (B,) int32: one past the last generated slot
    s_prompt: int,
    scale: float = None,
    interpret: bool = None,
) -> jax.Array:
    """Single-token GQA decode attention over the quantized cache ->
    (B, 1, H, D). The kernel body is dtype-generic (values convert to bf16
    in registers), so an int4 cache streams at half the int8 HBM bytes —
    int4 block loads need Mosaic int4 support and are gated opt-in at the
    decoder (``U2_INT4_DECODE_KERNEL=1``) until validated on hardware."""
    b, _, h, d = q.shape
    hkv, sk = k_int.shape[1], k_int.shape[2]
    group = h // hkv
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if interpret is None:
        if jax.default_backend() == "cpu":
            return _reference(q, k_int, k_scale, v_int, v_scale,
                              prompt_len, end, s_prompt, scale)
        interpret = False

    # K/V are consumed in their native head-major (B, Hkv, S, D) cache
    # layout: each program reads one head's contiguous K/V exactly once.
    qg = q.reshape(b, hkv, group, d)                       # (B, Hkv, group, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, group, d), lambda bi, p, e: (bi, 0, 0, 0)),
            pl.BlockSpec((1, hkv, sk, d), lambda bi, p, e: (bi, 0, 0, 0)),
            pl.BlockSpec((1, hkv, sk), lambda bi, p, e: (bi, 0, 0)),
            pl.BlockSpec((1, hkv, sk, d), lambda bi, p, e: (bi, 0, 0, 0)),
            pl.BlockSpec((1, hkv, sk), lambda bi, p, e: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hkv, group, d),
                               lambda bi, p, e: (bi, 0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, s_prompt=s_prompt, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, d), q.dtype),
        interpret=interpret,
    )(prompt_len.astype(jnp.int32), end.astype(jnp.int32),
      qg, k_int, k_scale, v_int, v_scale)
    return out.reshape(b, 1, h, d)


# backwards-compatible name (the kernel predates int4 support)
decode_attention_int8 = decode_attention_quantized
