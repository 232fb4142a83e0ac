"""Attention compute ops.

Functional scaled-dot-product attention used by every module in the framework
(μ²tokenizer RMA/RoPE/cross attention, 3D ViT blocks, and the decoder).

Two paths:
  * ``sdpa`` — plain XLA einsum formulation. For the small/medium sequence
    lengths in this model family (8..2049 tokens) XLA already fuses the
    softmax into the matmuls well; it is also the reference-semantics path
    used by parity tests.
  * ``flash_attention`` (ops/flash_attention.py) — Pallas blocked
    flash-attention kernel for the long-sequence hot spots (ViT 2049-token
    self-attention, decoder prefill).

Reference semantics being matched: src/model/u2tokenizer/rma.py:45-83
(scores/sqrt(d) + bias, softmax, weighted sum) and
src/model/u2tokenizer/tta.py:42-70 (cross attention, optional ``is_compress``
which skips the value projection and the output projection).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    softmax_in_fp32: bool = True,
) -> jax.Array:
    """Scaled dot-product attention.

    Args:
      q: (B, Sq, H, D) queries.
      k: (B, Sk, H, D) keys.
      v: (B, Sk, H, Dv) values.
      bias: optional additive bias broadcastable to (B, H, Sq, Sk).
      mask: optional boolean mask broadcastable to (B, H, Sq, Sk);
        False positions are masked out.
      scale: score scale; defaults to 1/sqrt(D).

    Returns:
      (B, Sq, H, Dv) attention output in q.dtype.
    """
    depth = q.shape[-1]
    if scale is None:
        scale = 1.0 / (depth ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    scores = scores * jnp.asarray(scale, dtype=scores.dtype)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    if softmax_in_fp32:
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def gqa_sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Grouped-query attention: q has H heads, k/v have Hkv heads, H % Hkv == 0.

    Args:
      q: (B, Sq, H, D)
      k/v: (B, Sk, Hkv, D)
      mask: broadcastable to (B, H, Sq, Sk) boolean.
    """
    b, sq, h, d = q.shape
    hkv = k.shape[2]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    group = h // hkv
    qg = q.reshape(b, sq, hkv, group, d)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k) * jnp.asarray(scale, q.dtype)
    if mask is not None:
        sk = k.shape[1]
        m = jnp.broadcast_to(mask, (b, h, sq, sk)).reshape(b, hkv, group, sq, sk)
        scores = jnp.where(m, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(b, sq, h, d)


def causal_mask(sq: int, sk: int, offset: int = 0) -> jax.Array:
    """Boolean (1, 1, sq, sk) causal mask; query i attends keys <= i + offset."""
    qi = jnp.arange(sq)[:, None] + offset
    ki = jnp.arange(sk)[None, :]
    return (ki <= qi)[None, None, :, :]


def relative_position_bias(table: jax.Array, seq_len: int, max_seq_len: int) -> jax.Array:
    """Learned relative-position bias lookup.

    Matches src/model/u2tokenizer/rma.py:66-73: ``table`` has shape
    (2*max_seq_len - 1, H); entry for (query i, key j) is
    table[(j - i) + max_seq_len - 1]. Returns (1, H, S, S).
    """
    pos = jnp.arange(seq_len)
    rel = pos[None, :] - pos[:, None] + (max_seq_len - 1)  # (S, S)
    bias = jnp.take(table, rel, axis=0)  # (S, S, H)
    return jnp.transpose(bias, (2, 0, 1))[None]


def quantize_kv(x: jax.Array, eps: float = 1e-6, dtype=jnp.int8):
    """Per-(position, head) symmetric int8/int4 quantization of K/V rows.

    x: (B, S, H, D) -> (quantized values, (B, S, H, 1) scales). The scale
    factors out of the attention algebra exactly: scores use k_int * k_scale
    and the value reduction uses (probs * v_scale) @ v_int, so the cache is
    read from HBM at one byte (int8) / half a byte (int4) per element.
    """
    levels = 7.0 if dtype == jnp.int4 else 127.0
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / levels
    scale = jnp.maximum(scale, eps)
    q = jnp.clip(jnp.round(x / scale), -levels, levels).astype(dtype)
    return q, scale.astype(jnp.bfloat16)


def gqa_sdpa_headmajor(
    q: jax.Array,            # (B, Sq, H, D)
    k: jax.Array,            # (B, Hkv, Sk, D) — head-major cache layout
    v: jax.Array,            # (B, Hkv, Sk, D)
    *,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """GQA attention with head-major K/V (the KV-cache storage layout:
    each head's keys contiguous, see decoder.KVCache)."""
    b, sq, h, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    group = h // hkv
    qg = q.reshape(b, sq, hkv, group, d)
    scores = jnp.einsum("bqhgd,bhkd->bhgqk", qg, k) * jnp.asarray(
        scale, q.dtype)
    if mask is not None:
        m = jnp.broadcast_to(mask, (b, h, sq, sk)).reshape(b, hkv, group, sq, sk)
        scores = jnp.where(m, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgqk,bhkd->bqhgd", probs, v)
    return out.reshape(b, sq, h, d)


def gqa_sdpa_fanout(
    q: jax.Array,             # (B, Sq, H, D) with B = C * fanout
    pk: jax.Array,            # (C, Hkv, Sp, D) shared prefix keys
    pv: jax.Array,            # (C, Hkv, Sp, D)
    sk: jax.Array,            # (B, Hkv, St, D) per-row suffix keys
    sv: jax.Array,            # (B, Hkv, St, D)
    *,
    pk_scale: Optional[jax.Array] = None,   # (C, Hkv, Sp) int8/int4 scales
    pv_scale: Optional[jax.Array] = None,
    sk_scale: Optional[jax.Array] = None,   # (B, Hkv, St)
    sv_scale: Optional[jax.Array] = None,
    prefix_mask: Optional[jax.Array] = None,  # (C, Sp) valid prefix keys
    suffix_mask: Optional[jax.Array] = None,  # bcast to (B, H, Sq, St)
    scale: Optional[float] = None,
) -> jax.Array:
    """GQA attention over a FAN-OUT-SHARED prefix cache plus a per-row
    suffix cache, with one joint softmax — mathematically identical to
    attending the concatenated [prefix ; suffix] cache, but the prefix
    K/V are stored (and streamed from HBM) once per *case* instead of once
    per sample row.

    Motivation: the GREEN/DPO protocol samples N=8 completions from the
    SAME multimodal prompt (green_refactored/pred_then_green.py:77,
    num_return_sequences=8). Tiling the prompt KV N× makes the decode loop
    read N identical copies every step; at S=1024/B=64 the prompt KV is the
    dominant decode HBM traffic. Sharing it turns O(C·N·Sp) reads into
    O(C·Sp).

    Shapes: q rows are grouped per case — row c*fanout+j is sample j of
    case c (jnp.repeat(x, fanout, axis=0) layout). Either cache may be
    int8/int4-quantized (pass its scales); scales factor out of the dots
    exactly as in gqa_sdpa_quantized.
    """
    b, sq, h, d = q.shape
    c, hkv, sp = pk.shape[0], pk.shape[1], pk.shape[2]
    st = sk.shape[2]
    fanout = b // c
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    group = h // hkv
    neg = jnp.finfo(jnp.float32).min

    # -- prefix scores: q regrouped (C, n, Sq, Hkv, G, D) against (C, ...) --
    qg = q.reshape(c, fanout, sq, hkv, group, d)
    ps = jnp.einsum("cnqhgd,chkd->cnhgqk", qg,
                    pk.astype(q.dtype)) * jnp.asarray(scale, q.dtype)
    if pk_scale is not None:
        ps = ps * pk_scale.astype(q.dtype)[:, None, :, None, None, :]
    ps = ps.astype(jnp.float32)
    if prefix_mask is not None:
        ps = jnp.where(prefix_mask[:, None, None, None, None, :], ps, neg)
    ps = ps.reshape(b, hkv, group, sq, sp)

    # -- suffix scores: standard head-major per-row path --
    qs = q.reshape(b, sq, hkv, group, d)
    ss = jnp.einsum("bqhgd,bhkd->bhgqk", qs,
                    sk.astype(q.dtype)) * jnp.asarray(scale, q.dtype)
    if sk_scale is not None:
        ss = ss * sk_scale.astype(q.dtype)[:, :, None, None, :]
    ss = ss.astype(jnp.float32)
    if suffix_mask is not None:
        m = jnp.broadcast_to(suffix_mask, (b, h, sq, st)).reshape(
            b, hkv, group, sq, st)
        ss = jnp.where(m, ss, neg)

    # -- joint softmax over [prefix ; suffix] keys --
    probs = jax.nn.softmax(
        jnp.concatenate([ps, ss], axis=-1), axis=-1).astype(q.dtype)
    pp, sp_probs = probs[..., :sp], probs[..., sp:]

    # fold per-key v scales into the probabilities (prefix regrouped per case)
    ppg = pp.reshape(c, fanout, hkv, group, sq, sp)
    if pv_scale is not None:
        ppg = ppg * pv_scale.astype(q.dtype)[:, None, :, None, None, :]
    out_p = jnp.einsum("cnhgqk,chkd->cnqhgd", ppg, pv.astype(q.dtype))
    if sv_scale is not None:
        sp_probs = sp_probs * sv_scale.astype(q.dtype)[:, :, None, None, :]
    out_s = jnp.einsum("bhgqk,bhkd->bqhgd", sp_probs, sv.astype(q.dtype))
    return out_p.reshape(b, sq, h, d) + out_s.reshape(b, sq, h, d)


def gqa_sdpa_quantized(
    q: jax.Array,            # (B, Sq, H, D)
    k_int: jax.Array,        # (B, Hkv, Sk, D) int8 — head-major cache layout
    k_scale: jax.Array,      # (B, Hkv, Sk)
    v_int: jax.Array,        # (B, Hkv, Sk, D) int8
    v_scale: jax.Array,      # (B, Hkv, Sk)
    *,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """GQA attention over the int8-quantized head-major KV cache.

    The int8 operands convert on the fly inside the dots (XLA fuses the
    convert into the HBM read), so decode traffic halves versus bf16.
    Scales arrive in the padding-free (B, Hkv, Sk) storage layout
    (see KVCache.create).
    """
    b, sq, h, d = q.shape
    hkv, sk = k_int.shape[1], k_int.shape[2]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    group = h // hkv
    qg = q.reshape(b, sq, hkv, group, d)
    scores = jnp.einsum("bqhgd,bhkd->bhgqk", qg,
                        k_int.astype(q.dtype)) * jnp.asarray(scale, q.dtype)
    # per-key dequantization factors out of the dot
    scores = scores * k_scale.astype(q.dtype)[:, :, None, None, :]
    if mask is not None:
        m = jnp.broadcast_to(mask, (b, h, sq, sk)).reshape(b, hkv, group, sq, sk)
        scores = jnp.where(m, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    # fold per-key v scales into the probabilities
    probs = probs * v_scale.astype(q.dtype)[:, :, None, None, :]
    out = jnp.einsum("bhgqk,bhkd->bqhgd", probs, v_int.astype(q.dtype))
    return out.reshape(b, sq, h, d)
