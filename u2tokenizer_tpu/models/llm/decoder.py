"""Decoder-only LM stack (Qwen3 / Llama-3.2 / Phi-3 families).

TPU-native replacement for the reference's HF-transformers backbones
(src/model/language_model/u2llama.py, u2phi3.py, u2qwen3.py — which delegate
to transformers' LlamaModel/Phi3Model/Qwen3Model). One configurable stack
covers all three: RMSNorm, GQA attention with RoPE (optional per-head q/k
RMSNorm for Qwen3), SwiGLU MLP, optional tied embeddings.

Design notes (TPU):
  * All shapes static; the KV cache is a fixed (L, B, max_len, Hkv, D)
    buffer written with dynamic_update_slice — prefill writes [0, S) and
    attends only the static [0, S) slice; decode writes one row per step and
    attends the full buffer under a length mask.
  * Attention runs through the shared GQA SDPA op; softmax in fp32.
  * bfloat16 activations by default, fp32 params.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ...config import LLMConfig
from ...ops.attention import (gqa_sdpa, gqa_sdpa_fanout, gqa_sdpa_headmajor,
                              gqa_sdpa_quantized, quantize_kv)
from ...ops.decode_attention import decode_attention_quantized
from ...ops.flash_attention import flash_attention
from ...ops.rotary import apply_rope, rope_cos_sin

Dtype = Any


def _int4_decode_kernel_enabled() -> bool:
    """Opt-in gate for routing the int4 KV cache through the fused Pallas
    decode kernel (U2_INT4_DECODE_KERNEL=1). The kernel body is dtype-
    generic but int4 block loads need Mosaic int4 support, which cannot be
    validated off-hardware — default stays the XLA quantized-GQA path."""
    import os

    return os.environ.get("U2_INT4_DECODE_KERNEL", "0") == "1"


@struct.dataclass
class KVCache:
    """Per-model KV cache: per-layer tuples of (B, n_kv, max_len, head_dim)
    buffers — HEAD-MAJOR, so each head's keys are contiguous: the decode
    attention reads the cache per (batch, head) and a seq-major layout makes
    every such read strided by n_kv*head_dim (measured 2-5x slower in both
    the XLA and Pallas decode paths). Per-layer buffers (instead of one
    stacked (L, ...) array) let XLA alias each layer's dynamic_update_slice
    in place inside the decode scan — a stacked cache forces
    slice+update+re-stack copies of the whole cache every step.

    Optional int8/int4 quantization (``create(..., dtype="int8"|"int4")``):
    values are stored quantized with per-(position, head) bf16 scales;
    decode reads half (int8) / a quarter (int4) of the HBM bytes (the
    decode loop is cache-bandwidth-bound at large batch). int4 buffers
    live entirely inside the generate jit, so the relay's S4 transfer
    limitation never applies to the cache."""

    k: Tuple[jax.Array, ...]
    v: Tuple[jax.Array, ...]
    k_scale: Optional[Tuple[jax.Array, ...]] = None
    v_scale: Optional[Tuple[jax.Array, ...]] = None

    @classmethod
    def create(cls, cfg: LLMConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        if dtype in ("int8", jnp.int8, "int4", jnp.int4):
            qdt = jnp.int4 if dtype in ("int4", jnp.int4) else jnp.int8
            # scales live as (B, Hkv, S): a trailing dim of 1 would be
            # lane-padded 1->128 by the TPU tiler (measured: 14 GB of pure
            # padding at B64), while (Hkv, S) tiles exactly. bf16 storage:
            # quantize_kv already computes bf16 scales, and at B64 fp32
            # scale buffers were 2.06 GB of the decode stream (vs 3.3 GB
            # of int4 payload) — bf16 halves that for ~2^-8 relative
            # scale error on top of the int grid.
            sshape = (batch, cfg.num_kv_heads, max_len)
            zeros = lambda sh, dt: tuple(jnp.zeros(sh, dt)
                                         for _ in range(cfg.num_layers))
            return cls(k=zeros(shape, qdt), v=zeros(shape, qdt),
                       k_scale=zeros(sshape, jnp.bfloat16),
                       v_scale=zeros(sshape, jnp.bfloat16))
        return cls(k=tuple(jnp.zeros(shape, dtype)
                           for _ in range(cfg.num_layers)),
                   v=tuple(jnp.zeros(shape, dtype)
                           for _ in range(cfg.num_layers)))

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def max_len(self) -> int:
        return self.k[0].shape[2]


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (xf * w).astype(self.dtype)


def make_norm(cfg: LLMConfig, dtype, name: str) -> nn.Module:
    if cfg.norm_type == "layernorm":
        return nn.LayerNorm(epsilon=cfg.rms_norm_eps, dtype=dtype, name=name)
    return RMSNorm(cfg.rms_norm_eps, dtype, name=name)


def int4_group(in_features: int, group: int = 128) -> int:
    """Quantization group length along the input dim (falls back to
    per-channel when the group does not divide the input width)."""
    return group if in_features % group == 0 else in_features


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Pack int4 values (any int dtype, range [-7, 7]) pairwise along the
    group axis: (ng, g, out) -> (ng, g//2, out) int8, low nibble = even
    index. int4 weight trees are STORED packed as int8: identical HBM
    bytes to XLA's packed S4, but transportable — the axon relay cannot
    device_put S4 arrays across jit boundaries (r4 on-chip
    RecursionError), which blocked passing an int4 frozen base into a
    QLoRA train step."""
    q = q.astype(jnp.int8)
    lo = q[:, 0::2] & jnp.int8(0x0F)
    hi = q[:, 1::2] << 4
    return hi | lo


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``pack_int4``: (ng, g//2, out) int8 -> (ng, g, out) int8
    with sign-extended nibble values in [-8, 7]."""
    lo = (packed << 4) >> 4  # arithmetic shifts sign-extend the low nibble
    hi = packed >> 4
    ng, gh, out = packed.shape
    return jnp.stack([lo, hi], axis=2).reshape(ng, 2 * gh, out)


class QDense(nn.Module):
    """Dense layer with optional weight-only int8/int4 quantization.

    Param-tree compatible with ``nn.Dense`` when ``quantized=False`` (same
    kernel/bias names, shapes and initializers). When ``quantized`` is truthy
    the kernel is stored quantized and dequantization folds into the matmul:

      * int8 (``quantized=True``/``"int8"``): (in, out) int8 kernel with a
        per-output-channel ``scale`` applied in the epilogue — one byte per
        element of decode-time weight streaming.
      * int4 (``quantized="int4"``): (groups, group/2=64, out) int8 kernel
        holding PACKED nibble pairs (pack_int4) with per-(group, out)
        ``scale`` — half a byte per element, and int8-typed so the tree
        crosses jit/transfer boundaries (S4 cannot on the axon relay).
        The matmul unpacks in-kernel and picks its contraction order by
        token count (per-group partials for decode, dequant-first for
        prefill/training — see the branch comments).

    Quantized trees are produced by ``models.quantize.quantize_llm_weights``
    from a float checkpoint — init of a quantized module yields placeholder
    zeros.

    ``lora_rank > 0`` adds a float low-rank branch
    ``y += (x @ lora_a @ lora_b) * lora_scale`` (QLoRA): the base kernel —
    quantized or float — stays frozen while only the fp32 adapters train.
    ``lora_b`` inits to zero so the adapted layer starts exactly at the
    base layer (reference LoRA semantics, train_stage1.py:342-361).
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    quantized: "bool | str" = False
    lora_rank: int = 0
    lora_scale: float = 1.0
    # int8 token-regime out-dim tiling (the 8B lm_head in training): > 1
    # bounds the live dequantized kernel at in×(features/out_tiles). See
    # the branch comment below; 0/1 = plain single-dot path.
    out_tiles: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        if self.quantized == "int4":
            g = int4_group(in_features)
            if g % 2:
                raise ValueError(f"int4 needs an even group, got {g}")
            ng = in_features // g
            # stored packed: two nibbles per int8 byte (see pack_int4)
            kernel = self.param(
                "kernel", lambda rng, shape: jnp.zeros(shape, jnp.int8),
                (ng, g // 2, self.features))
            scale = self.param("scale", nn.initializers.ones,
                               (ng, self.features), jnp.float32)
            xg = x.astype(self.dtype).reshape(*x.shape[:-1], ng, g)
            tokens = 1
            for dim in x.shape[:-1]:
                tokens *= dim
            if tokens < g:
                # decode regime: per-group partials cost tokens*ng*out —
                # cheaper than dequantizing the kernel, and the int4→bf16
                # convert fuses into each group's dot
                part = jnp.einsum("...gi,gio->...go", xg,
                                  unpack_int4(kernel).astype(self.dtype))
                y = jnp.einsum("...go,go->...o", part,
                               scale.astype(self.dtype))
            else:
                # training/prefill regime: dequantize first (kernel-sized
                # in*out temp) and contract (g, i) in ONE dot — the partial
                # form materializes a tokens*ng*out temp, 9.3 GB for the
                # 8B lm_head at S=1024 (r4 on-chip OOM, 22.2 GB used).
                # jax.checkpoint: the backward's dx needs the dequantized
                # wk, and XLA hoists this param-only computation out of
                # the layer remat — every layer's bf16 wk (up to 96 MB
                # per matmul at 8B) became a live jvp residual across
                # fwd→bwd (the r4g 508 MB OOM). Checkpointing re-derives
                # wk from the PACKED param (an argument — zero residual
                # cost) inside the backward, one matmul at a time.
                def _dq_dot(xq, pk, ss):
                    wk = (unpack_int4(pk).astype(self.dtype)
                          * ss.astype(self.dtype)[:, None, :])
                    return jnp.einsum("...gi,gio->...o", xq, wk)

                y = jax.checkpoint(_dq_dot)(xg, kernel, scale)
        elif self.quantized:
            kernel = self.param(
                "kernel", lambda rng, shape: jnp.zeros(shape, jnp.int8),
                (in_features, self.features))
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,), jnp.float32)
            tokens = 1
            for dim in x.shape[:-1]:
                tokens *= dim
            if (self.out_tiles > 1 and tokens >= 128
                    and self.features % self.out_tiles == 0):
                # Token-regime out-dim tiling: the plain dot below holds
                # the dequantized in×out bf16 kernel as ONE HLO temp —
                # 1.16 GB for the 8B lm_head, the allocation that OOMed
                # the on-chip QLoRA step (16.97 of 15.75 GB HBM). A
                # lax.map over out-tiles bounds the live dequant at
                # in×(out/nt) in both the forward and the scan-transposed
                # backward (dx accumulates per tile); numerics identical
                # (per-column scale, same contraction). Decode keeps the
                # plain path — the gate needs >=128 tokens. The tile body
                # is jax.checkpoint'ed: without it the scan transpose
                # saves each iteration's dequantized ks tile as a STACKED
                # residual — (nt, in, out/nt) = the full in×out buffer the
                # tiling exists to avoid (r4e on-chip re-OOM by 1.3 GB).
                # With it, the backward re-slices + re-converts one tile
                # at a time; only int8 kernel/scale and xt stay live.
                tile = self.features // self.out_tiles
                xt = x.astype(self.dtype).reshape(tokens, in_features)

                def _tile(i):
                    ks = jax.lax.dynamic_slice_in_dim(kernel, i * tile,
                                                      tile, 1)
                    ss = jax.lax.dynamic_slice_in_dim(scale, i * tile,
                                                      tile, 0)
                    return (jnp.dot(xt, ks.astype(self.dtype))
                            * ss.astype(self.dtype))

                yt = jax.lax.map(jax.checkpoint(_tile),
                                 jnp.arange(self.out_tiles))
                y = jnp.moveaxis(yt, 0, 1).reshape(*x.shape[:-1],
                                                   self.features)
            else:
                y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
                y = y * scale.astype(self.dtype)
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (in_features, self.features), jnp.float32)
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.lora_rank > 0:
            r = self.lora_rank
            lora_a = self.param(
                "lora_a", nn.initializers.normal(stddev=1.0 / (r ** 0.5)),
                (in_features, r), jnp.float32)
            lora_b = self.param("lora_b", nn.initializers.zeros,
                                (r, self.features), jnp.float32)
            y = y + (x.astype(self.dtype) @ lora_a.astype(self.dtype)
                     @ lora_b.astype(self.dtype)
                     ) * jnp.asarray(self.lora_scale, self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Attention(nn.Module):
    cfg: LLMConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                       # (B, S, E)
        positions: jnp.ndarray,               # (B, S) int32
        mask: jnp.ndarray,                    # bool (B, 1, S, Sk)
        cache_kv: Optional[Tuple[jax.Array, jax.Array]] = None,  # (B, max, Hkv, D)
        write_index: Optional[jax.Array] = None,  # scalar int32: cache write offset
        lens: Optional[jax.Array] = None,  # (B,) right-pad valid lengths
        decode_bounds=None,  # (prompt_len (B,), end (B,), s_prompt int)
        prefix_kv=None,      # (pk, pv, pk_scale, pv_scale) at batch C = B/n:
        #   fan-out decode — a prompt prefix SHARED by groups of n rows
        #   (ops/attention.gqa_sdpa_fanout); cache_kv holds only the suffix
        prefix_mask=None,    # (C, Sp) valid prefix keys
    ):
        cfg = self.cfg
        b, s, _ = x.shape
        hd = cfg.head_dim
        proj = lambda feats, name: QDense(
            feats, use_bias=cfg.attention_bias, dtype=self.dtype,
            quantized=cfg.quantized_weights, lora_rank=cfg.lora_rank,
            lora_scale=cfg.lora_alpha / max(cfg.lora_rank, 1), name=name)

        q = proj(cfg.num_heads * hd, "q_proj")(x).reshape(b, s, cfg.num_heads, hd)
        k = proj(cfg.num_kv_heads * hd, "k_proj")(x).reshape(b, s, cfg.num_kv_heads, hd)
        v = proj(cfg.num_kv_heads * hd, "v_proj")(x).reshape(b, s, cfg.num_kv_heads, hd)

        if cfg.qk_norm:
            q = RMSNorm(cfg.rms_norm_eps, self.dtype, name="q_norm")(q)
            k = RMSNorm(cfg.rms_norm_eps, self.dtype, name="k_norm")(k)

        rot_dim = int(hd * cfg.partial_rotary_factor)
        # round to even (half-rotate layout needs an even dim)
        rot_dim -= rot_dim % 2
        scaling = (cfg.rope_scaling_type, cfg.rope_scaling_factor,
                   cfg.rope_low_freq_factor, cfg.rope_high_freq_factor,
                   cfg.rope_original_max_position)
        cos, sin = rope_cos_sin(positions, rot_dim, cfg.rope_theta,
                                scaling=scaling)
        if rot_dim == hd:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        else:  # Phi-2 partial rotary: only the leading rot_dim dims rotate
            q = jnp.concatenate(
                [apply_rope(q[..., :rot_dim], cos, sin), q[..., rot_dim:]], -1)
            k = jnp.concatenate(
                [apply_rope(k[..., :rot_dim], cos, sin), k[..., rot_dim:]], -1)

        new_cache = None
        quantized_decode = False
        cached_decode = False
        if cache_kv is not None:
            ck, cv, ks, vs = cache_kv
            per_row = getattr(write_index, "ndim", 0) == 1
            # cache buffers are head-major (B, Hkv, S, D); fresh k/v are
            # seq-major (B, S, Hkv, D). A (B,) write_index scatters each
            # row's token at its own slot position (continuous batching);
            # with s > 1 it scatters s consecutive tokens per row starting
            # at the row's offset (speculative-decoding verify blocks).
            if per_row and s > 1:
                rows = jnp.arange(b)[:, None]
                pos = write_index[:, None] + jnp.arange(s)[None, :]
                dus = lambda buf, val: buf.at[rows, :, pos].set(
                    val.astype(buf.dtype))
                dus_s = lambda buf, val: buf.at[rows, :, pos].set(
                    val[..., 0].astype(buf.dtype))
            elif per_row:
                rows = jnp.arange(b)
                dus = lambda buf, val: buf.at[rows, :, write_index].set(
                    val[:, 0].astype(buf.dtype))
                dus_s = lambda buf, val: buf.at[rows, :, write_index].set(
                    val[:, 0, :, 0].astype(buf.dtype))
            else:
                dus = lambda buf, val: jax.lax.dynamic_update_slice(
                    buf, jnp.transpose(val, (0, 2, 1, 3)).astype(buf.dtype),
                    (0, 0, write_index, 0))
                # scales: (B, S, Hkv, 1) -> (B, Hkv, S) storage layout
                dus_s = lambda buf, val: jax.lax.dynamic_update_slice(
                    buf, jnp.transpose(val[..., 0], (0, 2, 1)).astype(
                        buf.dtype), (0, 0, write_index))
            if ks is not None:  # int8/int4 cache: quantize on write
                k_q, k_s = quantize_kv(k, dtype=ck.dtype)
                v_q, v_s = quantize_kv(v, dtype=cv.dtype)
                ck, cv = dus(ck, k_q), dus(cv, v_q)
                ks, vs = dus_s(ks, k_s), dus_s(vs, v_s)
                quantized_decode = s == 1 or per_row
            else:
                ck, cv = dus(ck, k), dus(cv, v)
            new_cache = (ck, cv, ks, vs)
            if s > 1 and not per_row:
                # Prefill writes at offset 0: the fresh full-precision k/v ARE
                # the cache contents — attend them directly (exact even with
                # a quantized cache).
                k_att, v_att = k, v
            else:
                # single-token decode, or a per-row multi-token verify block
                # (speculative decoding): attend the full cache under the mask
                k_att, v_att = ck, cv
                cached_decode = True
        else:
            k_att, v_att = k, v

        # Pallas flash kernel on the prefill/training path: right-padded
        # causal attention expressed as (lens, causal) instead of a mask.
        use_flash = (cfg.use_flash_attention and lens is not None and s > 1
                     and k_att.shape[1] == s
                     and jax.default_backend() == "tpu")
        if prefix_kv is not None and cached_decode:
            # fan-out decode: joint softmax over the case-shared prefix and
            # the per-row suffix cache; the prefix streams once per case
            pk_b, pv_b, pks, pvs_ = prefix_kv
            out = gqa_sdpa_fanout(
                q, pk_b, pv_b, k_att, v_att,
                pk_scale=pks, pv_scale=pvs_, sk_scale=ks, sv_scale=vs,
                prefix_mask=prefix_mask, suffix_mask=mask)
        elif quantized_decode:
            if (s == 1 and decode_bounds is not None
                    and (k_att.dtype == jnp.int8
                         or (k_att.dtype == jnp.int4
                             and _int4_decode_kernel_enabled()))
                    and cfg.use_flash_attention
                    and jax.default_backend() == "tpu"):
                # fused Pallas kernel: one pass over the quantized cache,
                # scales and the two-interval decode mask in registers
                plen, end, s_prompt = decode_bounds
                out = decode_attention_quantized(q, ck, ks, cv, vs, plen,
                                                 end, s_prompt)
            else:
                out = gqa_sdpa_quantized(q, k_att, ks, v_att, vs, mask=mask)
        elif use_flash:
            out = flash_attention(q, k_att, v_att, lens, causal=True,
                                  block_q=256)
        elif cached_decode:
            out = gqa_sdpa_headmajor(q, k_att.astype(self.dtype),
                                     v_att.astype(self.dtype), mask=mask)
        else:
            out = gqa_sdpa(q, k_att.astype(self.dtype),
                           v_att.astype(self.dtype), mask=mask)
        out = out.reshape(b, s, cfg.num_heads * hd)
        return proj(cfg.hidden_size, "o_proj")(out), new_cache


class MLP(nn.Module):
    """SwiGLU MLP: down(silu(gate(x)) * up(x)); or Phi-2 gelu fc1/fc2."""

    cfg: LLMConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dense = lambda feats, bias, name: QDense(
            feats, use_bias=bias, dtype=self.dtype,
            quantized=cfg.quantized_weights, lora_rank=cfg.lora_rank,
            lora_scale=cfg.lora_alpha / max(cfg.lora_rank, 1), name=name)
        if cfg.mlp_type == "gelu":
            h = dense(cfg.intermediate_size, cfg.mlp_bias, "fc1")(x)
            h = nn.gelu(h, approximate=True)  # HF gelu_new
            return dense(cfg.hidden_size, cfg.mlp_bias, "fc2")(h)
        gate = dense(cfg.intermediate_size, False, "gate_proj")(x)
        up = dense(cfg.intermediate_size, False, "up_proj")(x)
        return dense(cfg.hidden_size, False, "down_proj")(nn.silu(gate) * up)


class DecoderLayer(nn.Module):
    cfg: LLMConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, positions, mask, cache_kv=None, write_index=None,
                 lens=None, decode_bounds=None, prefix_kv=None,
                 prefix_mask=None):
        y = make_norm(self.cfg, self.dtype, "input_layernorm")(x)
        attn_out, new_cache = Attention(self.cfg, self.dtype, name="self_attn")(
            y, positions, mask, cache_kv, write_index, lens, decode_bounds,
            prefix_kv, prefix_mask)
        if self.cfg.parallel_block:
            # Phi-2: attention and MLP both read the same pre-LN activations
            x = x + attn_out + MLP(self.cfg, self.dtype, name="mlp")(y)
        else:
            x = x + attn_out
            y = make_norm(self.cfg, self.dtype, "post_attention_layernorm")(x)
            x = x + MLP(self.cfg, self.dtype, name="mlp")(y)
        return x, new_cache


class DecoderModel(nn.Module):
    """Embedding table + decoder layers + final norm."""

    cfg: LLMConfig
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        if self.cfg.quantized_weights:
            # int8 per-row quantized table; rows rescale on lookup and the
            # tied lm_logits matmul reads one byte per element.
            self.embed_tokens = self.param(
                "embed_tokens", lambda rng, shape: jnp.zeros(shape, jnp.int8),
                (self.cfg.vocab_size, self.cfg.hidden_size))
            self.embed_scale = self.param(
                "embed_scale", nn.initializers.ones,
                (self.cfg.vocab_size, 1), jnp.float32)
        else:
            self.embed_tokens = self.param(
                "embed_tokens", nn.initializers.normal(stddev=0.02),
                (self.cfg.vocab_size, self.cfg.hidden_size), jnp.float32)
        layer_cls = DecoderLayer
        if self.remat:
            # remat accepts True (= "nothing": full recompute, minimum
            # memory) or a policy name trading activation memory for less
            # backward recompute — "dots" keeps every matmul output,
            # "dots_no_batch" keeps weight-matmul outputs only (the usual
            # LLM sweet spot: saves the big GEMMs, recomputes elementwise)
            policies = {
                "dots": jax.checkpoint_policies.dots_saveable,
                "dots_no_batch":
                    jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable,
            }
            name = self.remat if isinstance(self.remat, str) else "nothing"
            layer_cls = nn.remat(
                DecoderLayer, prevent_cse=False,
                policy=policies.get(
                    name, jax.checkpoint_policies.nothing_saveable))
        self.layers = [layer_cls(self.cfg, self.dtype, name=f"layers_{i}")
                       for i in range(self.cfg.num_layers)]
        self.norm_f = make_norm(self.cfg, self.dtype, "norm")

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        rows = jnp.take(self.embed_tokens, input_ids, axis=0).astype(self.dtype)
        if self.cfg.quantized_weights:
            rows = rows * jnp.take(self.embed_scale, input_ids,
                                   axis=0).astype(self.dtype)
        return rows

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,           # (B, S, E)
        positions: jnp.ndarray,               # (B, S)
        mask: jnp.ndarray,                    # bool (B, 1, S, Sk)
        cache: Optional[KVCache] = None,
        write_index: Optional[jax.Array] = None,
        lens: Optional[jax.Array] = None,
        decode_bounds=None,
        prefix_cache: Optional[KVCache] = None,
        prefix_mask: Optional[jax.Array] = None,
    ):
        x = inputs_embeds.astype(self.dtype)
        new_k, new_v, new_ks, new_vs = [], [], [], []
        for i, layer in enumerate(self.layers):
            if cache is None:
                cache_kv = None
            else:
                cache_kv = (cache.k[i], cache.v[i],
                            cache.k_scale[i] if cache.k_scale else None,
                            cache.v_scale[i] if cache.v_scale else None)
            prefix_kv = None
            if prefix_cache is not None:
                prefix_kv = (
                    prefix_cache.k[i], prefix_cache.v[i],
                    prefix_cache.k_scale[i] if prefix_cache.k_scale else None,
                    prefix_cache.v_scale[i] if prefix_cache.v_scale else None)
            x, new_cache = layer(x, positions, mask, cache_kv, write_index,
                                 lens, decode_bounds, prefix_kv, prefix_mask)
            if new_cache is not None:
                new_k.append(new_cache[0])
                new_v.append(new_cache[1])
                new_ks.append(new_cache[2])
                new_vs.append(new_cache[3])
        x = self.norm_f(x)
        out_cache = None
        if cache is not None:
            quant = new_ks and new_ks[0] is not None
            out_cache = KVCache(
                k=tuple(new_k), v=tuple(new_v),
                k_scale=tuple(new_ks) if quant else None,
                v_scale=tuple(new_vs) if quant else None)
        return x, out_cache


class CausalLM(nn.Module):
    """DecoderModel + LM head (tied or separate).

    Public entry points (via ``nn.apply`` method=):
      * __call__: embeds -> (logits, hidden, cache)
      * embed_tokens: ids -> embeds
    """

    cfg: LLMConfig
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        self.model = DecoderModel(self.cfg, self.dtype, self.remat)
        if not self.cfg.tie_word_embeddings:
            # int4 mode keeps the lm_head int8, like the embedding table
            # (quantize._quantize_tree): per-(group, out) int4 needs a
            # dequantized in×vocab bf16 kernel in the training/prefill
            # matmul — 1.16 GB for the 8B head, alive through the remat
            # backward (r4 on-chip OOM at 18.3 GB) — while the int8 form
            # is a direct dot with the convert fused into the HBM read.
            q = self.cfg.quantized_weights
            self.lm_head = QDense(self.cfg.vocab_size,
                                  use_bias=self.cfg.lm_head_bias,
                                  dtype=self.dtype,
                                  quantized="int8" if q == "int4" else q,
                                  out_tiles=self.cfg.lm_head_tiles,
                                  name="lm_head")

    def embed_tokens(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.model.embed(input_ids)

    def forward_embeds(self, inputs_embeds, attention_mask=None, cache=None,
                       write_index=None, positions=None, mask=None, lens=None,
                       compute_logits=True):
        """Generation-compatible entry (same surface as
        U2CausalLM.forward_embeds) for text-only models, e.g. GREEN judges.

        ``lens`` (right-padded valid lengths) routes prefill through the
        Pallas flash kernel; derived from attention_mask when omitted
        (batches are right-padded throughout the framework)."""
        b, s, _ = inputs_embeds.shape
        if mask is None:
            causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]
            if attention_mask is not None:
                causal = causal & attention_mask[:, None, None, :].astype(bool)
                if lens is None:
                    lens = attention_mask.sum(-1).astype(jnp.int32)
            mask = causal
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        return self(inputs_embeds, positions, mask, cache, write_index, lens,
                    compute_logits)

    def decode_step(self, token_embeds, positions, mask, cache, write_index,
                    decode_bounds=None, prefix_cache=None, prefix_mask=None,
                    compute_logits=True):
        return self(token_embeds, positions, mask, cache, write_index,
                    decode_bounds=decode_bounds, prefix_cache=prefix_cache,
                    prefix_mask=prefix_mask, compute_logits=compute_logits)

    def lm_logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Project hidden states to vocabulary logits (fp32)."""
        if self.cfg.tie_word_embeddings:
            logits = hidden.astype(jnp.float32) @ jnp.transpose(
                self.model.embed_tokens).astype(jnp.float32)
            if self.cfg.quantized_weights:
                # per-row dequantization factors out of the dot
                logits = logits * jnp.transpose(
                    self.model.embed_scale).astype(jnp.float32)
            return logits
        return self.lm_head(hidden).astype(jnp.float32)

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        positions: jnp.ndarray,
        mask: jnp.ndarray,
        cache: Optional[KVCache] = None,
        write_index: Optional[jax.Array] = None,
        lens: Optional[jax.Array] = None,
        compute_logits: bool = True,
        decode_bounds=None,
        prefix_cache: Optional[KVCache] = None,
        prefix_mask: Optional[jax.Array] = None,
    ):
        hidden, out_cache = self.model(inputs_embeds, positions, mask,
                                       cache, write_index, lens,
                                       decode_bounds, prefix_cache,
                                       prefix_mask)
        # compute_logits=False skips the (B, S, vocab) projection — the
        # generation prefill only samples one position, and a full-sequence
        # fp32 logits tensor is the dominant prefill memory (OOM at B=16).
        logits = self.lm_logits(hidden) if compute_logits else None
        return logits, hidden, out_cache
