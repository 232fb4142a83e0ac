"""Serving-time weight transforms: bf16 cast + weight-only int8 quantization.

The decode loop is weight-streaming bound (BENCHMARKS.md: ~9 ms/step at B16
vs a ~4 ms bf16 roofline — fp32 params double every HBM read). For serving:

  * ``cast_for_inference``: cast all matrix-shaped float params to bfloat16
    (norm weights and biases stay fp32 — they're tiny and accuracy-critical).
  * ``quantize_llm_weights``: convert every decoder Dense ``kernel`` to int8
    with a per-output-channel ``scale``, and the embedding table to int8 with
    a per-row ``embed_scale`` (the tied lm_logits matmul then reads one byte
    per element). The resulting tree loads into a model built with
    ``LLMConfig(quantized_weights=True)`` (decoder.QDense / DecoderModel).

The reference serves bf16/fp16 via HF (src/demo/online_demo.py:20-269 offers
4/8-bit bitsandbytes); this is the TPU-native equivalent — per-channel
symmetric int8, dequantization folded into the matmul epilogue.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


def cast_for_inference(params, dtype=jnp.bfloat16):
    """Cast float params with ndim >= 2 to ``dtype``; keep 1D (norm/bias) fp32."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) \
                and x.ndim >= 2:
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, params)


def _quantize_channels(w: jax.Array, axis: int, eps: float = 1e-8):
    """Symmetric int8 quantization of ``w`` per slice along ``axis``."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes,
                    keepdims=True) / 127.0
    scale = jnp.maximum(scale, eps)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quantize_kernel_int4(kernel: jax.Array, group: int = 128,
                          eps: float = 1e-8):
    """Group-wise symmetric int4: (in, out) -> ((G, group/2, out) int8
    PACKED nibble pairs, (G, out) fp32 scales). G = in/group; per-channel
    when group ∤ in. Packed storage (decoder.pack_int4) keeps the tree
    int8-typed so it crosses jit/transfer boundaries on the axon relay."""
    from .llm.decoder import int4_group, pack_int4

    in_f, out = kernel.shape
    g = int4_group(in_f, group)
    k = kernel.astype(jnp.float32).reshape(in_f // g, g, out)
    scale = jnp.max(jnp.abs(k), axis=1, keepdims=True) / 7.0
    scale = jnp.maximum(scale, eps)
    q = jnp.clip(jnp.round(k / scale), -7, 7).astype(jnp.int8)
    return pack_int4(q), scale[:, 0, :]


def _quantize_tree(node: Dict[str, Any], mode: str = "int8") -> Dict[str, Any]:
    out = {}
    for key, val in node.items():
        if isinstance(val, dict):
            if "kernel" in val and not isinstance(val["kernel"], dict) \
                    and val["kernel"].ndim == 2:
                kernel = val["kernel"]
                # the lm_head stays int8 in int4 mode, like the embedding
                # table: the grouped-int4 training/prefill matmul needs a
                # dequantized in×vocab bf16 kernel (1.16 GB at 8B, alive
                # through the remat backward — r4 on-chip OOM), while the
                # int8 dot fuses the convert into the HBM read
                if mode == "int4" and key != "lm_head":
                    q, scale = _quantize_kernel_int4(kernel)
                    new = {"kernel": q, "scale": scale}
                else:
                    q, scale = _quantize_channels(kernel, axis=1)
                    new = {"kernel": q, "scale": scale.reshape(-1)}
                if "bias" in val:
                    new["bias"] = val["bias"].astype(jnp.float32)
                for extra in ("lora_a", "lora_b"):  # QLoRA adapters survive
                    if extra in val:
                        new[extra] = val[extra]
                out[key] = new
            else:
                out[key] = _quantize_tree(val, mode)
        elif key == "embed_tokens" and val.ndim == 2:
            # the embedding table stays int8 in both modes: per-row int4
            # over the full hidden dim is too coarse for the tied lm_logits
            # matmul, and the table is a minority of decode traffic
            q, scale = _quantize_channels(val, axis=0)
            out["embed_tokens"] = q
            out["embed_scale"] = scale.reshape(-1, 1)
        else:
            out[key] = val
    return out


def quantize_llm_weights(params, mode: str = "int8"):
    """Quantize the decoder subtree of a param tree to weight-only int8
    (``mode="int8"``) or group-wise int4 (``mode="int4"``; embeddings stay
    int8 — see _quantize_tree).

    Accepts either a full U2CausalLM tree ({'params': {'llm': ...}}) or a
    bare CausalLM tree ({'params': ...}); only the decoder weights are
    quantized — vision tower / projector / μ²tokenizer stay in float (they
    are compute-bound, not weight-streaming bound).
    """
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    inner = dict(params["params"])
    if "llm" in inner:
        inner["llm"] = _quantize_tree(inner["llm"], mode)
    else:
        inner = _quantize_tree(inner, mode)
    return {**params, "params": inner}


def _dequantize_tree(node: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for key, val in node.items():
        if isinstance(val, dict):
            kernel = val.get("kernel")
            if kernel is not None and not isinstance(kernel, dict) \
                    and jnp.issubdtype(kernel.dtype, jnp.integer):
                scale = val["scale"]
                if kernel.ndim == 3:  # int4 grouped (packed): (ng, g/2, out)
                    from .llm.decoder import unpack_int4

                    k = (unpack_int4(kernel).astype(jnp.float32)
                         * scale[:, None, :])
                    k = k.reshape(-1, k.shape[-1])
                else:  # int8 per-out-channel: (in, out), (out,)
                    k = kernel.astype(jnp.float32) * scale[None, :]
                new = {"kernel": k}
                for extra in ("bias", "lora_a", "lora_b"):
                    if extra in val:
                        new[extra] = val[extra]
                out[key] = new
            else:
                out[key] = _dequantize_tree(val)
        elif key == "embed_tokens" and jnp.issubdtype(val.dtype, jnp.integer):
            out["embed_tokens"] = (val.astype(jnp.float32)
                                   * node["embed_scale"])
        elif key == "embed_scale":
            continue  # folded into embed_tokens above
        else:
            out[key] = val
    return out


def dequantize_llm_weights(params):
    """Inverse of ``quantize_llm_weights``: fold the int8/int4 scales back
    into fp32 kernels (and the embedding table). Float leaves — including
    QLoRA ``lora_a``/``lora_b`` adapters — pass through untouched; use
    ``train.lora.merge_qlora`` to also fold adapters into the kernels.
    Reconstruction is exact up to the original quantization error (the
    round-trip float -> int -> float loses only the quantization rounding).
    """
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    inner = dict(params["params"])
    if "llm" in inner:
        inner["llm"] = _dequantize_tree(inner["llm"])
    else:
        inner = _dequantize_tree(inner)
    return {**params, "params": inner}


def quantized_llm_config(cfg, mode: "bool | str" = True):
    """Return a copy of an LLMConfig or U2ModelConfig with quantized weights
    (``mode``: True/"int8" or "int4")."""
    if hasattr(cfg, "llm"):
        return dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, quantized_weights=mode))
    return dataclasses.replace(cfg, quantized_weights=mode)
