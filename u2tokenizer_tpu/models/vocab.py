"""Vocabulary resizing and adapter-subset parameter handling.

Counterparts of:
  * u2MetaForCausalLM.initialize_vision_tokenizer (src/model/u2_arch.py:119-159):
    resize the embedding table for newly added special tokens (<im_patch>
    etc., 4 tokens at stage-1 setup, train_stage1.py:334-338) and initialize
    the new rows to the mean of the existing ones, for both the input
    embeddings and the (untied) output head.
  * the stage-1 'pretrain' adapter-only save (train_stage1.py:182-198:
    mm_projector + embed_tokens subset).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import U2ModelConfig


def resize_token_embeddings(params: Dict[str, Any], new_vocab: int,
                            mean_init: bool = True) -> Dict[str, Any]:
    """Grow (or shrink) the decoder vocabulary in a U2CausalLM/CausalLM
    param tree. New input-embedding rows and output-head columns are
    initialized to the mean of the existing entries (u2_arch.py:124-133)."""
    p = params["params"] if "params" in params else params
    llm = p["llm"] if "llm" in p else p

    embed = np.asarray(llm["model"]["embed_tokens"])
    old_vocab, hidden = embed.shape
    if new_vocab == old_vocab:
        return params
    if new_vocab < old_vocab:
        new_embed = embed[:new_vocab]
    else:
        mean = embed.mean(axis=0, keepdims=True) if mean_init else None
        pad = (np.repeat(mean, new_vocab - old_vocab, axis=0)
               if mean_init else np.zeros((new_vocab - old_vocab, hidden),
                                          embed.dtype))
        new_embed = np.concatenate([embed, pad], axis=0)
    llm["model"]["embed_tokens"] = jnp.asarray(new_embed)

    if "lm_head" in llm:  # untied output head: (hidden, vocab) kernel
        kernel = np.asarray(llm["lm_head"]["kernel"])
        if new_vocab < old_vocab:
            new_kernel = kernel[:, :new_vocab]
        else:
            mean = kernel.mean(axis=1, keepdims=True)
            pad = np.repeat(mean, new_vocab - old_vocab, axis=1) if mean_init \
                else np.zeros((kernel.shape[0], new_vocab - old_vocab),
                              kernel.dtype)
            new_kernel = np.concatenate([kernel, pad], axis=1)
        llm["lm_head"]["kernel"] = jnp.asarray(new_kernel)
        if "bias" in llm["lm_head"]:
            bias = np.asarray(llm["lm_head"]["bias"])
            if new_vocab < old_vocab:
                new_bias = bias[:new_vocab]
            else:
                new_bias = np.concatenate(
                    [bias, np.zeros(new_vocab - old_vocab, bias.dtype)])
            llm["lm_head"]["bias"] = jnp.asarray(new_bias)
    return params


def resized_config(cfg: U2ModelConfig, new_vocab: int) -> U2ModelConfig:
    return dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, vocab_size=new_vocab))


ADAPTER_KEYWORDS = ("mm_projector", "embed_tokens")  # train_stage1.py:185


def extract_adapter_params(params: Dict[str, Any],
                           keywords: Sequence[str] = ADAPTER_KEYWORDS
                           ) -> Dict[str, Any]:
    """Subset of the param tree whose paths match any keyword — the
    'pretrain mode' adapter save (mm_projector + embed_tokens)."""

    def path_str(path):
        return "/".join(str(getattr(k, "key", k)) for k in path)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: Dict[str, Any] = {}
    for path, leaf in flat:
        pstr = path_str(path)
        if any(kw in pstr for kw in keywords):
            out[pstr] = np.asarray(leaf)
    return out


def merge_adapter_params(params: Dict[str, Any],
                         adapter: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Write a flat adapter dict (from extract_adapter_params) back into a
    full param tree (pretrain_mm_mlp_adapter load, u2_arch.py:74-78)."""

    def update(path, leaf):
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        if pstr in adapter:
            return jnp.asarray(adapter[pstr])
        return leaf

    return jax.tree_util.tree_map_with_path(update, params)
