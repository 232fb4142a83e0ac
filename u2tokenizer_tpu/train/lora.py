"""LoRA: low-rank adapters on the decoder linears.

Reference behavior (src/train/train_stage1.py:217-227, 342-361): peft LoRA
with r=16, alpha=32 on every LLM Linear except embed_tokens/lm_head, while
vision_tower / mm_projector / u2tokenizer / embeddings stay fully trainable.

TPU-native design: adapters are a separate param pytree {path: {a, b}};
each train step materializes effective kernels base + (alpha/r)·A@B inside
jit (one fused add per target — XLA keeps it out of HBM round-trips), takes
gradients w.r.t. the adapters plus any fully-trainable base params, and
leaves the frozen base untouched. ``merge_lora`` folds adapters into the
base for export (src/utils/merge_lora_weights_and_save_hf_model.py parity).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .sft import TrainState

# reference exclusion list (train_stage1.py:221)
DEFAULT_EXCLUDE = ("vision_tower", "mm_projector", "embed_tokens", "lm_head",
                   "seg_projector", "seg_module", "u2tokenizer")
# modules that remain fully trainable alongside the adapters
# (train_stage1.py:355-359)
DEFAULT_FULL_TRAIN = ("vision_tower", "mm_projector", "embed_tokens",
                      "lm_head", "u2tokenizer")


@dataclass(frozen=True)
class LoraConfig:
    r: int = 16
    alpha: int = 32
    dropout: float = 0.05  # reference sets it; eval-mode here (no dropout)

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def is_lora_target(path: str, exclude=DEFAULT_EXCLUDE) -> bool:
    """2D 'kernel' leaves inside the decoder, minus the exclusion list."""
    if not path.endswith("/kernel"):
        return False
    return not any(kw in path for kw in exclude)


def init_lora_params(params, cfg: LoraConfig, rng,
                     exclude=DEFAULT_EXCLUDE) -> Dict[str, Any]:
    """A/B adapters for every target kernel. A ~ N(0, 1/r) (kaiming-style),
    B = 0, so the adapted model starts exactly at the base model."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora: Dict[str, Any] = {}
    keys = jax.random.split(rng, max(len(flat), 1))
    for (path, leaf), key in zip(flat, keys):
        p = _path_str(path)
        if leaf.ndim == 2 and is_lora_target(p, exclude):
            d_in, d_out = leaf.shape
            lora[p] = {
                "a": jax.random.normal(key, (d_in, cfg.r), jnp.float32)
                / jnp.sqrt(cfg.r),
                "b": jnp.zeros((cfg.r, d_out), jnp.float32),
            }
    return lora


def apply_lora(params, lora: Dict[str, Any], cfg: LoraConfig):
    """Materialize effective params: kernel + scale * A @ B."""

    def update(path, leaf):
        p = _path_str(path)
        if p in lora:
            ab = lora[p]["a"] @ lora[p]["b"]
            return leaf + (cfg.scale * ab).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(update, params)


def merge_lora(params, lora: Dict[str, Any], cfg: LoraConfig):
    """Fold adapters into the base weights (for export / inference)."""
    return apply_lora(params, lora, cfg)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def make_lora_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: LoraConfig,
    loss_fn: Callable,
    full_train=DEFAULT_FULL_TRAIN,
):
    """Train step over (lora_params, trainable_base) with the rest frozen.

    State layout: TrainState.params = {"lora": {...}, "base": full params};
    opt_state covers {"lora", "trainable base subset"} via masking.
    """

    def masked(params):
        # gradient mask: lora always trainable; base only where full_train
        def mask_leaf(path, g):
            p = _path_str(path)
            if any(kw in p for kw in full_train):
                return g
            return jnp.zeros_like(g)

        return mask_leaf

    def train_step(state: TrainState, batch):
        lora, base = state.params["lora"], state.params["base"]

        def wrapped_loss(wparams):
            eff = apply_lora(wparams["base"], wparams["lora"], cfg)
            return loss_fn(eff, batch)

        grad_fn = jax.value_and_grad(wrapped_loss, has_aux=True)
        (_, metrics), grads = grad_fn({"lora": lora, "base": base})
        grads["base"] = jax.tree_util.tree_map_with_path(
            masked(None), grads["base"])
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), metrics

    return train_step
