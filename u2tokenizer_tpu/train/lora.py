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


def qlora_config(cfg, rank: int = 16, alpha: float = 32.0,
                 mode: "bool | str" = "int8"):
    """U2ModelConfig / LLMConfig copy set up for QLoRA: decoder kernels
    stored weight-only quantized (int8 halves — int4 quarters — the frozen
    base's HBM footprint vs bf16) with fp32 low-rank adapters on every
    decoder linear (decoder.QDense lora branch). This is what fits μ²Qwen3-8B
    SFT on a single 16 GB chip: the reference needs 4x80 GB A100s
    (/root/reference/README.md:63) because its bf16 base + Adam state alone
    exceed one GPU.

    Deviation from the merged-kernel LoRA path (reference peft semantics,
    train_stage1.py:342-361): embed_tokens/lm_head stay frozen *and
    quantized*, so the +4 new-token rows cannot be trained in this mode —
    use the float LoRA path (or a multi-chip mesh) when embedding training
    matters.
    """
    import dataclasses

    llm = cfg.llm if hasattr(cfg, "llm") else cfg
    llm = dataclasses.replace(llm, quantized_weights=mode, lora_rank=rank,
                              lora_alpha=alpha)
    if hasattr(cfg, "llm"):
        return dataclasses.replace(cfg, llm=llm)
    return llm


def qlora_trainable_path(path: str,
                         full_train=("u2tokenizer", "mm_projector")) -> bool:
    """Trainable leaves under QLoRA: the fp32 adapters plus the full-rank
    multimodal modules (μ²tokenizer + projector, train_stage1.py:355-359).
    Vision tower frozen (--freeze-vision-tower); decoder base is integer
    (untrainable by construction); embeddings stay frozen (see qlora_config).
    """
    if path.endswith("/lora_a") or path.endswith("/lora_b"):
        return True
    return any(kw in path for kw in full_train)


def qlora_partition(params) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split a (quantized, lora-enabled) param tree into flat
    {path: leaf} dicts (trainable fp32, frozen as-is). Rebuild with
    ``qlora_merge_trees``."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params, sep="/")
    train, frozen = {}, {}
    for key, val in flat.items():
        if qlora_trainable_path(key) and jnp.issubdtype(
                val.dtype, jnp.floating):
            train[key] = val.astype(jnp.float32)
        else:
            frozen[key] = val
    return train, frozen


def qlora_merge_trees(train_flat: Dict[str, Any],
                      frozen_flat: Dict[str, Any]):
    from flax.traverse_util import unflatten_dict

    merged = dict(frozen_flat)
    merged.update(train_flat)
    return unflatten_dict(merged, sep="/")


def init_qlora_from_quantized(model, rng, quantized_params, *init_args,
                              **init_kwargs):
    """Param tree for a QLoRA model (quantized_weights + lora_rank set) from
    an existing quantized tree (models.quantize.quantize_llm_weights):
    model.init supplies the structure AND freshly-initialized adapters
    (lora_a ~ N(0, 1/r), lora_b = 0); every leaf that also exists in the
    quantized tree (kernels, scales, embeddings, non-decoder float params)
    is taken from it."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    full = model.init(rng, *init_args, **init_kwargs)
    flat = flatten_dict(full, sep="/")
    flat_q = flatten_dict(quantized_params, sep="/")
    for key, val in flat_q.items():
        flat[key] = val
    return unflatten_dict(flat, sep="/")


def make_qlora_train_step(tx: optax.GradientTransformation,
                          loss_fn: Callable):
    """Train step over the QLoRA-trainable subset with the quantized base
    closed over as a constant: gradients and optimizer state exist ONLY for
    the adapters + multimodal modules (no frozen grads are ever allocated —
    the 8B int8 base contributes 8 GB of params and zero training state).

    loss_fn(params_tree, batch) -> (loss, aux); returns
    step(train_flat, opt_state, frozen_flat, batch) ->
    (train_flat, opt_state, loss, aux, grad_norm) — jit with
    donate_argnums=(0, 1) at the call site.
    """

    def step(train_flat, opt_state, frozen_flat, batch):
        def wrapped(tf):
            return loss_fn(qlora_merge_trees(tf, frozen_flat), batch)

        (loss, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(
            train_flat)
        updates, opt_state = tx.update(grads, opt_state, train_flat)
        train_flat = optax.apply_updates(train_flat, updates)
        return train_flat, opt_state, loss, aux, optax.global_norm(grads)

    return step


def merge_qlora(params, llm_cfg):
    """Fold QLoRA adapters into dequantized fp32 kernels for export: each
    decoder linear becomes dequant(kernel) + (alpha/r) * lora_a @ lora_b,
    adapters and quant scales dropped. The result loads into the plain
    float model (LLMConfig(quantized_weights=False, lora_rank=0)) and into
    the HF exporters. Exact up to the base's original quantization error
    (the adapters themselves merge losslessly in fp32).
    """
    from ..models.quantize import dequantize_llm_weights

    scale = llm_cfg.lora_alpha / max(llm_cfg.lora_rank, 1)
    deq = dequantize_llm_weights(params)

    def fold(node):
        if not isinstance(node, dict):
            return node
        if "kernel" in node and "lora_a" in node:
            kernel = node["kernel"].astype(jnp.float32) + scale * (
                node["lora_a"].astype(jnp.float32)
                @ node["lora_b"].astype(jnp.float32))
            out = {"kernel": kernel}
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        return {k: fold(v) for k, v in node.items()}

    return fold(deq)


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
