"""Stage-1 SFT: loss, optimizer, sharded train step.

TPU-native rebuild of the reference training layer
(src/train/train_stage1.py + HF Trainer + DeepSpeed ZeRO): optax AdamW with
cosine schedule and linear warmup, label masking identical to the reference
collator (-100 ignored), gradient remat in the decoder, and a single pjit'd
train step whose parameter/optimizer sharding over the (data, fsdp, tensor)
mesh subsumes DDP + ZeRO-1/3.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainConfig, U2ModelConfig
from ..models.u2_model import U2CausalLM
from ..parallel.mesh import data_sharding, tree_shardings

IGNORE_INDEX = -100  # label mask value (src/dataset/fused_dataset.py:180-186)


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Shifted causal LM loss with IGNORE_INDEX masking.

    logits: (B, S, V); labels: (B, S). Predict labels[t+1] from logits[t]
    (HF CausalLM shift semantics).
    """
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_logp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    loss = -jnp.sum(tok_logp * valid) / jnp.maximum(jnp.sum(valid), 1)
    acc = jnp.sum((jnp.argmax(logits, -1) == targets) & valid) / jnp.maximum(
        jnp.sum(valid), 1)
    return loss, acc


def chunked_cross_entropy_from_hidden(apply_logits, hidden: jax.Array,
                                      labels: jax.Array,
                                      chunk: int = 128):
    """Shifted causal LM loss WITHOUT materializing the (B, S, V) logits.

    At V≈152k the logits are the dominant training activation
    (B=1, S=1024 -> 0.6 GB fp32 before log_softmax copies); walking the
    sequence in ``chunk``-sized pieces under a rematerialized scan bounds
    the peak at (B, chunk, V) in BOTH the forward and backward. Numerics
    identical to cross_entropy_loss up to summation order (log_softmax is
    per-position).

    apply_logits(h_chunk (B, c, E)) -> fp32 logits (B, c, V); typically
    ``lambda h: model.apply(params, h, method="lm_logits")``.
    """
    if chunk <= 0:
        raise ValueError(f"ce_chunk must be > 0, got {chunk}")
    hidden = hidden[:, :-1]
    targets = labels[:, 1:]
    b, sm1 = targets.shape
    pad = (-sm1) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)),
                          constant_values=IGNORE_INDEX)
    nch = (sm1 + pad) // chunk
    hc = jnp.transpose(hidden.reshape(b, nch, chunk, hidden.shape[-1]),
                       (1, 0, 2, 3))
    tc = jnp.transpose(targets.reshape(b, nch, chunk), (1, 0, 2))

    def body(carry, xs):
        lsum, nvalid, ncorrect = carry
        h, t = xs
        logits = apply_logits(h).astype(jnp.float32)
        valid = t != IGNORE_INDEX
        safe = jnp.where(valid, t, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return (lsum - jnp.sum(tok * valid),
                nvalid + jnp.sum(valid),
                ncorrect + jnp.sum((jnp.argmax(logits, -1) == t) & valid)
                ), None

    zero = jnp.zeros((), jnp.float32)
    (lsum, nvalid, ncorrect), _ = jax.lax.scan(
        jax.checkpoint(body), (zero, zero, zero), (hc, tc))
    loss = lsum / jnp.maximum(nvalid, 1.0)
    acc = ncorrect / jnp.maximum(nvalid, 1.0)
    return loss, acc


def make_optimizer(cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    warmup = max(1, int(total_steps * cfg.warmup_ratio))
    if cfg.lr_schedule == "cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, warmup, max(total_steps, warmup + 1))
    elif cfg.lr_schedule == "constant":
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, warmup),
             optax.constant_schedule(cfg.learning_rate)], [warmup])
    else:
        raise ValueError(cfg.lr_schedule)
    tx = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=cfg.weight_decay)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum_steps)
    return tx


def chunked_lm_loss(model, params, batch, ce_chunk: int):
    """(loss, token_accuracy) via the chunked CE path: multimodal splice ->
    hidden states (no logits) -> chunked loss. Shared by make_loss_fn and
    the on-chip training tools (one place threads the batch fields)."""
    embeds = model.apply(
        params, batch["input_ids"], batch.get("images"),
        batch.get("question_ids"), method="prepare_inputs_embeds")
    _, hidden, _ = model.apply(
        params, embeds, batch.get("attention_mask"),
        compute_logits=False, method="forward_embeds")
    return chunked_cross_entropy_from_hidden(
        lambda h: model.apply(params, h, method="lm_logits"),
        hidden, batch["labels"], ce_chunk)


def make_loss_fn(model: U2CausalLM, ce_chunk: int = 0):
    """ce_chunk > 0 computes the loss from hidden states in sequence
    chunks (chunked_cross_entropy_from_hidden) — same numbers, but the
    full-vocab logits tensor is never materialized."""

    def loss_fn(params, batch: Dict[str, jax.Array]):
        if ce_chunk:
            loss, acc = chunked_lm_loss(model, params, batch, ce_chunk)
            return loss, {"loss": loss, "token_accuracy": acc}
        logits, _, _ = model.apply(
            params,
            batch["input_ids"],
            batch.get("images"),
            batch.get("question_ids"),
            attention_mask=batch.get("attention_mask"),
        )
        loss, acc = cross_entropy_loss(logits, batch["labels"])
        return loss, {"loss": loss, "token_accuracy": acc}

    return loss_fn


def make_train_step(model: U2CausalLM, tx: optax.GradientTransformation,
                    trainable_filter=None, ce_chunk: int = 0):
    """Build train_step(state, batch) -> (state, metrics).

    trainable_filter: optional fn(path_str) -> bool; frozen params get zero
    updates (reference freeze_vision_tower / freeze_backbone flags,
    train_stage1.py:50,38).
    """
    loss_fn = make_loss_fn(model, ce_chunk)

    def train_step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(state.params, batch)
        if trainable_filter is not None:
            grads = _mask_grads(grads, trainable_filter)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), metrics

    return train_step


def _mask_grads(grads, trainable_filter):
    def mask(path, g):
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        return g if trainable_filter(pstr) else jnp.zeros_like(g)

    return jax.tree_util.tree_map_with_path(mask, grads)


def init_train_state(model: U2CausalLM, tx, rng, sample_batch) -> TrainState:
    params = model.init(rng, sample_batch["input_ids"],
                        sample_batch.get("images"),
                        sample_batch.get("question_ids"),
                        attention_mask=sample_batch.get("attention_mask"))
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def make_sharded_trainer(model: U2CausalLM, tx, mesh: Mesh, rng,
                         sample_batch, trainable_filter=None,
                         ce_chunk: int = 0):
    """Initialize the TrainState sharded over ``mesh`` and return
    (state, jitted_train_step, batch_shardings).

    The whole-state sharding is derived from the param rules (optimizer
    mu/nu mirror the param layout automatically — ZeRO-style sharding for
    free); batches shard their leading dim over data x fsdp. XLA lowers the
    gradient psum / weight all-gathers onto ICI from these annotations.
    """

    def init_fn(rng):
        params = model.init(rng, sample_batch["input_ids"],
                            sample_batch.get("images"),
                            sample_batch.get("question_ids"),
                            attention_mask=sample_batch.get("attention_mask"))
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params))

    state_abs = jax.eval_shape(init_fn, rng)
    state_shardings = tree_shardings(mesh, state_abs)
    state = jax.jit(init_fn, out_shardings=state_shardings)(rng)

    batch_shardings = {
        k: data_sharding(mesh, v.ndim) for k, v in sample_batch.items()}
    train_step = make_train_step(model, tx, trainable_filter, ce_chunk)

    def traced_step(state, batch):
        # activation constraints (models/u2_model.fuse_vision) bind to the
        # mesh during tracing only — single-chip paths stay unconstrained
        from ..parallel.mesh import activation_mesh

        with activation_mesh(mesh):
            return train_step(state, batch)

    jitted = jax.jit(
        traced_step,
        in_shardings=(state_shardings, batch_shardings),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )
    return state, jitted, batch_shardings


def make_seg_loss_fn(model: U2CausalLM, seg_weight: float = 1.0):
    """Joint LM + segmentation loss (the reference's seg_enable training:
    train_stage1.py:232 collator flag + vendored Dice/BCE losses,
    modeling_u2Llama.py:27-67).

    Batch needs the SFT keys plus: seg_image (B, 1, D, H, W), seg (B, 1, D,
    H, W) target mask, seg_positions (B,) index of the '[SEG]' token, and
    has_seg (B,) {0,1} gating rows without a mask (their seg loss is
    dropped, matching the reference's mixed seg/non-seg batches).
    """
    from ..models.seg import bce_loss, dice_loss

    def loss_fn(params, batch: Dict[str, jax.Array]):
        logits, masks = model.apply(
            params, batch["input_ids"], batch.get("images"),
            batch.get("question_ids"), batch["seg_image"],
            batch["seg_positions"].astype(jnp.int32),
            attention_mask=batch.get("attention_mask"),
            method="forward_seg")
        lm_loss, acc = cross_entropy_loss(logits, batch["labels"])
        # per-row seg losses, gated by has_seg
        b = masks.shape[0]
        flat_logits = masks.reshape(b, -1).astype(jnp.float32)
        flat_target = batch["seg"].reshape(b, -1).astype(jnp.float32)
        z, t = flat_logits, flat_target
        bce_row = jnp.mean(jnp.maximum(z, 0) - z * t +
                           jnp.log1p(jnp.exp(-jnp.abs(z))), axis=-1)
        p = jax.nn.sigmoid(z)
        num = 2.0 * jnp.sum(p * t, axis=-1) + 1.0
        den = jnp.sum(p * p, axis=-1) + jnp.sum(t * t, axis=-1) + 1.0
        dice_row = 1.0 - num / den
        gate = batch["has_seg"].astype(jnp.float32)
        seg = jnp.sum((bce_row + dice_row) * gate) / jnp.maximum(
            jnp.sum(gate), 1.0)
        loss = lm_loss + seg_weight * seg
        return loss, {"loss": loss, "lm_loss": lm_loss, "seg_loss": seg,
                      "token_accuracy": acc}

    return loss_fn


def make_seg_train_step(model: U2CausalLM, tx: optax.GradientTransformation,
                        seg_weight: float = 1.0, trainable_filter=None):
    """train_step(state, batch) for joint report+segmentation training."""
    loss_fn = make_seg_loss_fn(model, seg_weight)

    def train_step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch)
        if trainable_filter is not None:
            grads = _mask_grads(grads, trainable_filter)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), metrics

    return train_step


def seg_positions_from_ids(input_ids, seg_token_id: int):
    """(B, S) ids -> ((B,) first '[SEG]' index, (B,) has_seg {0,1})."""
    import numpy as np

    ids = np.asarray(input_ids)
    is_seg = ids == seg_token_id
    has = is_seg.any(axis=1).astype(np.float32)
    pos = np.argmax(is_seg, axis=1).astype(np.int32)
    return pos, has
