"""Stage-2 DPO: preference collation, concatenated forward, DPO loss.

TPU-native rebuild of the reference's TRL-based u2DPOTrainer
(src/train/dpo_u2trainer.py:28-381 + train_stage2.py):

  * ``concatenated_forward`` semantics (dpo_u2trainer.py:185-359): chosen and
    rejected share one forward over a 2B batch with the images duplicated;
    per-token log-probs of the completion tokens are summed (sigmoid loss)
    or averaged (IPO).
  * The reference needs DeepSpeed ZeRO-3 + CPU offload to hold policy + ref
    (dpo_u2trainer.py:29-59). Here the ref model is just a frozen param
    pytree sharded on the same mesh — no second process, no offload.
  * Flush-left layout: each row is [prompt, completion, pad...] — equivalent
    to TRL's left-padded-prompt + flush_left normalization.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DPOConfig
from ..models.u2_model import U2CausalLM
from .sft import TrainState


# ---------------------------------------------------------------------------
# collation
# ---------------------------------------------------------------------------

def collate_preference_batch(
    samples: Sequence[dict], tokenizer, max_prompt_length: int,
    max_completion_length: int, image_transform=None,
) -> Optional[Dict[str, np.ndarray]]:
    """Build the concatenated (2B, S) batch from FusedDataset dpo_mode samples.

    Row i is the chosen sequence for sample i; row B+i the rejected one.
    Images are transformed here at collate time from the stored path when
    ``image_transform`` is given (dpo_u2trainer.py:160-162 applies u2Transform
    at step time) — samples may carry either a path or a ready array.
    """
    samples = [s for s in samples if s is not None]
    if not samples:
        return None
    b = len(samples)
    s_total = max_prompt_length + max_completion_length

    input_ids = np.full((2 * b, s_total), tokenizer.pad_token_id, np.int32)
    attention = np.zeros((2 * b, s_total), np.int32)
    comp_mask = np.zeros((2 * b, s_total), np.float32)
    images = []
    question_ids = []

    for i, s in enumerate(samples):
        prompt_ids = tokenizer(s["prompt"], add_special_tokens=False)[
            "input_ids"][:max_prompt_length]
        for j, key in enumerate(("chosen", "rejected")):
            comp = tokenizer(s[key], add_special_tokens=False)["input_ids"]
            comp = comp[: max_completion_length - 1] + [tokenizer.eos_token_id]
            row = i + j * b
            seq = prompt_ids + comp
            input_ids[row, : len(seq)] = seq
            attention[row, : len(seq)] = 1
            comp_mask[row, len(prompt_ids): len(seq)] = 1.0
        img = s["image"]
        if isinstance(img, str):
            if image_transform is None:
                raise ValueError("sample has an image path but no transform")
            img = image_transform(img)
        images.append(img)
        question_ids.append(np.asarray(s["prompt_question_ids"], np.int32))

    return {
        "input_ids": input_ids,
        "attention_mask": attention,
        "completion_mask": comp_mask,
        "images": np.stack(images).astype(np.float32),
        "question_ids": np.stack(question_ids),
    }


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def _completion_logps(model: U2CausalLM, params, batch,
                      average: bool) -> jax.Array:
    """(2B,) summed (or mean) completion-token log-probs under ``params``."""
    b2 = batch["input_ids"].shape[0]
    b = b2 // 2
    images = jnp.concatenate([batch["images"], batch["images"]], axis=0)
    question_ids = jnp.concatenate(
        [batch["question_ids"], batch["question_ids"]], axis=0)
    logits, _, _ = model.apply(
        params, batch["input_ids"], images, question_ids,
        attention_mask=batch["attention_mask"])
    # token t predicted by logits[t-1] (selective_log_softmax parity,
    # dpo_u2trainer.py:296)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = batch["input_ids"][:, 1:]
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = batch["completion_mask"][:, 1:]
    sums = jnp.sum(tok_logp * mask, axis=-1)
    if average:
        sums = sums / jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    return sums


def dpo_loss(policy_c, policy_r, ref_c, ref_r, cfg: DPOConfig):
    logits = (policy_c - policy_r) - (ref_c - ref_r)
    if cfg.loss_type == "sigmoid":
        loss = (
            -jax.nn.log_sigmoid(cfg.beta * logits) * (1.0 - cfg.label_smoothing)
            - jax.nn.log_sigmoid(-cfg.beta * logits) * cfg.label_smoothing)
    elif cfg.loss_type == "ipo":
        loss = (logits - 1.0 / (2.0 * cfg.beta)) ** 2
    else:
        raise ValueError(cfg.loss_type)
    return jnp.mean(loss), logits


def make_dpo_loss_fn(model: U2CausalLM, cfg: DPOConfig):
    average = cfg.loss_type == "ipo"

    def loss_fn(params, ref_params, batch):
        logps = _completion_logps(model, params, batch, average)
        ref_logps = jax.lax.stop_gradient(
            _completion_logps(model, ref_params, batch, average))
        b = logps.shape[0] // 2
        policy_c, policy_r = logps[:b], logps[b:]
        ref_c, ref_r = ref_logps[:b], ref_logps[b:]
        loss, margins = dpo_loss(policy_c, policy_r, ref_c, ref_r, cfg)
        reward_c = cfg.beta * (policy_c - ref_c)
        reward_r = cfg.beta * (policy_r - ref_r)
        metrics = {
            "loss": loss,
            "rewards_chosen": jnp.mean(reward_c),
            "rewards_rejected": jnp.mean(reward_r),
            "rewards_margin": jnp.mean(reward_c - reward_r),
            "rewards_accuracy": jnp.mean((reward_c > reward_r).astype(jnp.float32)),
        }
        return loss, metrics

    return loss_fn


def make_dpo_train_step(model: U2CausalLM, tx: optax.GradientTransformation,
                        cfg: DPOConfig):
    loss_fn = make_dpo_loss_fn(model, cfg)

    def train_step(state: TrainState, ref_params, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, ref_params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), metrics

    return train_step
