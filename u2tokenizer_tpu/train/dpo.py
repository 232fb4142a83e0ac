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


def collate_packed_preference_batch(
    samples: Sequence[dict], tokenizer, max_prompt_length: int,
    max_completion_length: int, image_transform=None,
) -> Optional[Dict[str, np.ndarray]]:
    """Packed layout: one row per sample = [prompt, chosen, rejected, pad]
    with segment ids (0/1/2/3), restarting positions for the rejected
    segment, and explicit boundary indices (see _packed_completion_logps).
    """
    samples = [s for s in samples if s is not None]
    if not samples:
        return None
    b = len(samples)
    s_total = max_prompt_length + 2 * max_completion_length

    pad = tokenizer.pad_token_id
    input_ids = np.full((b, s_total), pad, np.int32)
    segment_ids = np.full((b, s_total), 3, np.int32)
    positions = np.zeros((b, s_total), np.int32)
    chosen_mask = np.zeros((b, s_total), np.float32)
    rejected_mask = np.zeros((b, s_total), np.float32)
    rejected_start = np.zeros((b,), np.int32)
    prompt_last = np.zeros((b,), np.int32)
    images, question_ids = [], []

    for i, s in enumerate(samples):
        prompt_ids = tokenizer(s["prompt"], add_special_tokens=False)[
            "input_ids"][:max_prompt_length]
        comps = []
        for key in ("chosen", "rejected"):
            c = tokenizer(s[key], add_special_tokens=False)["input_ids"]
            comps.append(c[: max_completion_length - 1] +
                         [tokenizer.eos_token_id])
        lp, lc, lr = len(prompt_ids), len(comps[0]), len(comps[1])
        row = prompt_ids + comps[0] + comps[1]
        input_ids[i, : len(row)] = row
        segment_ids[i, :lp] = 0
        segment_ids[i, lp: lp + lc] = 1
        segment_ids[i, lp + lc: lp + lc + lr] = 2
        positions[i, : lp + lc] = np.arange(lp + lc)
        # rejected positions restart after the prompt (two-row equivalence)
        positions[i, lp + lc: lp + lc + lr] = lp + np.arange(lr)
        chosen_mask[i, lp: lp + lc] = 1.0
        # exclude the boundary token — it is added via prompt_last logits
        rejected_mask[i, lp + lc + 1: lp + lc + lr] = 1.0
        rejected_start[i] = lp + lc
        prompt_last[i] = lp - 1
        img = s["image"]
        if isinstance(img, str):
            if image_transform is None:
                raise ValueError("sample has an image path but no transform")
            img = image_transform(img)
        images.append(img)
        question_ids.append(np.asarray(s["prompt_question_ids"], np.int32))

    return {
        "input_ids": input_ids,
        "segment_ids": segment_ids,
        "positions": positions,
        "chosen_mask": chosen_mask,
        "rejected_mask": rejected_mask,
        "rejected_start": rejected_start,
        "prompt_last": prompt_last,
        "images": np.stack(images).astype(np.float32),
        "question_ids": np.stack(question_ids),
    }


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def _completion_logps(model: U2CausalLM, params, batch,
                      average: bool, aux: bool = False, ce_chunk: int = 0):
    """(2B,) summed (or mean) completion-token log-probs under ``params``.

    With ``aux=True`` also returns (wpo_weights, chosen_nll): the WPO
    sequence weights (dpo_u2trainer.py:320-329) and the chosen-completion
    mean NLL used by RPO (dpo_u2trainer.py:331-340).

    ``ce_chunk > 0`` computes everything from hidden states in sequence
    chunks under a rematerialized scan, never materializing the
    (2B, S, V) logits — the DPO step otherwise holds TWO such tensors
    (policy + reference forward), the dominant stage-2 activation at
    V≈152k. Numerics identical up to summation order.
    """
    b2 = batch["input_ids"].shape[0]
    b = b2 // 2
    images = batch.get("images")
    if images is not None:
        images = jnp.concatenate([images, images], axis=0)
    question_ids = jnp.concatenate(
        [batch["question_ids"], batch["question_ids"]], axis=0)
    targets = batch["input_ids"][:, 1:]
    mask = batch["completion_mask"][:, 1:]
    if ce_chunk:
        embeds = model.apply(params, batch["input_ids"], images,
                             question_ids, method="prepare_inputs_embeds")
        _, hidden, _ = model.apply(
            params, embeds, batch["attention_mask"], compute_logits=False,
            method="forward_embeds")
        s_tok, s_adj = _chunked_completion_stats(
            lambda h: model.apply(params, h, method="lm_logits"),
            hidden[:, :-1], targets, mask, ce_chunk, need_adj=aux)
        msum = jnp.sum(mask, axis=-1).astype(jnp.float32)
        sums = s_tok / jnp.maximum(msum, 1.0) if average else s_tok
        if not aux:
            return sums
        w = s_adj / jnp.maximum(msum, 1.0)
        weights = jnp.minimum(jnp.exp(w[:b] + w[b:]), 1.0)
        nll = -jnp.sum(s_tok[:b]) / jnp.maximum(jnp.sum(msum[:b]), 1.0)
        return sums, weights, nll
    logits, _, _ = model.apply(
        params, batch["input_ids"], images, question_ids,
        attention_mask=batch["attention_mask"])
    # token t predicted by logits[t-1] (selective_log_softmax parity,
    # dpo_u2trainer.py:296)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    sums = jnp.sum(tok_logp * mask, axis=-1)
    if average:
        sums = sums / jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    if not aux:
        return sums
    return sums, _wpo_weights(logp, tok_logp, mask, b), _chosen_nll(
        tok_logp[:b], mask[:b])


def _chunked_completion_stats(apply_logits, hidden, targets, mask,
                              chunk: int, need_adj: bool = True):
    """Masked per-sequence sums of (tok_logp, WPO-adjusted tok_logp) from
    hidden states, walking S in ``chunk`` pieces under a rematerialized
    scan (peak (2B, chunk, V) instead of (2B, S, V) in fwd AND bwd).
    ``need_adj=False`` (reference forward / no-WPO policy forward) skips
    the adjustment's extra full-vocab logsumexp pass and returns None."""
    if chunk <= 0:
        raise ValueError(f"ce_chunk must be > 0, got {chunk}")
    b2, sm1 = targets.shape
    pad = (-sm1) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    nch = (sm1 + pad) // chunk
    hc = jnp.transpose(hidden.reshape(b2, nch, chunk, hidden.shape[-1]),
                       (1, 0, 2, 3))
    tc = jnp.transpose(targets.reshape(b2, nch, chunk), (1, 0, 2))
    mc = jnp.transpose(mask.reshape(b2, nch, chunk), (1, 0, 2))

    def body(carry, xs):
        s_tok, s_adj = carry
        h, t, m = xs
        logp = jax.nn.log_softmax(apply_logits(h).astype(jnp.float32),
                                  axis=-1)
        tok = jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
        s_tok = s_tok + jnp.sum(tok * m, axis=-1)
        if need_adj:
            adj = jax.lax.stop_gradient(
                jax.nn.logsumexp(2.0 * logp, axis=-1))
            s_adj = s_adj + jnp.sum(
                (jax.lax.stop_gradient(tok) - adj) * m, axis=-1)
        return (s_tok, s_adj), None

    zero = jnp.zeros((b2,), jnp.float32)
    (s_tok, s_adj), _ = jax.lax.scan(jax.checkpoint(body), (zero, zero),
                                     (hc, tc, mc))
    return s_tok, (s_adj if need_adj else None)


def _wpo_weights(logp, tok_logp, mask, b):
    """WPO policy weights, eq. (2) of arXiv 2406.11827
    (dpo_u2trainer.py:320-329): per-token logp minus logsumexp(2*logp),
    masked-mean per sequence; weight = clamp(exp(w_chosen + w_rejected), 1).
    """
    adjustment = jax.lax.stop_gradient(
        jax.nn.logsumexp(2.0 * logp, axis=-1))  # (2B, S-1)
    adjusted = jax.lax.stop_gradient(tok_logp) - adjustment
    w = jnp.sum(adjusted * mask, axis=-1) / jnp.maximum(
        jnp.sum(mask, axis=-1), 1.0)
    return jnp.minimum(jnp.exp(w[:b] + w[b:]), 1.0)


def _chosen_nll(chosen_tok_logp, chosen_mask):
    """Mean NLL over chosen completion tokens (RPO, dpo_u2trainer.py:331-340)."""
    return -jnp.sum(chosen_tok_logp * chosen_mask) / jnp.maximum(
        jnp.sum(chosen_mask), 1.0)


# --- packed (padding-free-equivalent) forward -------------------------------

def packed_segment_mask(segment_ids: jnp.ndarray) -> jnp.ndarray:
    """bool (B, 1, S, S) attention mask for packed preference rows.

    Segment ids per token: 0=prompt, 1=chosen completion, 2=rejected
    completion, 3=pad. A query attends a key iff the key is not pad, the
    key precedes it in the row, and the key is prompt or same-segment —
    chosen and rejected completions never see each other, reproducing the
    two-row concatenated forward exactly (TRL padding-free semantics,
    dpo_u2trainer.py:300-310, expressed with static shapes for XLA).
    """
    b, s = segment_ids.shape
    q = segment_ids[:, :, None]
    k = segment_ids[:, None, :]
    causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None]
    ok = causal & (k != 3) & (q != 3) & ((k == 0) | (k == q))
    return ok[:, None]


def _packed_completion_logps(model: U2CausalLM, params, batch,
                             average: bool, aux: bool = False):
    """Packed rows [prompt, chosen, rejected, pad]: ONE forward of B rows
    (vision + prompt encoded once per sample instead of twice). Returns the
    same (2B,) ordering as the concatenated forward: chosen logps first.

    Exactness: within a segment, token t is predicted by logits[t-1] as
    usual. The rejected segment's FIRST token is index-adjacent to the last
    chosen token, whose logits carry the wrong context — but in the two-row
    layout that token is predicted by the last PROMPT position, and the
    packed row contains those exact logits too (the prompt sees no
    completion tokens under the segment mask). So the boundary term is
    gathered explicitly from ``prompt_last`` and the shifted ``rejected_mask``
    excludes the boundary index (collation contract). The result is
    numerically identical to the concatenated forward.
    """
    mask = packed_segment_mask(batch["segment_ids"])
    embeds = model.apply(params, batch["input_ids"], batch.get("images"),
                         batch["question_ids"],
                         method="prepare_inputs_embeds")
    logits, _, _ = model.apply(params, embeds, mask=mask,
                               positions=batch["positions"],
                               method="forward_embeds")
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # (B,S,V)
    targets = batch["input_ids"][:, 1:]
    tok_logp = jnp.take_along_axis(
        logp[:, :-1], targets[..., None], axis=-1)[..., 0]
    c_mask = batch["chosen_mask"][:, 1:]
    r_mask = batch["rejected_mask"][:, 1:]  # excludes the boundary token
    # boundary: first rejected token, predicted by the last prompt position
    rej_start = batch["rejected_start"]            # (B,) int32
    prompt_last = batch["prompt_last"]             # (B,) int32
    boundary_tok = jnp.take_along_axis(
        batch["input_ids"], rej_start[:, None], axis=1)[:, 0]
    boundary_lp = jnp.take_along_axis(
        jnp.take_along_axis(logp, prompt_last[:, None, None], axis=1)[:, 0],
        boundary_tok[:, None], axis=1)[:, 0]
    has_rej = jnp.take_along_axis(
        batch["segment_ids"], rej_start[:, None], axis=1)[:, 0] == 2
    boundary_lp = jnp.where(has_rej, boundary_lp, 0.0)

    sums_c = jnp.sum(tok_logp * c_mask, axis=-1)
    sums_r = jnp.sum(tok_logp * r_mask, axis=-1) + boundary_lp
    n_c = jnp.maximum(jnp.sum(c_mask, axis=-1), 1.0)
    n_r = jnp.maximum(jnp.sum(r_mask, axis=-1) + has_rej, 1.0)
    if average:
        sums_c, sums_r = sums_c / n_c, sums_r / n_r
    sums = jnp.concatenate([sums_c, sums_r], axis=0)
    if not aux:
        return sums
    adjustment = jax.lax.stop_gradient(
        jax.nn.logsumexp(2.0 * logp[:, :-1], axis=-1))
    adjusted = jax.lax.stop_gradient(tok_logp) - adjustment
    b_adj = jax.lax.stop_gradient(jax.nn.logsumexp(
        2.0 * jnp.take_along_axis(logp, prompt_last[:, None, None],
                                  axis=1)[:, 0], axis=-1))
    b_adjusted = jnp.where(has_rej,
                           jax.lax.stop_gradient(boundary_lp) - b_adj, 0.0)
    w_c = jnp.sum(adjusted * c_mask, -1) / n_c
    w_r = (jnp.sum(adjusted * r_mask, -1) + b_adjusted) / n_r
    weights = jnp.minimum(jnp.exp(w_c + w_r), 1.0)
    return sums, weights, _chosen_nll(tok_logp, c_mask)


def dpo_loss(policy_c, policy_r, ref_c, ref_r, cfg: DPOConfig,
             weights=None, nll=None):
    """Per-pair DPO loss; optional WPO weighting and RPO NLL term."""
    logits = (policy_c - policy_r) - (ref_c - ref_r)
    if cfg.loss_type == "sigmoid":
        loss = (
            -jax.nn.log_sigmoid(cfg.beta * logits) * (1.0 - cfg.label_smoothing)
            - jax.nn.log_sigmoid(-cfg.beta * logits) * cfg.label_smoothing)
    elif cfg.loss_type == "ipo":
        loss = (logits - 1.0 / (2.0 * cfg.beta)) ** 2
    else:
        raise ValueError(cfg.loss_type)
    if weights is not None:  # WPO (dpo_u2trainer.py:320-329)
        loss = loss * weights
    loss = jnp.mean(loss)
    if nll is not None and cfg.rpo_alpha is not None:
        loss = loss + cfg.rpo_alpha * nll  # RPO (dpo_u2trainer.py:331-340)
    return loss, logits


def make_dpo_loss_fn(model: U2CausalLM, cfg: DPOConfig):
    average = cfg.loss_type == "ipo"
    need_aux = cfg.use_weighting or cfg.rpo_alpha is not None
    if cfg.packed:
        # the packed forward keeps the full-logits path (its per-segment
        # boundary gathers don't chunk cleanly); ce_chunk applies unpacked
        if cfg.ce_chunk:
            import warnings

            warnings.warn("DPOConfig(packed=True) ignores ce_chunk — the "
                          "packed forward materializes full logits; drop "
                          "packed to get the chunked memory relief",
                          stacklevel=2)
        fwd = _packed_completion_logps
    else:
        import functools

        fwd = functools.partial(_completion_logps, ce_chunk=cfg.ce_chunk)

    def loss_fn(params, ref_params, batch):
        weights = nll = None
        if need_aux:
            logps, weights, nll = fwd(model, params, batch, average, aux=True)
            if not cfg.use_weighting:
                weights = None
        else:
            logps = fwd(model, params, batch, average)
        ref_logps = jax.lax.stop_gradient(
            fwd(model, ref_params, batch, average))
        b = logps.shape[0] // 2
        policy_c, policy_r = logps[:b], logps[b:]
        ref_c, ref_r = ref_logps[:b], ref_logps[b:]
        loss, margins = dpo_loss(policy_c, policy_r, ref_c, ref_r, cfg,
                                 weights=weights, nll=nll)
        reward_c = cfg.beta * (policy_c - ref_c)
        reward_r = cfg.beta * (policy_r - ref_r)
        metrics = {
            "loss": loss,
            "rewards_chosen": jnp.mean(reward_c),
            "rewards_rejected": jnp.mean(reward_r),
            "rewards_margin": jnp.mean(reward_c - reward_r),
            "rewards_accuracy": jnp.mean((reward_c > reward_r).astype(jnp.float32)),
        }
        if nll is not None:
            metrics["nll_loss"] = nll
        return loss, metrics

    return loss_fn


def generate_from_model_and_ref(model: U2CausalLM, gen_cfg, params,
                                ref_params, batch, rng):
    """Sample completions from the policy and the frozen reference
    (dpo_u2trainer.py:61-113: eval-time generation logging). Returns
    (policy_tokens, ref_tokens), each (B, max_new_tokens) int32."""
    from ..models.generate import make_multimodal_generate_fn

    gen_fn = make_multimodal_generate_fn(model, gen_cfg)
    prompt_len = jnp.sum(batch["prompt_attention_mask"], axis=-1).astype(
        jnp.int32)
    r1, r2 = jax.random.split(rng)
    policy = gen_fn(params, batch["prompt_input_ids"], batch.get("images"),
                    batch["question_ids"], prompt_len, r1)
    ref = gen_fn(ref_params, batch["prompt_input_ids"], batch.get("images"),
                 batch["question_ids"], prompt_len, r2)
    return policy, ref


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
