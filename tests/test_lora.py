"""LoRA tests: target selection, zero-init identity, adapter training."""

import jax
import jax.numpy as jnp
import numpy as np

from u2tokenizer_tpu.config import TrainConfig, U2ModelConfig
from u2tokenizer_tpu.models.u2_model import U2CausalLM
from u2tokenizer_tpu.train.lora import (
    LoraConfig,
    apply_lora,
    count_params,
    init_lora_params,
    make_lora_train_step,
    merge_lora,
)
from u2tokenizer_tpu.train.sft import (
    IGNORE_INDEX,
    TrainState,
    make_loss_fn,
    make_optimizer,
)


def _setup():
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    b, s = 2, 24
    batch = {
        "input_ids": jnp.zeros((b, s), jnp.int32),
        "images": jax.random.normal(rng, (b, cfg.num_chunks, d, h, w)),
        "question_ids": jnp.ones((b, 6), jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": jax.random.randint(rng, (b, s), 0, cfg.llm.vocab_size)
        .at[:, :4].set(IGNORE_INDEX),
    }
    params = model.init(rng, batch["input_ids"], batch["images"],
                        batch["question_ids"])
    return cfg, model, params, batch


def test_lora_targets_decoder_only():
    cfg, model, params, batch = _setup()
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora_params(params, lcfg, jax.random.PRNGKey(1))
    assert lora, "no targets found"
    for path in lora:
        assert "llm" in path
        assert "vision_tower" not in path
        assert "u2tokenizer" not in path
        assert "embed_tokens" not in path and "lm_head" not in path
    # adapter params are a small fraction
    assert count_params(lora) < 0.2 * count_params(params)


def test_lora_zero_init_is_identity():
    cfg, model, params, batch = _setup()
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora_params(params, lcfg, jax.random.PRNGKey(1))
    eff = apply_lora(params, lora, lcfg)
    l0, _, _ = model.apply(params, batch["input_ids"], batch["images"],
                           batch["question_ids"])
    l1, _, _ = model.apply(eff, batch["input_ids"], batch["images"],
                           batch["question_ids"])
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-6)


def test_lora_training_learns_and_freezes_base():
    cfg, model, params, batch = _setup()
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora_params(params, lcfg, jax.random.PRNGKey(1))
    tx = make_optimizer(TrainConfig(learning_rate=5e-3, warmup_ratio=0.0), 10)
    wrapped = {"lora": lora, "base": params}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=wrapped,
                       opt_state=tx.init(wrapped))
    step = jax.jit(make_lora_train_step(model, tx, lcfg, make_loss_fn(model)))

    frozen_before = np.asarray(
        params["params"]["llm"]["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]).copy()
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # frozen decoder base kernel unchanged; its lora B no longer zero
    frozen_after = np.asarray(
        state.params["base"]["params"]["llm"]["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_array_equal(frozen_before, frozen_after)
    b_path = [p for p in state.params["lora"] if "q_proj" in p][0]
    assert float(jnp.abs(state.params["lora"][b_path]["b"]).sum()) > 0

    # merged model reproduces adapted behavior
    merged = merge_lora(state.params["base"], state.params["lora"], lcfg)
    la, _, _ = model.apply(merged, batch["input_ids"], batch["images"],
                           batch["question_ids"])
    eff = apply_lora(state.params["base"], state.params["lora"], lcfg)
    lb, _, _ = model.apply(eff, batch["input_ids"], batch["images"],
                           batch["question_ids"])
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)
