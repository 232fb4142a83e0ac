"""DPO tests: collation layout, loss properties, end-to-end train step."""

import jax
import jax.numpy as jnp
import numpy as np

from test_data import MockTokenizer

from u2tokenizer_tpu.config import DPOConfig, TrainConfig, U2ModelConfig
from u2tokenizer_tpu.models.u2_model import U2CausalLM
from u2tokenizer_tpu.train.dpo import (
    collate_preference_batch,
    dpo_loss,
    make_dpo_loss_fn,
    make_dpo_train_step,
)
from u2tokenizer_tpu.train.sft import TrainState, make_optimizer


def _samples(cfg, n=2):
    d, h, w = cfg.vision.input_spatial
    rng = np.random.default_rng(0)
    return [{
        "prompt": f"describe case {i}",
        "chosen": "clear lungs no effusion",
        "rejected": "bad",
        "image": rng.normal(size=(cfg.num_chunks, d, h, w)).astype(np.float32),
        "prompt_question_ids": np.ones(6, np.int32),
    } for i in range(n)]


def test_collate_layout():
    cfg = U2ModelConfig.tiny()
    tok = MockTokenizer()
    batch = collate_preference_batch(_samples(cfg), tok, 8, 8)
    assert batch["input_ids"].shape == (4, 16)
    # chosen rows then rejected rows; completion mask excludes prompt
    prompt_len = len(tok("describe case 0")["input_ids"])
    assert batch["completion_mask"][0, :prompt_len].sum() == 0
    assert batch["completion_mask"][0].sum() > 0
    # every completion ends with eos
    for row in range(4):
        seq_len = int(batch["attention_mask"][row].sum())
        assert batch["input_ids"][row, seq_len - 1] == tok.eos_token_id
    # chosen longer than rejected
    assert batch["completion_mask"][0].sum() > batch["completion_mask"][2].sum()


def test_dpo_loss_properties():
    cfg = DPOConfig(beta=0.1)
    # preferring chosen -> lower loss than preferring rejected
    good, _ = dpo_loss(jnp.array([0.0]), jnp.array([-5.0]),
                       jnp.array([0.0]), jnp.array([0.0]), cfg)
    bad, _ = dpo_loss(jnp.array([-5.0]), jnp.array([0.0]),
                      jnp.array([0.0]), jnp.array([0.0]), cfg)
    neutral, _ = dpo_loss(jnp.array([0.0]), jnp.array([0.0]),
                          jnp.array([0.0]), jnp.array([0.0]), cfg)
    assert float(good) < float(neutral) < float(bad)
    np.testing.assert_allclose(float(neutral), np.log(2), rtol=1e-5)


def test_dpo_train_step_runs_and_separates():
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    tok = MockTokenizer()
    batch = collate_preference_batch(_samples(cfg), tok, 8, 8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = jax.random.PRNGKey(0)
    params = model.init(rng, batch["input_ids"][:2],
                        batch["images"], batch["question_ids"])
    ref_params = jax.tree_util.tree_map(lambda x: x, params)

    dcfg = DPOConfig(beta=0.1)
    tx = make_optimizer(TrainConfig(learning_rate=1e-3, warmup_ratio=0.0), 10)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step = jax.jit(make_dpo_train_step(model, tx, dcfg))

    # at init policy == ref -> loss = log(2), margin 0
    loss_fn = make_dpo_loss_fn(model, dcfg)
    _, m0 = loss_fn(params, ref_params, batch)
    np.testing.assert_allclose(float(m0["loss"]), np.log(2), rtol=1e-4)
    np.testing.assert_allclose(float(m0["rewards_margin"]), 0.0, atol=1e-5)

    losses = []
    for _ in range(4):
        state, metrics = step(state, ref_params, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # preference being learned
    _, m1 = loss_fn(state.params, ref_params, batch)
    assert float(m1["rewards_margin"]) > 0.0


def test_packed_equals_concatenated():
    """The packed (padding-free-equivalent) forward must reproduce the
    two-row concatenated logps exactly (dpo_u2trainer.py:300-310 parity)."""
    from u2tokenizer_tpu.train.dpo import (_completion_logps,
                                           _packed_completion_logps,
                                           collate_packed_preference_batch)

    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    tok = MockTokenizer()
    samples = _samples(cfg)
    cat = {k: jnp.asarray(v) for k, v in
           collate_preference_batch(samples, tok, 8, 8).items()}
    packed = {k: jnp.asarray(v) for k, v in
              collate_packed_preference_batch(samples, tok, 8, 8).items()}

    rng = jax.random.PRNGKey(0)
    params = model.init(rng, cat["input_ids"][:2], cat["images"],
                        cat["question_ids"])
    for average in (False, True):
        a = np.asarray(_completion_logps(model, params, cat, average))
        b = np.asarray(_packed_completion_logps(model, params, packed,
                                                average))
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)
    # aux quantities agree too (WPO weights, chosen NLL)
    _, w_a, nll_a = _completion_logps(model, params, cat, False, aux=True)
    _, w_b, nll_b = _packed_completion_logps(model, params, packed, False,
                                             aux=True)
    np.testing.assert_allclose(np.asarray(w_b), np.asarray(w_a),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(nll_b), float(nll_a), rtol=2e-5)


def test_chunked_completion_logps_matches_plain():
    """ce_chunk > 0 reproduces the full-logits completion logps, WPO
    weights, chosen NLL, AND the loss gradients (summation order only) —
    including a chunk that does not divide S-1."""
    from u2tokenizer_tpu.train.dpo import (_completion_logps,
                                           make_dpo_loss_fn)

    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    tok = MockTokenizer()
    cat = {k: jnp.asarray(v) for k, v in
           collate_preference_batch(_samples(cfg), tok, 8, 8).items()}
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, cat["input_ids"][:2], cat["images"],
                        cat["question_ids"])

    for average in (False, True):
        a = np.asarray(_completion_logps(model, params, cat, average))
        c = np.asarray(_completion_logps(model, params, cat, average,
                                         ce_chunk=5))
        np.testing.assert_allclose(c, a, rtol=2e-5, atol=2e-5)
    _, w_a, nll_a = _completion_logps(model, params, cat, False, aux=True)
    _, w_c, nll_c = _completion_logps(model, params, cat, False, aux=True,
                                      ce_chunk=5)
    np.testing.assert_allclose(np.asarray(w_c), np.asarray(w_a),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(nll_c), float(nll_a), rtol=2e-5)

    # end-to-end loss gradient parity through make_dpo_loss_fn
    for dcfg in (DPOConfig(beta=0.1, use_weighting=True, rpo_alpha=0.5),
                 DPOConfig(beta=0.1)):
        import dataclasses

        plain = make_dpo_loss_fn(model, dcfg)
        chunked = make_dpo_loss_fn(model,
                                   dataclasses.replace(dcfg, ce_chunk=5))
        (l_a, _), g_a = jax.value_and_grad(plain, has_aux=True)(
            params, params, cat)
        (l_c, _), g_c = jax.value_and_grad(chunked, has_aux=True)(
            params, params, cat)
        np.testing.assert_allclose(float(l_c), float(l_a), rtol=1e-6)
        for x, y in zip(jax.tree_util.tree_leaves(g_a),
                        jax.tree_util.tree_leaves(g_c)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=2e-5, atol=2e-6)


def test_wpo_rpo_loss_variants():
    """WPO weights scale the pair loss; RPO adds alpha * chosen NLL; a
    packed train step learns the preference like the concatenated one."""
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    tok = MockTokenizer()
    from u2tokenizer_tpu.train.dpo import collate_packed_preference_batch

    batch = {k: jnp.asarray(v) for k, v in
             collate_packed_preference_batch(_samples(cfg), tok, 8, 8).items()}
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, batch["input_ids"][:2], batch["images"],
                        batch["question_ids"])
    ref_params = jax.tree_util.tree_map(lambda x: x, params)

    base = make_dpo_loss_fn(model, DPOConfig(packed=True))
    wpo = make_dpo_loss_fn(model, DPOConfig(packed=True, use_weighting=True))
    rpo = make_dpo_loss_fn(model, DPOConfig(packed=True, rpo_alpha=1.0))

    l0, m0 = base(params, ref_params, batch)
    lw, _ = wpo(params, ref_params, batch)
    lr, mr = rpo(params, ref_params, batch)
    # WPO weights are clamped to <= 1, so weighted loss <= unweighted (at
    # init the pair losses are all log(2) > 0)
    assert float(lw) <= float(l0) + 1e-6
    # RPO = base + alpha * nll, with nll > 0
    assert "nll_loss" in mr and float(mr["nll_loss"]) > 0
    np.testing.assert_allclose(float(lr), float(l0) + float(mr["nll_loss"]),
                               rtol=1e-5)

    # packed + WPO + RPO trains: the preference margin grows on a fixed batch
    dcfg = DPOConfig(packed=True, use_weighting=True, rpo_alpha=0.1)
    tx = make_optimizer(TrainConfig(learning_rate=1e-3, warmup_ratio=0.0,
                                    lr_schedule="constant"), 10)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step = jax.jit(make_dpo_train_step(model, tx, dcfg))
    margins = []
    for _ in range(4):
        state, metrics = step(state, ref_params, batch)
        margins.append(float(metrics["rewards_margin"]))
    assert np.isfinite(margins).all() and margins[-1] > margins[0]


def test_generate_from_model_and_ref():
    from u2tokenizer_tpu.config import GenerationConfig
    from u2tokenizer_tpu.train.dpo import generate_from_model_and_ref

    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    d, h, w = cfg.vision.input_spatial
    b, s = 2, 12
    batch = {
        "prompt_input_ids": jnp.ones((b, s), jnp.int32),
        "prompt_attention_mask": jnp.concatenate(
            [jnp.ones((b, 8), jnp.int32), jnp.zeros((b, 4), jnp.int32)], 1),
        "images": jnp.zeros((b, cfg.num_chunks, d, h, w)),
        "question_ids": jnp.ones((b, 4), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["prompt_input_ids"],
                        batch["images"], batch["question_ids"])
    gen_cfg = GenerationConfig(max_new_tokens=4, do_sample=True, top_p=0.9,
                               eos_token_id=-2)
    pol, ref = generate_from_model_and_ref(
        model, gen_cfg, params, params, batch, jax.random.PRNGKey(1))
    assert pol.shape == (b, 4) and ref.shape == (b, 4)
