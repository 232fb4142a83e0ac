"""QLoRA: quantized frozen base + fp32 low-rank adapters (decoder.QDense
lora branch).

This is the path that fits μ²Qwen3-8B SFT on ONE 16 GB chip — the reference
trains on 4x80 GB A100 (/root/reference/README.md:63). Contracts tested:

  * lora_b = 0 at init => the QLoRA forward equals the plain quantized
    forward exactly (adapters start as a no-op, reference peft semantics
    train_stage1.py:342-361);
  * training touches ONLY the trainable subset (adapters + μ²tokenizer +
    projector); the integer base is a closed-over constant;
  * merge_qlora folds adapters + dequantized kernels into a plain float
    tree whose forward matches the QLoRA model;
  * dequantize_llm_weights inverts quantize_llm_weights up to quantization
    rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.traverse_util import flatten_dict

from u2tokenizer_tpu.config import LLMConfig, U2ModelConfig
from u2tokenizer_tpu.models.llm.decoder import CausalLM
from u2tokenizer_tpu.models.quantize import (dequantize_llm_weights,
                                             quantize_llm_weights)
from u2tokenizer_tpu.models.u2_model import U2CausalLM
from u2tokenizer_tpu.train.lora import (init_qlora_from_quantized,
                                        make_qlora_train_step, merge_qlora,
                                        qlora_config, qlora_merge_trees,
                                        qlora_partition)
from u2tokenizer_tpu.train.sft import IGNORE_INDEX, cross_entropy_loss


def _lm_logits(model, params, ids):
    emb = model.apply(params, ids, method="embed_tokens")
    logits, _, _ = model.apply(params, emb, method="forward_embeds")
    return logits


@pytest.fixture(scope="module")
def float_lm():
    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0,
                             cfg.vocab_size).astype(jnp.int32)
    emb0 = jnp.zeros((2, 10, cfg.hidden_size), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), emb0,
                        jnp.zeros((2, 10), jnp.int32),
                        jnp.tril(jnp.ones((10, 10), bool))[None, None])
    return cfg, model, params, ids


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_qlora_identity_at_init(float_lm, mode):
    """Freshly-initialized adapters (lora_b=0) are a no-op: QLoRA forward
    == plain quantized forward, bit-exact."""
    cfg, model, params, ids = float_lm
    qparams = quantize_llm_weights(params, mode)

    import dataclasses

    qcfg = qlora_config(cfg, rank=4, mode=mode)
    qmodel = CausalLM(dataclasses.replace(qcfg, lora_rank=0),
                      dtype=jnp.float32)
    base_logits = _lm_logits(qmodel, qparams, ids)

    lmodel = CausalLM(qcfg, dtype=jnp.float32)
    emb0 = jnp.zeros((2, 10, cfg.hidden_size), jnp.float32)
    lparams = init_qlora_from_quantized(
        lmodel, jax.random.PRNGKey(7), qparams, emb0,
        jnp.zeros((2, 10), jnp.int32),
        jnp.tril(jnp.ones((10, 10), bool))[None, None])
    lora_logits = _lm_logits(lmodel, lparams, ids)
    np.testing.assert_array_equal(np.asarray(lora_logits),
                                  np.asarray(base_logits))

    flat = flatten_dict(lparams, sep="/")
    assert any(k.endswith("/lora_a") for k in flat)
    # exclusion list: embeddings / lm_head carry no adapters
    assert not any("lm_head" in k and "lora" in k for k in flat)
    assert not any("embed_tokens" in k and "lora" in k for k in flat)


def _tiny_u2_batch(cfg, b=2):
    rng = jax.random.PRNGKey(3)
    d, h, w = cfg.vision.input_spatial
    s = 24
    images = jax.random.normal(rng, (b, cfg.num_chunks, d, h, w))
    input_ids = jax.random.randint(jax.random.PRNGKey(4), (b, s), 0,
                                   cfg.llm.vocab_size).astype(jnp.int32)
    labels = np.asarray(input_ids).copy()
    labels[:, : 1 + cfg.proj_out_num] = IGNORE_INDEX
    return {"input_ids": input_ids, "images": images,
            "question_ids": jnp.ones((b, 6), jnp.int32),
            "attention_mask": jnp.ones((b, s), jnp.int32),
            "labels": jnp.asarray(labels)}


def test_qlora_train_step_u2():
    """End-to-end μ² QLoRA: loss decreases over a few steps on a fixed
    batch; only adapters + μ²tokenizer/projector train; the integer base is
    untouched by construction (closed over, no grads, no optimizer state)."""
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    batch = _tiny_u2_batch(cfg)
    fparams = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                         batch["images"], batch["question_ids"])
    qparams = quantize_llm_weights(fparams, "int8")

    qcfg = qlora_config(cfg, rank=4, mode="int8")
    qmodel = U2CausalLM(qcfg, dtype=jnp.float32)
    lparams = init_qlora_from_quantized(
        qmodel, jax.random.PRNGKey(7), qparams, batch["input_ids"],
        batch["images"], batch["question_ids"])

    train_flat, frozen_flat = qlora_partition(lparams)
    assert all(k.endswith(("/lora_a", "/lora_b")) or "u2tokenizer" in k
               or "mm_projector" in k for k in train_flat)
    assert any(jnp.issubdtype(v.dtype, jnp.integer)
               for v in frozen_flat.values())

    def loss_fn(params, b):
        logits, _, _ = qmodel.apply(
            params, b["input_ids"], b["images"], b["question_ids"],
            attention_mask=b["attention_mask"])
        return cross_entropy_loss(logits, b["labels"])

    tx = optax.adamw(1e-2)
    step = jax.jit(make_qlora_train_step(tx, loss_fn))
    opt_state = tx.init(train_flat)
    losses = []
    for _ in range(6):
        train_flat, opt_state, loss, _, gn = step(train_flat, opt_state,
                                                  frozen_flat, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert float(gn) > 0.0
    # adapters actually moved
    moved = [k for k, v in train_flat.items()
             if k.endswith("/lora_b") and float(jnp.abs(v).max()) > 0]
    assert moved


@pytest.mark.slow  # 8-device virtual-mesh sharded QLoRA step
def test_qlora_train_step_sharded_matches_single():
    """Multi-chip QLoRA: the same train step with every tree (adapters,
    frozen quantized base, optimizer state) placed via the mesh sharding
    rules and the batch data-sharded produces the single-device loss
    trajectory — sharding quantized int8 leaves and grouped-kernel layouts
    must be transparent (rules fall back to replication where a dim does
    not divide the mesh axis)."""
    from u2tokenizer_tpu.config import MeshConfig
    from u2tokenizer_tpu.parallel.mesh import (data_sharding, make_mesh,
                                               tree_shardings)

    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    batch = _tiny_u2_batch(cfg, b=4)  # divisible by the data*fsdp axes
    fparams = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                         batch["images"], batch["question_ids"])
    qparams = quantize_llm_weights(fparams, "int8")
    qcfg = qlora_config(cfg, rank=4, mode="int8")
    qmodel = U2CausalLM(qcfg, dtype=jnp.float32)
    lparams = init_qlora_from_quantized(
        qmodel, jax.random.PRNGKey(7), qparams, batch["input_ids"],
        batch["images"], batch["question_ids"])
    train_flat, frozen_flat = qlora_partition(lparams)

    def loss_fn(params, b):
        logits, _, _ = qmodel.apply(
            params, b["input_ids"], b["images"], b["question_ids"],
            attention_mask=b["attention_mask"])
        return cross_entropy_loss(logits, b["labels"])

    tx = optax.adamw(1e-2)
    step = jax.jit(make_qlora_train_step(tx, loss_fn))

    def run(tf, ff, bt, n=3):
        opt = jax.tree_util.tree_map(jnp.asarray, tx.init(tf))
        losses = []
        for _ in range(n):
            tf, opt, loss, _, _ = step(tf, opt, ff, bt)
            losses.append(float(loss))
        return losses

    ref = run(train_flat, frozen_flat, batch)

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    tf_s = jax.device_put(train_flat, tree_shardings(mesh, train_flat))
    ff_s = jax.device_put(frozen_flat, tree_shardings(mesh, frozen_flat))
    batch_s = {k: jax.device_put(v, data_sharding(mesh, v.ndim))
               for k, v in batch.items()}
    out = run(tf_s, ff_s, batch_s)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_merge_qlora_matches_adapted_forward(float_lm):
    """Folding adapters into dequantized kernels gives a plain float model
    whose forward matches the QLoRA forward (fp32 associativity only)."""
    cfg, model, params, ids = float_lm
    qparams = quantize_llm_weights(params, "int8")
    qcfg = qlora_config(cfg, rank=4, mode="int8")
    lmodel = CausalLM(qcfg, dtype=jnp.float32)
    emb0 = jnp.zeros((2, 10, cfg.hidden_size), jnp.float32)
    lparams = init_qlora_from_quantized(
        lmodel, jax.random.PRNGKey(7), qparams, emb0,
        jnp.zeros((2, 10), jnp.int32),
        jnp.tril(jnp.ones((10, 10), bool))[None, None])
    # give the adapters real values (lora_b=0 would make the test vacuous)
    flat = flatten_dict(lparams, sep="/")
    keys = jax.random.split(jax.random.PRNGKey(9), len(flat))
    from flax.traverse_util import unflatten_dict
    lparams = unflatten_dict(
        {k: (0.02 * jax.random.normal(key, v.shape, v.dtype)
             if k.endswith("/lora_b") else v)
         for (k, v), key in zip(flat.items(), keys)}, sep="/")

    adapted = _lm_logits(lmodel, lparams, ids)

    merged = merge_qlora(lparams, qcfg)
    fmodel = CausalLM(cfg, dtype=jnp.float32)
    merged_logits = _lm_logits(fmodel, merged, ids)
    np.testing.assert_allclose(np.asarray(merged_logits),
                               np.asarray(adapted), rtol=2e-4, atol=2e-4)


def test_cli_qlora_training_runs(tmp_path):
    """cli._run_qlora_training end-to-end on the tiny config: loss logged,
    orbax checkpoint written, adapters exported; loss decreases on the
    fixed synthetic batch."""
    import json as _json
    from types import SimpleNamespace

    from u2tokenizer_tpu.cli import _run_qlora_training
    from u2tokenizer_tpu.config import TrainConfig

    cfg = U2ModelConfig.tiny()
    batch = _tiny_u2_batch(cfg)
    host = {("input_ids" if k == "input_ids" else k): np.asarray(v)
            for k, v in batch.items()}

    class _Loader:
        def __len__(self):
            return 4

        def __iter__(self):
            return iter([host] * 4)

    out = str(tmp_path / "qlora_run")
    tcfg = TrainConfig(learning_rate=1e-2, max_steps=6, save_steps=100,
                       log_steps=1, output_dir=out, bf16=False)
    args = SimpleNamespace(qlora="int8", lora_rank=4, lora_alpha=8.0,
                           pretrained=None, wandb=False, wandb_project="x")
    _run_qlora_training(args, cfg, tcfg, _Loader(), total_steps=6,
                        steps_per_epoch=4)

    import os

    assert os.path.exists(os.path.join(out, "qlora_adapters.msgpack"))
    with open(os.path.join(out, "metrics.jsonl")) as f:
        records = [_json.loads(line) for line in f]
    losses = [r["loss"] for r in records if "loss" in r]
    assert len(losses) >= 6 and losses[-1] < losses[0]


def test_quantize_preserves_adapters(float_lm):
    """Quantizing a tree that already carries LoRA adapters keeps them
    (a float-LoRA checkpoint re-quantized for QLoRA must not silently
    lose its fine-tune)."""
    cfg, model, params, ids = float_lm
    qparams = quantize_llm_weights(params, "int8")
    qcfg = qlora_config(cfg, rank=4, mode="int8")
    lmodel = CausalLM(qcfg, dtype=jnp.float32)
    emb0 = jnp.zeros((2, 10, cfg.hidden_size), jnp.float32)
    lparams = init_qlora_from_quantized(
        lmodel, jax.random.PRNGKey(7), qparams, emb0,
        jnp.zeros((2, 10), jnp.int32),
        jnp.tril(jnp.ones((10, 10), bool))[None, None])
    # dequantize -> float tree WITH adapters; re-quantize must keep them
    requant = quantize_llm_weights(dequantize_llm_weights(lparams), "int8")
    flat = flatten_dict(requant, sep="/")
    lora_keys = [k for k in flatten_dict(lparams, sep="/")
                 if k.endswith(("/lora_a", "/lora_b"))]
    assert lora_keys and all(k in flat for k in lora_keys)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_dequantize_roundtrip(float_lm, mode):
    """dequantize(quantize(w)) reproduces w within the quantization step."""
    cfg, model, params, ids = float_lm
    deq = dequantize_llm_weights(quantize_llm_weights(params, mode))
    flat_f = flatten_dict(params, sep="/")
    flat_d = flatten_dict(deq, sep="/")
    assert set(flat_f) == set(flat_d)
    for key in flat_f:
        a, b = np.asarray(flat_f[key]), np.asarray(flat_d[key])
        assert a.shape == b.shape
        lim = (np.abs(a).max() / (7.0 if mode == "int4" else 127.0)
               if a.ndim >= 2 else 0.0)
        assert np.abs(a - b).max() <= lim + 1e-6, key
    # logits stay close through the round trip
    base = _lm_logits(model, params, ids)
    rt = _lm_logits(model, deq, ids)
    # tiny hidden sizes are not divisible by the int4 group (128), so int4
    # falls back to coarse per-channel scales — loose statistical check only
    tol = 0.5 if mode == "int4" else 0.05
    np.testing.assert_allclose(np.asarray(rt), np.asarray(base), atol=tol)
