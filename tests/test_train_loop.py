"""Checkpoint save/restore/auto-resume + composed run_training loop.

The one subsystem where a silent bug costs a whole training run: save at
step k, start a fresh manager (simulating a killed process), restore, and
continue — asserting the step counter and parameters carry over exactly and
the loss trajectory continues downward. Mirrors HF Trainer resume semantics
(src/train/train_stage1.py:125-127 save_strategy/save_steps/save_total_limit).
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import TrainConfig, U2ModelConfig
from u2tokenizer_tpu.models.u2_model import U2CausalLM
from u2tokenizer_tpu.train.checkpoint import CheckpointManager
from u2tokenizer_tpu.train.loop import (MetricLogger, evaluate_token_accuracy,
                                        run_training)
from u2tokenizer_tpu.train.sft import (IGNORE_INDEX, TrainState,
                                       init_train_state, make_loss_fn,
                                       make_optimizer, make_train_step)


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    tcfg = TrainConfig(learning_rate=1e-3, warmup_ratio=0.0,
                       lr_schedule="constant")
    tx = make_optimizer(tcfg, total_steps=100)
    rng = jax.random.PRNGKey(0)
    b, s = 2, 16
    labels = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                cfg.llm.vocab_size)
    batch = {
        "input_ids": jnp.zeros((b, s), jnp.int32),
        "question_ids": jnp.ones((b, 4), jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": labels.at[:, :4].set(IGNORE_INDEX),
    }
    state = init_train_state(model, tx, rng, batch)
    train_step = jax.jit(make_train_step(model, tx))
    return model, tx, state, train_step, batch


def test_checkpoint_save_restore_roundtrip(tiny_trainer, tmp_path):
    model, tx, state, train_step, batch = tiny_trainer
    for _ in range(3):
        state, _ = train_step(state, batch)
    ckpt = CheckpointManager(str(tmp_path / "ck"), save_interval_steps=1)
    assert ckpt.latest_step() is None
    assert ckpt.restore(state) is None  # empty dir -> no resume
    ckpt.save(3, state, force=True)
    ckpt.close()

    # fresh manager = simulated process restart
    ckpt2 = CheckpointManager(str(tmp_path / "ck"), save_interval_steps=1)
    assert ckpt2.latest_step() == 3
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = ckpt2.restore(template)
    ckpt2.close()
    assert int(np.asarray(restored.step)) == 3
    orig = jax.tree_util.tree_leaves(state.params)
    back = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restores too (momenta are step-dependent)
    o1 = jax.tree_util.tree_leaves(state.opt_state)
    o2 = jax.tree_util.tree_leaves(restored.opt_state)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _read_metrics(output_dir):
    with open(os.path.join(output_dir, "metrics.jsonl")) as f:
        return [json.loads(line) for line in f]


def test_run_training_and_auto_resume(tiny_trainer, tmp_path):
    model, tx, state0, train_step, batch = tiny_trainer
    out = str(tmp_path / "run")
    tcfg = TrainConfig(max_steps=3, save_steps=1, log_steps=1,
                       save_total_limit=5, output_dir=out)

    def data_iter_fn(epoch):
        return [batch] * 4

    eval_calls = []

    def eval_fn(state):
        m = evaluate_token_accuracy(model, make_loss_fn(model), state, [batch])
        eval_calls.append(m)
        return m

    state = run_training(tcfg, state0, train_step, data_iter_fn,
                         eval_fn=eval_fn, eval_steps=2)
    assert int(np.asarray(state.step)) == 3
    assert len(eval_calls) == 1  # step 2 only
    records = _read_metrics(out)
    losses = [r["loss"] for r in records if "loss" in r and "eval_loss" not in r]
    assert len(losses) == 3
    assert losses[-1] < losses[0]  # fixed batch -> loss decreases

    # resume: same output dir, higher step budget; must restart from step 3
    tcfg2 = dataclasses.replace(tcfg, max_steps=5)
    state2 = run_training(tcfg2, state0, train_step, data_iter_fn)
    assert int(np.asarray(state2.step)) == 5
    records = _read_metrics(out)
    steps = [r["step"] for r in records if "steps_per_s" in r]
    # continuation logged steps 4 and 5, never re-ran 1-3
    assert steps[-2:] == [4, 5]
    assert steps.count(1) == 1 and steps.count(2) == 1
    # trajectory continues downward across the restart boundary
    by_step = {r["step"]: r["loss"] for r in records if "steps_per_s" in r}
    assert by_step[5] < by_step[3] < by_step[1]


def test_run_training_resume_skips_consumed_batches(tiny_trainer, tmp_path):
    """Mid-epoch resume must fast-forward the data stream past the batches
    the killed run already consumed (HF Trainer resume semantics,
    ignore_data_skip=False) — otherwise a resumed epoch re-trains its head
    and never sees its tail."""
    model, tx, state0, train_step, batch = tiny_trainer
    out = str(tmp_path / "runskip")
    tcfg = TrainConfig(max_steps=3, save_steps=1, log_steps=1,
                       save_total_limit=8, output_dir=out)

    consumed = []

    def data_iter_fn(epoch):
        def gen():
            for i in range(4):
                consumed.append((epoch, i))
                yield batch
        return gen()

    run_training(tcfg, state0, train_step, data_iter_fn, steps_per_epoch=4)
    # 3 trained batches (+ device_prefetch lookahead is allowed)
    assert consumed[:3] == [(0, 0), (0, 1), (0, 2)]

    consumed.clear()
    tcfg2 = dataclasses.replace(tcfg, max_steps=5)
    state2 = run_training(tcfg2, state0, train_step, data_iter_fn,
                          steps_per_epoch=4)
    assert int(np.asarray(state2.step)) == 5
    # the resumed run materializes (0,0..2) to skip them, trains on (0,3)
    # as step 4, then starts epoch 1 with (1,0) as step 5
    assert consumed[:4] == [(0, 0), (0, 1), (0, 2), (0, 3)]
    assert (1, 0) in consumed
    records = _read_metrics(out)
    steps = [r["step"] for r in records if "steps_per_s" in r]
    assert steps.count(4) == 1 and steps.count(5) == 1


def test_run_training_through_threaded_dataloader(tiny_trainer, tmp_path):
    """SFT smoke at the cli.py wiring: run_training consumes a threaded
    DataLoader (num_workers=4) for >8 batches — the configuration that
    deadlocked with the old whole-batch-task loader. Watchdog-bounded."""
    import threading

    from u2tokenizer_tpu.data.datasets import DataLoader

    model, tx, state0, train_step, batch = tiny_trainer
    out = str(tmp_path / "dl_run")
    tcfg = TrainConfig(max_steps=12, save_steps=100, log_steps=100,
                       output_dir=out)

    class _BatchDataset:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            return {k: np.asarray(v[0]) for k, v in batch.items()}

    loader = DataLoader(_BatchDataset(), batch_size=2, shuffle=False,
                        num_workers=4,
                        collate_fn=lambda items: {
                            k: np.stack([s[k] for s in items])
                            for k in items[0]})
    out_state = {}

    def run():
        out_state["state"] = run_training(
            tcfg, state0, train_step, lambda epoch: iter(loader))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(120)
    assert not t.is_alive(), "run_training stalled on the threaded DataLoader"
    assert int(np.asarray(out_state["state"].step)) == 12


def test_run_training_epoch_bounded(tiny_trainer, tmp_path):
    model, tx, state0, train_step, batch = tiny_trainer
    out = str(tmp_path / "epochs")
    tcfg = TrainConfig(max_steps=None, num_epochs=2.0, save_steps=100,
                       log_steps=1, output_dir=out)
    state = run_training(tcfg, state0, train_step,
                         lambda epoch: [batch] * 2,
                         steps_per_epoch=2)
    assert int(np.asarray(state.step)) == 4


def test_async_checkpoint_overlap_and_isolation(tiny_trainer, tmp_path):
    """Async saves: back-to-back saves don't corrupt each other, the saved
    snapshot is isolated from post-save training, and a restart sees the
    newest step."""
    model, tx, state, train_step, batch = tiny_trainer
    ckpt = CheckpointManager(str(tmp_path / "ack"), save_interval_steps=1,
                             async_save=True)
    state1, _ = train_step(state, batch)
    ckpt.save(1, state1)           # returns before IO completes
    state2, _ = train_step(state1, batch)  # keep training immediately
    ckpt.save(2, state2)
    ckpt.close()

    ckpt2 = CheckpointManager(str(tmp_path / "ack"), save_interval_steps=1)
    assert ckpt2.latest_step() == 2
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    r1 = ckpt2.restore(template, step=1)
    r2 = ckpt2.restore(template, step=2)
    ckpt2.close()
    # step-1 snapshot must hold step-1 values, untouched by later training
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(r1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert int(np.asarray(r2.step)) == 2


@pytest.mark.parametrize("policy", [True, "dots_no_batch", "dots"])
def test_remat_policies_train_and_match(policy):
    """Every remat policy produces the same loss/gradients as no remat —
    checkpointing changes memory/recompute, never math."""
    cfg = U2ModelConfig.tiny()
    rng = jax.random.PRNGKey(0)
    b, s = 2, 16
    batch = {
        "input_ids": jnp.zeros((b, s), jnp.int32),
        "question_ids": jnp.ones((b, 4), jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                     cfg.llm.vocab_size),
    }

    def loss_and_grad(remat):
        model = U2CausalLM(cfg, dtype=jnp.float32, remat=remat)
        params = model.init(rng, batch["input_ids"],
                            jnp.zeros((b, cfg.num_chunks,
                                       *cfg.vision.input_spatial)),
                            batch["question_ids"])
        fn = make_loss_fn(model)

        def scalar(p):
            return fn(p, batch)[0]

        l, g = jax.value_and_grad(scalar)(params)
        return l, g

    l_ref, g_ref = loss_and_grad(False)
    l_pol, g_pol = loss_and_grad(policy)
    np.testing.assert_allclose(float(l_pol), float(l_ref), rtol=1e-6)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_p = jax.tree_util.tree_leaves(g_pol)
    for a, c in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("chunk", [5, 8, 16])
def test_chunked_ce_matches_plain(chunk):
    """ce_chunk>0 gives the same loss, token accuracy, AND gradients as
    the full-logits loss (up to summation order) — incl. a chunk that
    does not divide S-1 (padding path) and one that exceeds it."""
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    b, s = 2, 16
    images = jax.random.normal(rng, (b, cfg.num_chunks,
                                     *cfg.vision.input_spatial))
    labels = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                cfg.llm.vocab_size)
    batch = {
        "input_ids": jnp.zeros((b, s), jnp.int32),
        "images": images,
        "question_ids": jnp.ones((b, 4), jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": labels.at[:, :4].set(IGNORE_INDEX),
    }
    params = model.init(rng, batch["input_ids"], images,
                        batch["question_ids"])

    def run(ce_chunk):
        fn = make_loss_fn(model, ce_chunk)
        (loss, aux), grads = jax.value_and_grad(fn, has_aux=True)(
            params, batch)
        return loss, aux, grads

    l0, a0, g0 = run(0)
    lc, ac, gc = run(chunk)
    np.testing.assert_allclose(float(lc), float(l0), rtol=1e-6)
    np.testing.assert_allclose(float(ac["token_accuracy"]),
                               float(a0["token_accuracy"]), rtol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(gc)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)
