"""End-to-end on-chip training-loop proof: ≥50 real steps with a mid-run
kill and bit-matching resume (r3 VERDICT missing #4 / next #5).

Unlike tools_train_17b.py (repeated synthetic batch, step timing), this
drives the FULL production loop on real machinery: a generated on-disk
synthetic-report dataset (NIfTI volumes + train.jsonl) read by the REAL
FusedDataset (U2Transform ingest incl. the native C++ fast path) → threaded
DataLoader → device_prefetch → jitted 1.7B LoRA train step → run_training
(MetricLogger jsonl + CheckpointManager orbax saves + auto-resume) —
the stack the reference delegates to HF Trainer
(/root/reference/src/train/train_stage1.py:376-424).

Protocol (two invocations, same RUN_DIR):
  1. KILL_AT=37 STEPS=60 python tools_train_loop_17b.py
     → trains from scratch, hard-kills itself (os._exit) right after
       logging step 37 — after the step-30 checkpoint, before the next.
  2. KILL_AT=0 STEPS=60 python tools_train_loop_17b.py
     → auto-resumes from the latest checkpoint (must be step 30: the
       kill landed between saves), finishes 60 steps, writes the loss
       curve artifact (docs/artifacts/r4/train_loop_loss.png + the raw
       metrics.jsonl copy) and prints one JSON line with resume evidence.

Dataset: N_VOLUMES synthetic CT volumes (smooth organ-ish blobs, int-range
HU values) under RUN_DIR/volumes + 64 {image, question, answer} rows with
answers from data/synthetic_reports.synthesize_report — real ingest cost,
realistic token statistics, no network or mounted data needed.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RUN_DIR = os.environ.get("RUN_DIR", "/tmp/u2_train_loop")
STEPS = int(os.environ.get("STEPS", "60"))
KILL_AT = int(os.environ.get("KILL_AT", "0"))
SAVE_STEPS = int(os.environ.get("SAVE_STEPS", "10"))
B = int(os.environ.get("TRAIN_B", "1"))
S = int(os.environ.get("TRAIN_S", "1024"))
N_VOLUMES = int(os.environ.get("N_VOLUMES", "12"))
N_SAMPLES = int(os.environ.get("N_SAMPLES", "64"))
TINY = os.environ.get("TRAIN_TINY", "0") == "1"  # CPU smoke config
ART_DIR = os.environ.get("ART_DIR", "docs/artifacts/r4")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def summarize_metrics(metrics_path: str, art_dir: str, art_prefix: str,
                      title: str, resumed_from=None):
    """Shared train-loop summary tail (17B and 8B proofs).

    MetricLogger appends across kill+resume: steps between the restored
    checkpoint and the kill point appear twice (run-1 tail + run-2
    deterministic replay). The raw jsonl is copied into ``art_dir`` as-is
    for provenance; the returned curve and the rendered loss PNG use the
    latest row per step. Returns (curve_rows, replayed_count, png_path)
    with png_path None when matplotlib is unavailable."""
    import shutil

    os.makedirs(art_dir, exist_ok=True)
    rows = [json.loads(x) for x in open(metrics_path)]
    by_step = {}
    for r in rows:
        by_step[r["step"]] = r
    curve = [by_step[k] for k in sorted(by_step)]
    replayed = len(rows) - len(curve)
    shutil.copy(metrics_path,
                os.path.join(art_dir, f"{art_prefix}_metrics.jsonl"))
    png = os.path.join(art_dir, f"{art_prefix}_loss.png")
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 3.5))
        ax.plot([r["step"] for r in curve], [r["loss"] for r in curve],
                lw=1.2)
        if resumed_from:
            ax.axvline(resumed_from, ls="--", lw=0.8, color="gray")
            ax.text(resumed_from, max(r["loss"] for r in curve),
                    f" resume @{resumed_from}", fontsize=8, color="gray")
        ax.set_xlabel("step")
        ax.set_ylabel("LM loss")
        ax.set_title(title)
        fig.tight_layout()
        fig.savefig(png, dpi=120)
    except Exception as e:
        log(f"loss-curve png skipped: {e}")
        png = None
    return curve, replayed, png


def prepare_dataset() -> str:
    """Generate volumes + train.jsonl under RUN_DIR (idempotent)."""
    from u2tokenizer_tpu.data.nifti import write_nifti
    from u2tokenizer_tpu.data.synthetic_reports import synthesize_report
    import random

    base = RUN_DIR
    vol_dir = os.path.join(base, "volumes")
    jsonl = os.path.join(base, "train.jsonl")
    marker = os.path.join(base, ".ready")
    if os.path.exists(marker):
        return base
    os.makedirs(vol_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    side = 48 if TINY else 160
    depth = 24 if TINY else 96
    log(f"dataset: generating {N_VOLUMES} volumes (~{side}^2x{depth})")
    for i in range(N_VOLUMES):
        # smooth blobby CT-like volume: low-res noise upsampled by
        # repetition + a bright ellipsoid "organ" + air border
        h = side + int(rng.integers(-8, 9))
        w = side + int(rng.integers(-8, 9))
        d = depth + int(rng.integers(-8, 9))
        lo = rng.normal(0.2, 0.15, (d // 8 + 1, h // 8 + 1, w // 8 + 1))
        vol = np.kron(lo, np.ones((8, 8, 8)))[:d, :h, :w]
        z, y, x = np.mgrid[:d, :h, :w].astype(np.float32)
        cz, cy, cx = d / 2, h / 2, w / 2
        ell = (((z - cz) / (d * 0.3)) ** 2 + ((y - cy) / (h * 0.25)) ** 2
               + ((x - cx) / (w * 0.25)) ** 2) < 1.0
        vol = vol + 0.6 * ell
        vol[:2] = vol[-2:] = 0.0  # air slabs (CropForeground has work)
        write_nifti(os.path.join(vol_dir, f"case_{i:03d}.nii"),
                    (vol * 1000.0).astype(np.float32))
    questions = [
        "Please describe the findings in this CT scan.",
        "What abnormalities are present in this volume?",
        "Generate the findings section of the radiology report.",
        "Describe this abdominal CT examination.",
    ]
    prng = random.Random(7)
    with open(jsonl, "w") as f:
        for i in range(N_SAMPLES):
            f.write(json.dumps({
                "image": f"volumes/case_{i % N_VOLUMES:03d}.nii",
                "question": questions[i % len(questions)],
                "answer": synthesize_report(prng),
            }) + "\n")
    with open(marker, "w") as f:
        f.write("ok")
    return base


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from flax.traverse_util import flatten_dict, unflatten_dict

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from u2tokenizer_tpu.config import TrainConfig, U2ModelConfig
    from u2tokenizer_tpu.data.datasets import DataLoader, FusedDataset
    from u2tokenizer_tpu.models.u2_model import U2CausalLM
    from u2tokenizer_tpu.train.lora import (LoraConfig, apply_lora,
                                            init_lora_params)
    from u2tokenizer_tpu.train.loop import MetricLogger, run_training
    from u2tokenizer_tpu.train.sft import (TrainState, chunked_lm_loss,
                                           cross_entropy_loss)
    from u2tokenizer_tpu.utils.mock_tokenizer import MockTokenizer

    base = prepare_dataset()

    cfg = U2ModelConfig.tiny() if TINY else U2ModelConfig()
    model = U2CausalLM(cfg, dtype=jnp.bfloat16, remat=True)
    d, h, w = cfg.vision.input_spatial

    tok = MockTokenizer()
    # warm the dynamic vocab single-threaded so DataLoader workers only read
    for line in open(os.path.join(base, "train.jsonl")):
        ann = json.loads(line)
        tok(ann["question"])
        tok(ann["answer"])
    ds = FusedDataset(base, "train.jsonl", tok, max_length=S,
                      image_tokens_num=cfg.proj_out_num,
                      data_type="training", num_chunks=cfg.num_chunks,
                      chunk_depth=d, target_size=h, seed=0)
    loader = DataLoader(ds, batch_size=B, shuffle=True, seed=0,
                        num_workers=2)
    qn = 64

    def data_iter(epoch):
        for batch in loader:
            batch["question_ids"] = batch["question_ids"][:, :qn]
            batch["images"] = batch["images"].astype(np.float32)
            yield batch

    # ---- 1.7B LoRA memory design (tools_train_17b.py) ----
    def trainable_path(p):
        return "u2tokenizer" in p or "mm_projector" in p

    rng = jax.random.PRNGKey(0)
    log("init: materializing params (bf16 frozen / fp32 trainable)")
    t0 = time.time()

    def init_fn(r):
        params = model.init(
            r, jnp.zeros((B, S), jnp.int32),
            jnp.zeros((B, cfg.num_chunks, d, h, w), jnp.bfloat16),
            jnp.ones((B, qn), jnp.int32))
        flat = flatten_dict(params, sep="/")
        train_flat, frozen_flat = {}, {}
        for key, val in flat.items():
            if trainable_path(key):
                train_flat[key] = val.astype(jnp.float32)
            else:
                frozen_flat[key] = (val.astype(jnp.bfloat16)
                                    if val.ndim >= 2 else val)
        return train_flat, frozen_flat

    train_flat, frozen_flat = jax.jit(init_fn)(rng)
    np.asarray(next(iter(train_flat.values())))
    log(f"init done in {time.time() - t0:.1f}s")

    lcfg = LoraConfig(r=16, alpha=32)
    lora = init_lora_params(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            unflatten_dict(frozen_flat, sep="/")),
        lcfg, jax.random.PRNGKey(2))
    lora = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                  lora)

    tcfg = TrainConfig(learning_rate=1e-4, warmup_ratio=0.1,
                       lr_schedule="cosine",
                       output_dir=os.path.join(RUN_DIR, "out"),
                       save_steps=SAVE_STEPS, log_steps=1,
                       max_steps=STEPS)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, tcfg.learning_rate, 10, max(STEPS, 20))
    tx = optax.multi_transform(
        {"lora": optax.adamw(schedule), "train": optax.adafactor(
            schedule, min_dim_size_to_factor=128)},
        {"lora": "lora", "train": "train"})

    ce_chunk = 0 if TINY else 512

    def loss_fn(wparams, frozen, batch):
        merged = dict(frozen)
        merged.update(wparams["train"])
        eff = apply_lora(unflatten_dict(merged, sep="/"), wparams["lora"],
                         lcfg)
        if ce_chunk:
            return chunked_lm_loss(model, eff, batch, ce_chunk)
        logits, _, _ = model.apply(
            eff, batch["input_ids"], batch["images"], batch["question_ids"],
            attention_mask=batch["attention_mask"])
        return cross_entropy_loss(logits, batch["labels"])

    from functools import partial

    # frozen_flat rides as a runtime ARG, not a closure capture: closing
    # over it bakes 3.6 GB of bf16 weights into the jaxpr as constants,
    # which the axon remote-compile tunnel must ship per compile (observed
    # broken-pipe at exactly this size; jax warns at lowering).
    @partial(jax.jit, donate_argnums=(0,))
    def jitted_step(state, frozen, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt),
                {"loss": loss, "token_accuracy": acc})

    def train_step(state, batch):
        return jitted_step(state, frozen_flat, batch)

    wparams = {"train": train_flat, "lora": lora}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=wparams,
                       opt_state=tx.init(wparams))

    ckpt_dir = os.path.join(tcfg.output_dir, "checkpoints")
    from u2tokenizer_tpu.train.checkpoint import CheckpointManager
    pre = CheckpointManager(ckpt_dir, save_interval_steps=SAVE_STEPS)
    resumed_from = pre.latest_step()
    pre.close()

    class KillingLogger(MetricLogger):
        """Hard-kill (preemption simulation) right after logging KILL_AT."""

        def log(self, step, metrics):
            super().log(step, metrics)
            if KILL_AT and step >= KILL_AT:
                log(f"KILL_AT={KILL_AT}: simulating preemption (os._exit)")
                os._exit(17)

    logger = KillingLogger(tcfg.output_dir)
    t0 = time.time()
    state = run_training(tcfg, state, train_step, data_iter,
                         steps_per_epoch=len(loader), logger=logger)
    wall = time.time() - t0
    final_step = int(np.asarray(state.step))

    # ---- artifacts: loss curve + raw metrics ----
    metrics_path = os.path.join(tcfg.output_dir, "metrics.jsonl")
    curve, replayed, png = summarize_metrics(
        metrics_path, ART_DIR, "train_loop",
        "1.7B LoRA SFT over the synthetic-report dataset "
        "(real DataLoader/ckpt/resume loop)", resumed_from)

    losses = [r["loss"] for r in curve]
    print(json.dumps({
        "metric": "train_loop_steps",
        "value": final_step,
        "unit": "steps",
        "detail": {
            "model": ("tiny" if TINY else "u2-qwen3-1.7b") + " LoRA r16",
            "batch": B, "seq_len": S, "ce_chunk": ce_chunk,
            "dataset": f"{N_SAMPLES} jsonl rows over {N_VOLUMES} NIfTI "
                       "volumes, real FusedDataset+DataLoader(2 workers)"
                       "+device_prefetch",
            "resumed_from_step": resumed_from,
            "replayed_steps": replayed or None,
            "kill_at": KILL_AT or None,
            "wall_s_this_run": round(wall, 1),
            "loss_first": round(losses[0], 4),
            "loss_last": round(losses[-1], 4),
            "checkpoints": sorted(
                int(p) for p in os.listdir(ckpt_dir)
                if p.isdigit()) if os.path.isdir(ckpt_dir) else [],
            "loss_curve": png,
        },
    }))


if __name__ == "__main__":
    main()
