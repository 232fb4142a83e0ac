"""Real-weights day rehearsal (r3 VERDICT next #7): exercise the whole
released-checkpoint path at FULL μ²Qwen3-1.7B geometry with a fake
checkpoint — random weights, real 151936-vocab shapes, the released
trust_remote_code layout — and record wall-clock + peak host RSS per stage
(the reference needs ≈39 GB host RAM to load: /root/reference/README.md:63).

Stages (each its own process — REH_STAGE=emit|convert|verify|serve|report;
driven end-to-end by tools_rehearse_real_weights.sh, runbook in
docs/REALWEIGHTS_RUNBOOK.md):

  emit     build the fake checkpoint with save_trust_remote_code_package
           (CPU jax init of the full tree; REH_FLAVOR=rpe re-emits with the
           enable_rpe config flavor the released u2Tokenizer.py:397 uses).
  convert  cli convert-checkpoint -> u2_params.msgpack + u2_config.json.
  verify   cli verify-checkpoint: greedy-parity gate vs the checkpoint's
           OWN remote-code torch module (CPU) — the drift detector that
           makes day one mechanical.
  serve    on-chip smoke: load the converted msgpack, int8-quantize,
           one B4x32-token multimodal generate on the real TPU.
  report   one JSON line combining the per-stage state.

Day-one delta: point --hf-dir at the downloaded μ²Qwen3-1.7B/8B directory
instead of the emitted fake — every other command is identical.
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import time

STAGE = os.environ.get("REH_STAGE", "report")
CKPT = os.environ.get("REH_CKPT", "/tmp/u2_fake_ckpt")
OUT = os.environ.get("REH_OUT", "/tmp/u2_fake_converted")
STATE = os.environ.get("REH_STATE", "/tmp/u2_rehearsal_state.json")
FLAVOR = os.environ.get("REH_FLAVOR", "default")  # default | rpe
TINY = os.environ.get("REH_TINY", "0") == "1"  # CPU smoke of the stages


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _save(key: str, value) -> None:
    state = {}
    if os.path.exists(STATE):
        state = json.load(open(STATE))
    state[key] = value
    with open(STATE, "w") as f:
        json.dump(state, f)


def _finish(stage: str, t0: float, extra=None) -> None:
    wall = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    child_gb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    rec = {"wall_s": round(wall, 1),
           "peak_host_rss_gb": round(max(rss_gb, child_gb), 2)}
    if extra:
        rec.update(extra)
    log(f"{stage}: {rec}")
    _save(stage, rec)


def stage_emit():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # host-side emission
    from u2tokenizer_tpu.config import U2ModelConfig
    from u2tokenizer_tpu.models.remote_code import (
        save_trust_remote_code_package)
    from u2tokenizer_tpu.models.u2_model import U2CausalLM

    t0 = time.time()
    cfg = U2ModelConfig.tiny() if TINY else U2ModelConfig()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    d, h, w = cfg.vision.input_spatial
    rng = jax.random.PRNGKey(0)
    log(f"emit: initializing full {'tiny' if TINY else '1.7B'} tree on CPU")
    params = jax.jit(lambda r: model.init(
        r, jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, cfg.num_chunks, d, h, w), jnp.float32),
        jnp.ones((1, 4), jnp.int32)))(rng)
    extra = {"enable_rpe": True} if FLAVOR == "rpe" else None
    save_trust_remote_code_package(CKPT, params, cfg, extra_config=extra)
    size = sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(CKPT) for f in fs)
    _finish("emit", t0, {"checkpoint_gb": round(size / 1e9, 2),
                         "flavor": FLAVOR, "path": CKPT})


def _run_cli(argv) -> str:
    """Run a cli command in a subprocess (its RSS lands in
    RUSAGE_CHILDREN); returns the last stdout line."""
    proc = subprocess.run(
        [sys.executable, "-m", "u2tokenizer_tpu.cli"] + argv,
        capture_output=True, text=True)
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:])
        raise SystemExit(f"cli {argv[0]} failed rc={proc.returncode}")
    return proc.stdout.strip().splitlines()[-1]


def stage_convert():
    t0 = time.time()
    nc = "2" if TINY else "8"
    out = _run_cli(["convert-checkpoint", "--hf-dir", CKPT,
                    "--output", OUT, "--num-chunks", nc])
    _finish("convert", t0, json.loads(out))


def stage_verify():
    t0 = time.time()
    nc = "2" if TINY else "8"
    out = _run_cli(["verify-checkpoint", "--hf-dir", CKPT,
                    "--num-chunks", nc, "--greedy-tokens",
                    "2" if not TINY else "4"])
    _finish("verify", t0, json.loads(out))


def stage_quant():
    """Quantization-quality gate on the converted checkpoint (r4 VERDICT
    next #5): cli quant-report at full 151936-vocab geometry, int8 + int4,
    including the greedy leg — the go/no-go machinery that flips the
    serving default to int4 weights on real-weights day. On the fake
    checkpoint the verdict is flagged non-decision-grade (--rehearsal);
    set REH_DECISION_GRADE=1 when REH_CKPT points at real weights."""
    t0 = time.time()
    # one cli subprocess per mode: the int8+int4 combined run was
    # OOM-killed at full geometry (130 GB anon RSS) — per-mode processes
    # reset host RSS between modes and U2_QR_TRACE localizes any repeat
    os.environ["U2_QR_TRACE"] = "1"
    # per-mode sub-stage resume: each mode is ~1h at full geometry, so a
    # timeout mid-int4 must not force the finished int8 leg to repeat
    prior = {}
    if os.path.exists(STATE):
        prior = json.load(open(STATE))
    out = {}
    for mode in ("int8", "int4"):
        sub = f"quant_{mode}"
        if sub in prior:
            log(f"quant: {sub} already recorded, skipping")
            out.update(prior[sub])
            continue
        argv = ["quant-report", "--checkpoint", OUT, "--modes", mode,
                "--greedy-tokens", "4" if TINY else "32",
                "--platform", "cpu" if TINY else "default"]
        if TINY:
            argv += ["--tiny"]
        if os.environ.get("REH_DECISION_GRADE") != "1":
            argv += ["--rehearsal"]
        mode_out = json.loads(_run_cli(argv))
        _save(sub, mode_out)
        out.update(mode_out)
    summary = {}
    for mode in ("int8", "int4"):
        if mode in out:
            e = out[mode]
            summary[mode] = {
                "snr_db_min": e["weights"].get("snr_db_min"),
                "top1_match": (e.get("forward") or {}).get("top1_match"),
                "mean_kl": (e.get("forward") or {}).get("mean_kl"),
                "greedy_match": (e.get("greedy") or {}).get(
                    "match_fraction"),
                "decision": e.get("decision"),
            }
    _finish("quant", t0, summary)


def stage_serve():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if TINY:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    from flax import serialization

    from u2tokenizer_tpu.config import GenerationConfig, U2ModelConfig
    from u2tokenizer_tpu.models.generate import make_multimodal_generate_fn
    from u2tokenizer_tpu.models.quantize import (cast_for_inference,
                                                 quantize_llm_weights,
                                                 quantized_llm_config)
    from u2tokenizer_tpu.models.u2_model import U2CausalLM

    t0 = time.time()
    cfg = U2ModelConfig.from_dict(
        json.load(open(os.path.join(OUT, "u2_config.json"))))
    with open(os.path.join(OUT, "u2_params.msgpack"), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    log(f"serve: converted params loaded in {time.time() - t0:.1f}s")
    wq = os.environ.get("REH_WQ", "int8")  # int8 | int4 serving weights
    params = jax.device_put(params)
    params = jax.jit(cast_for_inference, donate_argnums=0)(params)
    params = jax.jit(lambda p: quantize_llm_weights(p, wq),
                     donate_argnums=0)(params)
    model = U2CausalLM(quantized_llm_config(cfg, wq), dtype=jnp.bfloat16)
    b, s, new = (2, 16, 4) if TINY else (4, 256, 32)
    d, h, w = cfg.vision.input_spatial
    gen_fn = jax.jit(make_multimodal_generate_fn(
        model, GenerationConfig(max_new_tokens=new, do_sample=False,
                                eos_token_id=-2, pad_token_id=0),
        cache_dtype="int4", jit=False))
    toks = gen_fn(params, jnp.ones((b, s), jnp.int32),
                  jax.random.normal(jax.random.PRNGKey(1),
                                    (b, cfg.num_chunks, d, h, w)) * 0.1,
                  jnp.ones((b, 16), jnp.int32),
                  jnp.full((b,), s, jnp.int32), jax.random.PRNGKey(2))
    toks = np.asarray(toks)
    key = "serve" if wq == "int8" else f"serve_{wq}"
    _finish(key, t0, {"batch": b, "new_tokens": int(toks.shape[-1]),
                      "weights": wq, "device": str(jax.devices()[0])})


def report():
    state = json.load(open(STATE)) if os.path.exists(STATE) else {}
    missing = {"emit", "convert", "verify", "serve"} - set(state)
    if missing:
        print(json.dumps({"error": f"missing stages: {sorted(missing)}",
                          "state": state}))
        sys.exit(1)
    total = sum(v["wall_s"] for v in state.values()
                if isinstance(v, dict) and "wall_s" in v)
    print(json.dumps({
        "metric": "realweights_rehearsal_wall_s",
        "value": round(total, 1),
        "unit": "s",
        "detail": {
            "peak_host_rss_gb": max(s.get("peak_host_rss_gb", 0)
                                    for s in state.values()),
            "reference_load_ram_gb": 39,
            **state,
        },
    }))


def main():
    t0 = time.time()
    if STAGE == "emit":
        stage_emit()
    elif STAGE == "convert":
        stage_convert()
    elif STAGE == "verify":
        stage_verify()
    elif STAGE == "quant":
        stage_quant()
    elif STAGE == "serve":
        stage_serve()
    else:
        report()
        return
    log(f"stage {STAGE} done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
