"""Quantization-quality report: the validation gate for quantized serving.

BENCHMARKS.md records int4 weights + int4 KV at 313 reports/min/chip vs the
int8-weight default's 284 — the int4w config is kept NON-default "pending
real-weight error validation". This module is that validation: given a
checkpoint (converted native dir, HF layout, or freshly-initialized), it
produces

  * a per-layer weight round-trip report — SNR (dB) and max scaled error of
    ``quantize_llm_weights`` → ``dequantize_llm_weights`` per decoder
    kernel, computed one leaf at a time so an 8B tree never holds a second
    float copy;
  * a teacher-forced forward comparison — top-1/top-5 agreement, mean KL,
    and max scaled logit error between the float model and its quantized
    variant on shared multimodal batches;
  * an optional greedy-decode agreement — first-divergence step and token
    match fraction over n new tokens.

The reference serves 4/8-bit via bitsandbytes with no quality gate at all
(``src/demo/online_demo.py:20-269``); this is the TPU-native equivalent plus
the missing error report. Exposed as ``cli quant-report``.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.quantize import (_dequantize_tree, _quantize_tree,
                               quantize_llm_weights, quantized_llm_config)


def trace_rss(tag: str) -> None:
    """Stderr breadcrumb (peak + current RSS) between report legs, enabled
    by ``U2_QR_TRACE=1``. The r5 rehearsal's full-geometry quant stage was
    OOM-killed at 130 GB anon RSS with no indication of which leg — this
    makes the next failure self-localizing."""
    if os.environ.get("U2_QR_TRACE") != "1":
        return
    hwm = cur = "?"
    try:
        for line in open("/proc/self/status"):
            if line.startswith("VmHWM"):
                hwm = f"{int(line.split()[1]) / 1e6:.1f}"
            elif line.startswith("VmRSS"):
                cur = f"{int(line.split()[1]) / 1e6:.1f}"
    except OSError:
        pass
    print(f"[quant-report rss] {tag}: rss_gb={cur} peak_gb={hwm}",
          file=sys.stderr, flush=True)


def _roundtrip_kernel(key: str, val, mode: str):
    """Quantize one named leaf exactly as the full-tree transform would
    (lm_head / embed_tokens special-casing included) and fold it back to
    float. Returns the reconstructed array or None if the leaf would pass
    through unquantized."""
    if key == "embed_tokens":
        sub = _dequantize_tree(_quantize_tree({key: val}, mode))
        return sub[key]
    sub = _dequantize_tree(_quantize_tree({key: {"kernel": val}}, mode))
    out = sub[key]["kernel"]
    return None if jnp.issubdtype(out.dtype, jnp.integer) else out


def _iter_kernels(node: Dict[str, Any], prefix: str = ""):
    for key, val in sorted(node.items()):
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(val, dict):
            if "kernel" in val and not isinstance(val["kernel"], dict) \
                    and getattr(val["kernel"], "ndim", 0) == 2:
                yield path, key, val["kernel"]
            else:
                yield from _iter_kernels(val, path)
        elif key == "embed_tokens" and getattr(val, "ndim", 0) == 2:
            yield path, key, val


def layer_quant_report(params, mode: str = "int8") -> Dict[str, Any]:
    """Per-layer weight round-trip error for the decoder subtree.

    SNR(dB) = 10·log10(Σw² / Σ(w−ŵ)²); ``max_scaled_err`` is the worst
    |w−ŵ| normalized by that kernel's absolute max. One leaf is quantized
    at a time — peak extra memory is a single kernel's float copy.
    """
    inner = params["params"]
    tree = inner.get("llm", inner)
    layers, snrs = {}, []
    for path, key, kernel in _iter_kernels(tree, "llm" if "llm" in inner
                                           else ""):
        recon = _roundtrip_kernel(key, kernel, mode)
        if recon is None:
            continue
        # float32 arrays with float64 accumulation (einsum dtype): the
        # quant errors being measured (~1e-2..1e-4 of scale) dwarf f32
        # rounding, and f64 copies of the 152k-vocab embed cost 2.5 GB
        # each — three of them at once was a real chunk of the rehearsal
        # OOM headroom
        w = np.asarray(kernel, np.float32)
        err = w - np.asarray(recon, np.float32)
        wf, ef = w.ravel(), err.ravel()
        p_sig = float(np.einsum("i,i->", wf, wf, dtype=np.float64))
        p_err = float(np.einsum("i,i->", ef, ef, dtype=np.float64))
        snr = 10.0 * np.log10(p_sig / p_err) if p_err > 0 else float("inf")
        scale = max(float(np.abs(w).max()), 1e-12)
        layers[path] = {
            "shape": list(kernel.shape),
            "snr_db": round(snr, 2),
            "max_scaled_err": round(float(np.abs(err).max() / scale), 6),
        }
        snrs.append(snr)
    finite = [s for s in snrs if np.isfinite(s)]
    return {
        "mode": mode,
        "num_layers": len(layers),
        "snr_db_min": round(min(finite), 2) if finite else None,
        "snr_db_mean": round(float(np.mean(finite)), 2) if finite else None,
        "layers": layers,
    }


def _make_forward_fn(model):
    """One jitted teacher-forced forward returning device logits. The
    r5 rehearsal's full-geometry quant stage (unjitted eager apply, host
    float32 logit copies, host argsort over the 152k vocab) was OOM-killed
    at 130 GB host RSS — everything here stays a single compiled
    executable with device-resident intermediates."""
    @jax.jit
    def fwd(params, input_ids, images, question_ids, attention_mask):
        logits, _, _ = model.apply(params, input_ids, images, question_ids,
                                   attention_mask=attention_mask)
        return logits
    return fwd


@jax.jit
def _logit_agreement_metrics(lf, lq):
    """Device-side scalar reduction of two [B,S,V] logit sets: top-1
    match, float-top-5-contains-quant-top-1, mean fp32 KL(float‖quant),
    max |Δlogit| scaled by the float set's absolute max."""
    lf = lf.astype(jnp.float32)
    lq = lq.astype(jnp.float32)
    af, aq = lf.argmax(-1), lq.argmax(-1)
    k = min(5, lf.shape[-1])
    _, tf5 = jax.lax.top_k(lf, k)
    pf = jax.nn.log_softmax(lf, axis=-1)
    pq = jax.nn.log_softmax(lq, axis=-1)
    return {
        "top1": jnp.mean(af == aq),
        "top5": jnp.mean((tf5 == aq[..., None]).any(-1)),
        "kl": jnp.mean(jnp.sum(jnp.exp(pf) * (pf - pq), axis=-1)),
        "max_err": jnp.abs(lf - lq).max()
                   / jnp.maximum(1.0, jnp.abs(lf).max()),
    }


def forward_agreement(cfg, params, batches: List[Dict[str, Any]],
                      mode: str = "int8",
                      dtype=jnp.bfloat16, qparams=None) -> Dict[str, Any]:
    """Teacher-forced logit agreement between the float model and its
    ``mode``-quantized variant on shared batches (multimodal: ids + CT
    volume + question ids). Positions are compared over the full sequence;
    KL uses fp32 softmax of both logit sets. Pass a precomputed
    ``qparams`` to share one quantized tree with ``greedy_agreement``."""
    from ..models.u2_model import U2CausalLM

    fmodel = U2CausalLM(cfg, dtype=dtype)
    qmodel = U2CausalLM(quantized_llm_config(cfg, mode), dtype=dtype)
    if qparams is None:
        qparams = jax.jit(quantize_llm_weights,
                          static_argnums=1)(params, mode)
    ffwd, qfwd = _make_forward_fn(fmodel), _make_forward_fn(qmodel)

    top1, top5, kls, max_errs = [], [], [], []
    for i, batch in enumerate(batches):
        args = (batch["input_ids"], batch["images"], batch["question_ids"],
                batch.get("attention_mask"))
        m = jax.device_get(_logit_agreement_metrics(
            ffwd(params, *args), qfwd(qparams, *args)))
        trace_rss(f"forward[{mode}] batch {i}")
        top1.append(float(m["top1"]))
        top5.append(float(m["top5"]))
        kls.append(float(m["kl"]))
        max_errs.append(float(m["max_err"]))
    return {
        "mode": mode,
        "num_batches": len(batches),
        "top1_match": round(float(np.mean(top1)), 4),
        "float_top5_contains_q_top1": round(float(np.mean(top5)), 4),
        "mean_kl": round(float(np.mean(kls)), 6),
        "max_scaled_logit_err": round(float(np.max(max_errs)), 6),
    }


def greedy_agreement(cfg, params, batch: Dict[str, Any],
                     mode: str = "int8", max_new_tokens: int = 32,
                     dtype=jnp.bfloat16, qparams=None) -> Dict[str, Any]:
    """Greedy-decode both stacks from the same multimodal prompt; report
    the first step where the argmax token diverges and the match fraction.
    Each stack feeds its OWN argmax back (true serving behavior, not
    teacher-forced), so one early flip can cascade — first_divergence is
    the honest number, match_fraction the color. Pass a precomputed
    ``qparams`` to share one quantized tree with ``forward_agreement``."""
    from ..config import GenerationConfig
    from ..models.generate import make_multimodal_generate_fn
    from ..models.u2_model import U2CausalLM

    gen = GenerationConfig(max_new_tokens=max_new_tokens, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    fmodel = U2CausalLM(cfg, dtype=dtype)
    qmodel = U2CausalLM(quantized_llm_config(cfg, mode), dtype=dtype)
    if qparams is None:
        qparams = jax.jit(quantize_llm_weights,
                          static_argnums=1)(params, mode)

    plen = jnp.asarray([int(batch["attention_mask"].sum(-1)[0])]
                       if batch.get("attention_mask") is not None
                       else [batch["input_ids"].shape[1]], jnp.int32)
    rng = jax.random.PRNGKey(0)
    args = (batch["input_ids"][:1], batch["images"][:1],
            batch["question_ids"][:1], plen, rng)
    tf = np.asarray(make_multimodal_generate_fn(fmodel, gen)(params, *args))
    tq = np.asarray(make_multimodal_generate_fn(qmodel, gen)(qparams, *args))
    n = min(tf.shape[-1], tq.shape[-1])
    same = tf[0, :n] == tq[0, :n]
    div = int(np.argmin(same)) if not same.all() else -1
    return {
        "mode": mode,
        "new_tokens": int(n),
        "first_divergence": div,
        "match_fraction": round(float(same.mean()), 4),
    }


def synthetic_batches(cfg, num_batches: int = 2, batch: int = 1,
                      seq_extra: int = 16, seed: int = 0):
    """Deterministic multimodal probe batches at the checkpoint's geometry
    (used when no dataset is mounted; real batches give the meaningful
    verdict — pass them through ``cli quant-report --jsonl/--base-path``)."""
    rng = np.random.default_rng(seed)
    d, h, w = cfg.vision.input_spatial
    s = cfg.proj_out_num + seq_extra
    out = []
    for _ in range(num_batches):
        out.append({
            "input_ids": jnp.asarray(rng.integers(
                0, cfg.llm.vocab_size, (batch, s)), jnp.int32),
            "images": jnp.asarray(rng.normal(
                size=(batch, cfg.num_chunks, d, h, w)) * 0.5, jnp.float32),
            "question_ids": jnp.asarray(rng.integers(
                0, cfg.llm.vocab_size, (batch, 8)), jnp.int32),
            "attention_mask": jnp.ones((batch, s), jnp.int32),
        })
    return out


# ---------------------------------------------------------------------------
# go/no-go decision (REALWEIGHTS_RUNBOOK.md §2b — r4 VERDICT next #5)
# ---------------------------------------------------------------------------

# Numeric thresholds for the serving-precision decision. int8 is the sanity
# gate: per-channel symmetric int8 should be essentially transparent on a
# healthy conversion — a failure means investigate the CONVERSION, not the
# quantizer. int4 (group-128) is the flip-to-default gate: pass -> the bench
# and serving defaults flip to int4 weights (~+10% reports/min/chip,
# BENCHMARKS.md int4w rows). SNR floors reflect the measured round-trip
# envelope (int8 per-channel ~35-48 dB, int4 group-128 ~20-26 dB on
# gaussian-ish kernels); agreement thresholds are the runbook's rule of
# thumb made exact.
DECISION_THRESHOLDS: Dict[str, Dict[str, float]] = {
    "int8": {"snr_db_min": 30.0, "top1_match_min": 0.99,
             "mean_kl_max": 1e-3, "greedy_match_min": 0.99},
    "int4": {"snr_db_min": 18.0, "top1_match_min": 0.97,
             "mean_kl_max": 1e-2, "greedy_match_min": 0.95},
}


def decide(entry: Dict[str, Any], mode: str,
           decision_grade: bool = True) -> Dict[str, Any]:
    """Apply DECISION_THRESHOLDS to one quant-report mode entry.

    Returns {"pass": bool|None, "checks": {...}, "complete": bool,
    "decision_grade": bool}. ``pass`` is None when no check could be
    evaluated (weights-only run with no forward/greedy sections), and is
    never True unless ALL four checks were evaluable AND passed — a
    weights-only run must not produce a go verdict from the SNR check
    alone (``complete=False`` names the missing checks in ``note``).
    ``decision_grade=False`` marks runs on synthetic/random weights: the
    machinery is exercised but only a real checkpoint's verdict may flip
    a default."""
    th = DECISION_THRESHOLDS.get(mode)
    if th is None:
        return {"pass": None, "checks": {},
                "note": f"no thresholds defined for mode {mode!r}"}
    checks: Dict[str, Any] = {}

    def check(name, value, bound, larger_is_better):
        if value is None:
            return
        ok = value >= bound if larger_is_better else value <= bound
        checks[name] = {"value": value, "threshold": bound,
                        "ok": bool(ok)}

    w = entry.get("weights") or {}
    check("snr_db_min", w.get("snr_db_min"), th["snr_db_min"], True)
    f = entry.get("forward") or {}
    check("top1_match", f.get("top1_match"), th["top1_match_min"], True)
    check("mean_kl", f.get("mean_kl"), th["mean_kl_max"], False)
    g = entry.get("greedy") or {}
    check("greedy_match_fraction", g.get("match_fraction"),
          th["greedy_match_min"], True)
    required = ("snr_db_min", "top1_match", "mean_kl",
                "greedy_match_fraction")
    missing = [n for n in required if n not in checks]
    complete = not missing
    if not checks:
        ok = None
    elif any(not c["ok"] for c in checks.values()):
        ok = False
    else:
        # every evaluated check passed — but "go" needs the full battery
        ok = True if complete else None
    out = {"pass": ok, "checks": checks, "complete": complete,
           "decision_grade": decision_grade}
    if missing and checks:
        out["note"] = ("incomplete battery — not evaluated: "
                       + ", ".join(missing)
                       + "; a go verdict needs all four checks "
                         "(re-run without --weights-only / with "
                         "--greedy-tokens)")
    if not decision_grade:
        # append rather than replace: a rehearsal --weights-only run must
        # still name the checks that were never evaluated
        grade_note = ("random/synthetic weights: thresholds exercised but "
                      "NOT decision-grade — re-run on a real checkpoint")
        out["note"] = (out["note"] + " | " + grade_note
                       if "note" in out else grade_note)
    return out
