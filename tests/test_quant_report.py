"""Quantization-quality report (eval/quant_report.py): the int4-default
gate machinery. The report must (a) reproduce the exact round-trip error of
the serving transform per layer — int8 per-channel strictly cleaner than
grouped int4, both finite and nontrivial on random weights; (b) compare the
float and quantized stacks on identical multimodal batches with sane metric
ranges; (c) run end-to-end through the CLI surface on the tiny config."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import U2ModelConfig
from u2tokenizer_tpu.eval.quant_report import (forward_agreement,
                                               greedy_agreement,
                                               layer_quant_report,
                                               synthetic_batches)
from u2tokenizer_tpu.models.quantize import (dequantize_llm_weights,
                                             quantize_llm_weights)
from u2tokenizer_tpu.models.u2_model import U2CausalLM


@pytest.fixture(scope="module")
def tiny_model_params():
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    batches = synthetic_batches(cfg, num_batches=2, seq_extra=12)
    b = batches[0]
    params = model.init(jax.random.PRNGKey(0), b["input_ids"], b["images"],
                        b["question_ids"])
    return cfg, params, batches


def test_layer_report_int8_cleaner_than_int4(tiny_model_params):
    _, params, _ = tiny_model_params
    r8 = layer_quant_report(params, "int8")
    r4 = layer_quant_report(params, "int4")
    assert r8["num_layers"] == r4["num_layers"] > 0
    # random uniform-ish weights: per-channel int8 lands ~40+ dB, grouped
    # int4 ~20+ dB; the ordering is the physics, the floors are sanity
    assert r8["snr_db_min"] > r4["snr_db_min"]
    assert r8["snr_db_min"] > 30.0
    assert r4["snr_db_min"] > 10.0
    for stats in r8["layers"].values():
        assert 0.0 <= stats["max_scaled_err"] < 0.05


def test_layer_report_matches_full_tree_roundtrip(tiny_model_params):
    """The per-leaf report must measure the SAME transform the serving path
    applies: reconstructing via the full-tree quantize→dequantize must give
    the per-layer errors the report printed."""
    _, params, _ = tiny_model_params
    rep = layer_quant_report(params, "int8")
    recon = dequantize_llm_weights(quantize_llm_weights(params, "int8"))

    def by_path(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {"/".join(str(getattr(k, "key", k)) for k in path): leaf
                for path, leaf in flat}

    orig, rec = by_path(params), by_path(recon)
    checked = 0
    for lpath, stats in rep["layers"].items():
        key = "params/" + lpath + ("" if lpath.endswith("embed_tokens")
                                   else "/kernel")
        if key not in orig or key not in rec:
            continue
        w = np.asarray(orig[key], np.float64)
        what = np.asarray(rec[key], np.float64)
        err = w - what
        snr = 10 * np.log10((w * w).sum() / (err * err).sum())
        assert abs(snr - stats["snr_db"]) < 0.05, lpath
        checked += 1
    assert checked >= rep["num_layers"] // 2


def test_forward_agreement_ranges(tiny_model_params):
    cfg, params, batches = tiny_model_params
    rep = forward_agreement(cfg, params, batches, "int8",
                            dtype=jnp.float32)
    assert rep["num_batches"] == 2
    assert 0.0 <= rep["top1_match"] <= 1.0
    assert rep["float_top5_contains_q_top1"] >= rep["top1_match"]
    assert rep["mean_kl"] >= 0.0
    assert rep["max_scaled_logit_err"] < 0.5
    # tiny random model: int8 per-channel error is small relative to logit
    # spread, so the stacks should mostly agree
    assert rep["top1_match"] > 0.5


def test_greedy_agreement_self_consistent(tiny_model_params):
    cfg, params, batches = tiny_model_params
    rep = greedy_agreement(cfg, params, batches[0], "int8",
                           max_new_tokens=8, dtype=jnp.float32)
    assert rep["new_tokens"] >= 8
    assert 0.0 <= rep["match_fraction"] <= 1.0
    if rep["first_divergence"] == -1:
        assert rep["match_fraction"] == 1.0
    else:
        assert rep["match_fraction"] < 1.0


def test_cli_quant_report_tiny(capsys):
    from u2tokenizer_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["quant-report", "--tiny", "--modes", "int8", "--num-batches", "1",
         "--seq-extra", "8", "--per-layer"])
    args.fn(args)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["checkpoint"] == "random-init"
    assert out["int8"]["weights"]["num_layers"] > 0
    assert "layers" in out["int8"]["weights"]
    assert 0.0 <= out["int8"]["forward"]["top1_match"] <= 1.0


def test_decide_thresholds():
    """decide() applies DECISION_THRESHOLDS per mode: a passing int4 entry
    flips pass=True only when ALL FOUR checks are evaluable and pass; any
    single failing check flips pass=False with the failing check
    identified; an incomplete battery (weights-only run) can fail but
    never go — pass=None + complete=False; the rehearsal flag marks the
    verdict non-decision-grade."""
    from u2tokenizer_tpu.eval.quant_report import decide

    good = {
        "weights": {"snr_db_min": 22.0},
        "forward": {"top1_match": 0.99, "mean_kl": 0.002},
        "greedy": {"match_fraction": 0.97},
    }
    d = decide(good, "int4")
    assert d["pass"] is True and d["decision_grade"] is True
    assert set(d["checks"]) == {"snr_db_min", "top1_match", "mean_kl",
                                "greedy_match_fraction"}

    bad = dict(good, forward={"top1_match": 0.99, "mean_kl": 0.05})
    d = decide(bad, "int4")
    assert d["pass"] is False
    assert d["checks"]["mean_kl"]["ok"] is False
    assert d["checks"]["top1_match"]["ok"] is True

    # int8 sanity gate is stricter
    assert decide(good, "int8")["pass"] is False  # 22 dB < 30 dB floor

    weights_only = {"weights": {"snr_db_min": 40.0}}
    d = decide(weights_only, "int8")
    # one passing check is NOT a go verdict — the int4 default flip must
    # never ride a weights-only run
    assert d["pass"] is None and d["complete"] is False
    assert "not evaluated" in d["note"]
    d = decide({"weights": {"snr_db_min": 5.0}}, "int8")
    assert d["pass"] is False  # a failing check CAN fail an incomplete run
    d = decide({"weights": {}}, "int8")
    assert d["pass"] is None  # nothing evaluable

    d = decide(good, "int4", decision_grade=False)
    assert d["pass"] is True and d["decision_grade"] is False
    assert "note" in d
