"""Evaluator tests: MRG / VQA / benchmark battery on the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_data import MockTokenizer
from test_green import RESPONSE_LETTERS, RESPONSE_NO_ERRORS

from u2tokenizer_tpu.config import GenerationConfig, U2ModelConfig
from u2tokenizer_tpu.eval.evaluators import (
    ReportGenerator,
    evaluate_benchmark,
    evaluate_by_body_part,
    evaluate_mrg,
    evaluate_vqa,
)
from u2tokenizer_tpu.eval.green import GreenScorer
from u2tokenizer_tpu.models.generate import make_multimodal_generate_fn
from u2tokenizer_tpu.models.u2_model import U2CausalLM



# pure-host fast tier (tests/conftest.py allowlist policy)
pytestmark = pytest.mark.fast

class TinyDataset:
    def __init__(self, cfg, n=3, tok=None):
        self.cfg = cfg
        self.n = n
        self.tok = tok or MockTokenizer()
        d, h, w = cfg.vision.input_spatial
        rng = np.random.default_rng(0)
        self.vol = rng.normal(size=(cfg.num_chunks, d, h, w)).astype(np.float32)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        ml = 24
        ids = np.full(ml, self.tok.pad_token_id, np.int32)
        q = self.tok(f"describe case {i}")["input_ids"]
        ids[: len(q)] = q
        mask = np.zeros(ml, np.int32)
        mask[: len(q)] = 1
        return {
            "image": self.vol,
            "input_id": ids,
            "attention_mask": mask,
            "question_ids": ids[:6],
            "question": f"describe case {i}",
            "prompt_question": f"describe case {i}",
            "answer": "clear lungs normal heart",
            "answer_choice": "A",
        }


@pytest.fixture(scope="module")
def tiny_generator():
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    ds = TinyDataset(cfg)
    s = ds[0]
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(s["input_id"][None]),
                        jnp.asarray(s["image"][None]),
                        jnp.asarray(s["question_ids"][None]))
    tok = ds.tok
    gen_fn = make_multimodal_generate_fn(
        model, GenerationConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                                pad_token_id=tok.pad_token_id),
        cache_dtype=jnp.float32)
    return cfg, ds, ReportGenerator(model, params, tok, gen_fn,
                                    pad_id=tok.pad_token_id,
                                    eos_id=tok.eos_token_id)


@pytest.mark.slow  # jits the tiny model end-to-end (11 s setup / 4 s measured)
def test_evaluate_mrg(tiny_generator):
    cfg, ds, gen = tiny_generator
    scorer = GreenScorer(
        lambda prompts: [RESPONSE_LETTERS] * len(prompts),
        compute_summary_stats=False)
    result = evaluate_mrg(ds, gen, scorer, max_cases=2)
    assert len(result.rows) == 2
    np.testing.assert_allclose(result.metrics["green_mean"], 6 / 9)
    assert all("prediction" in r for r in result.rows)


def test_evaluate_vqa(tiny_generator):
    cfg, ds, gen = tiny_generator
    result = evaluate_vqa(ds, gen, max_cases=2)
    assert "accuracy" in result.metrics
    assert 0.0 <= result.metrics["accuracy"] <= 1.0
    assert len(result.rows) == 2


def test_benchmark_battery():
    refs = ["the lungs are clear", "there is a mass"]
    hyps = ["the lungs are clear", "no mass seen"]
    scorer = GreenScorer(
        lambda prompts: [RESPONSE_NO_ERRORS] * len(prompts),
        compute_summary_stats=False)
    m = evaluate_benchmark(refs, hyps, scorer, compute_bertscore=False)
    assert m["bleu1"] > 0.4
    assert m["rouge1_f"] > 0.4
    assert m["green_mean"] == 1.0
    assert m["green_err_false_report"] == 0.0
    assert m["green_matched_findings"] == 4.0


def test_body_part_protocol():
    cases = [
        {"body_part": "chest", "reference": "clear lungs"},
        {"body_part": "abdomen", "reference": "normal liver"},
        {"body_part": "chest", "reference": "small effusion"},
    ]
    out = evaluate_by_body_part(cases, lambda c: c["reference"])
    assert set(out) == {"chest", "abdomen", "overall"}
    assert out["chest"]["bleu1"] > 0.99
    assert out["overall"]["rougeL_f"] > 0.99


def test_bert_score_fallback_properties():
    """Offline BERTScore fallback: identity scores ~1, disjoint ~0, ordering
    tracks similarity (VERDICT r1 item 7 — full metric row always
    producible)."""
    from u2tokenizer_tpu.eval.metrics import (bert_score_f1,
                                              bert_score_fallback_f1)

    ref = "the lungs are clear with no pleural effusion"
    same = bert_score_fallback_f1(ref, ref)
    close = bert_score_fallback_f1(ref, "lungs clear no pleural effusion seen")
    far = bert_score_fallback_f1(ref, "hepatic lesion segment five biopsy")
    assert same > 0.999
    assert same >= close > far
    assert bert_score_fallback_f1(ref, "") == 0.0
    # determinism across calls
    assert close == bert_score_fallback_f1(
        ref, "lungs clear no pleural effusion seen")
    # the public entry always returns a full row (package absent here)
    f1 = bert_score_f1([ref, ref], [ref, "hepatic lesion"])
    assert f1 is not None and len(f1) == 2 and f1[0] > f1[1]


@pytest.mark.slow  # jits the tiny model end-to-end (11 s setup / 4 s measured)
def test_evaluate_predictions_driver(tmp_path):
    """External predictions jsonl -> full battery + per-part breakdown
    (replaces evalscipt comparative drivers)."""
    import json

    from u2tokenizer_tpu.eval.evaluators import evaluate_predictions

    rows = [
        {"answer": "clear lungs no effusion", "prediction":
         "clear lungs no effusion", "body_part": "chest"},
        {"answer": "normal liver and spleen", "predictions":
         ["normal liver spleen", "worse guess"], "body_part": "abdomen"},
        {"answer": "unrelated", "prediction": None},  # skipped
    ]
    result = evaluate_predictions(rows)
    assert len(result.rows) == 2
    for key in ("bleu1", "rouge1_f", "rougeL_f", "meteor", "bertscore_f1"):
        assert key in result.metrics, key
    assert result.metrics["bleu1"] > 0.4  # first pair is exact
    assert "chest_bleu1" in result.metrics and "abdomen_bleu1" in result.metrics
    assert result.metrics["chest_bleu1"] > result.metrics["abdomen_bleu1"]

    # CLI surface
    import subprocess
    import sys

    pred_file = tmp_path / "preds.jsonl"
    with open(pred_file, "w") as f:
        for r in rows[:2]:
            f.write(json.dumps(r) + "\n")
    out_file = tmp_path / "metrics.json"
    proc = subprocess.run(
        [sys.executable, "-m", "u2tokenizer_tpu.cli", "eval-predictions",
         "--predictions", str(pred_file), "--output", str(out_file)],
        capture_output=True, text=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr
    scored = json.loads(proc.stdout.strip().splitlines()[-1])
    assert scored["bleu1"] > 0.4
    assert out_file.exists()


def test_evaluate_with_llm_judge():
    """LLM-as-judge caption scoring (M3D-Bench eval_with_llm.py protocol)
    with a stub judge; parse + NA handling."""
    from u2tokenizer_tpu.eval.evaluators import evaluate_with_llm

    calls = []

    def judge(prompt, system=None):
        calls.append((prompt, system))
        if "bad row" in prompt:
            return "no score here"
        return "Reasoning...\nScore: 82.5."

    rows = [
        {"answer": "clear lungs, normal heart", "prediction": "lungs clear"},
        {"answer": "bad row marker", "prediction": "bad row"},
        {"answer": "x", "prediction": None},  # skipped entirely
    ]
    out = evaluate_with_llm(rows, judge)
    assert out["llm_score_mean"] == 82.5
    assert out["llm_score_count"] == 1.0
    assert out["llm_score_invalid"] == 1.0
    assert "ground truth: clear lungs" in calls[0][0]
    assert calls[0][1] is not None  # system prompt passed through
