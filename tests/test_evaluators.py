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
