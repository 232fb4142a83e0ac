"""M3D-Bench task drivers (eval/m3d_bench.py): rec/reg/seg/itr end-to-end on
synthetic data, metric semantics vs the reference mains
(eval/M3D-Bench/eval/eval_pos.py, eval_seg.py, eval_itr.py)."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_data import MockTokenizer

from u2tokenizer_tpu.config import GenerationConfig, SegConfig, U2ModelConfig
from u2tokenizer_tpu.data.m3d_datasets import (
    M3DITRDataset,
    M3DPosRECDataset,
    M3DPosREGDataset,
    M3DSegDataset,
)
from u2tokenizer_tpu.eval.m3d_bench import (
    evaluate_itr,
    evaluate_rec,
    evaluate_reg,
    evaluate_seg,
    make_u2_itr_encoders,
    recall_at_k,
)
from u2tokenizer_tpu.models.u2_model import U2CausalLM
from u2tokenizer_tpu.utils.box import box_to_text


@pytest.fixture(scope="module")
def tiny_model():
    cfg = dataclasses.replace(U2ModelConfig.tiny(), seg=SegConfig.tiny())
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    images = jax.random.normal(rng, (1, cfg.num_chunks, d, h, w))
    sd, sh, sw = cfg.seg.image_size
    params = model.init(rng, jnp.ones((1, 16), jnp.int32), images,
                        jnp.ones((1, 4), jnp.int32),
                        jax.random.normal(rng, (1, 1, sd, sh, sw)),
                        jnp.zeros((1,), jnp.int32), method="forward_seg")
    return cfg, model, params


@pytest.fixture()
def bench_root(tmp_path, tiny_model):
    """Synthetic M3D data root with volumes matching the tiny model."""
    cfg, _, _ = tiny_model
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    d, h, w = cfg.vision.input_spatial
    for i in range(3):
        np.save(os.path.join(root, f"vol{i}.npy"),
                rng.uniform(0, 1, (cfg.num_chunks, d, h, w)).astype(
                    np.float32))
        with open(os.path.join(root, f"txt{i}.txt"), "w") as f:
            f.write(f"report number {i} describing organ {i} only")
    mask = np.zeros((1, d, h, w), np.uint8)
    mask[0, d // 4: d // 2, h // 4: h // 2, w // 4: 3 * w // 4] = 1
    np.save(os.path.join(root, "mask0.npy"), mask)
    os.makedirs(os.path.join(root, "0000"), exist_ok=True)
    with open(os.path.join(root, "0000", "test.json"), "w") as f:
        json.dump([{"image": "vol0.npy", "label": "mask0.npy", "cls_id": 0}],
                  f)
    with open(os.path.join(root, "cap.json"), "w") as f:
        json.dump({"test": [{"image": f"vol{i}.npy", "text": f"txt{i}.txt"}
                            for i in range(3)]}, f)
    return root


def _echo_generator(transform=lambda s: s["answer"]):
    """Stub generator: returns a function of the sample (oracle model)."""
    return lambda sample, rng: transform(sample)


def test_evaluate_rec_oracle_and_garbage(bench_root):
    tok = MockTokenizer()
    ds = M3DPosRECDataset(bench_root, bench_root, tok, 64, tag="0000",
                          proj_out_num=4, mode="test", seed=0)
    assert len(ds) == 1
    # eval mode prompts question-only: the answer must NOT be in input_id
    s = ds[0]
    n_prompt = int(s["attention_mask"].sum())
    decoded = tok.decode(s["input_id"][:n_prompt])
    assert "[" not in decoded  # no box text in the prompt

    # oracle: echo the gold answer -> IoU 1, acc@0.5 1
    res = evaluate_rec(ds, _echo_generator())
    assert res.metrics["mean_iou"] == pytest.approx(1.0)
    assert res.metrics["acc_at_05"] == 1.0
    assert res.metrics["parse_rate"] == 1.0

    # unparseable prediction -> row kept with iou = -1 (reference behavior)
    res = evaluate_rec(ds, _echo_generator(lambda s: "no box here"))
    assert res.rows[0]["iou"] == -1.0
    assert res.metrics["parse_rate"] == 0.0

    # a shifted box partially overlapping the mask-derived gold box
    shifted = box_to_text([0.0, 0.0, 0.2, 0.4, 0.4, 0.6])
    res = evaluate_rec(ds, _echo_generator(lambda s: f"it is at {shifted}"))
    assert 0.0 < res.rows[0]["iou"] < 1.0


def test_evaluate_reg_metrics(bench_root):
    tok = MockTokenizer()
    ds = M3DPosREGDataset(bench_root, bench_root, tok, 64, tag="0000",
                          proj_out_num=4, mode="test", seed=0)
    res = evaluate_reg(ds, _echo_generator(), compute_bertscore=False)
    assert res.metrics["bleu"] == pytest.approx(1.0)
    assert res.metrics["rouge1"] == pytest.approx(1.0)
    assert res.metrics["meteor"] > 0.9


def test_evaluate_seg_end_to_end(bench_root, tiny_model):
    """Full seg pipeline on the real tiny model: generate + '[SEG]' hidden
    -> mask -> Dice. Random weights give garbage Dice; the contract under
    test is shapes/plumbing/metric wiring."""
    from u2tokenizer_tpu.models.generate import make_seg_generate_fn

    cfg, model, params = tiny_model
    tok = MockTokenizer()
    ds = M3DSegDataset(bench_root, bench_root, tok, 48, tag="0000",
                       proj_out_num=4, mode="test", seed=0)
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-2)
    seg_fn = make_seg_generate_fn(model, gen, seg_token_id=5, jit=False)
    res = evaluate_seg(ds, seg_fn, params, tok, max_cases=2,
                       seg_image_size=cfg.seg.image_size)
    assert len(res.rows) == 1
    assert 0.0 <= res.metrics["mean_dice"] <= 1.0
    assert 0.0 <= res.rows[0]["dice"] <= 1.0
    assert isinstance(res.rows[0]["has_seg"], bool)


def test_recall_at_k_semantics():
    # diagonal best -> recall@1 == 1
    eye = np.eye(4)
    assert recall_at_k(eye, 1) == 1.0
    # row 0's best is column 1 -> recall@1 = 3/4 but recall@2 recovers it
    s = np.eye(4)
    s[0, 1] = 2.0
    assert recall_at_k(s, 1) == 0.75
    assert recall_at_k(s, 2) == 1.0


def test_evaluate_itr_end_to_end(bench_root, tiny_model):
    cfg, model, params = tiny_model
    tok = MockTokenizer()
    ds = M3DITRDataset(bench_root, os.path.join(bench_root, "cap.json"),
                       tok, 32, proj_out_num=4, mode="test", seed=0)
    assert len(ds) == 3
    enc_img, enc_txt = make_u2_itr_encoders(model, params)
    res = evaluate_itr(ds, enc_img, enc_txt)
    for k in (1, 5, 10):
        assert 0.0 <= res.metrics[f"ir_r{k}"] <= 1.0
        assert 0.0 <= res.metrics[f"tr_r{k}"] <= 1.0
    # recall@k is monotone in k and hits 1 at k >= N
    assert res.metrics["ir_r5"] >= res.metrics["ir_r1"]
    assert res.metrics["ir_r5"] == 1.0  # k clamped to N=3
    assert len(res.rows) == 3

    # oracle encoders -> perfect retrieval both ways
    feats = {}

    def enc_i(img):
        key = round(float(np.asarray(img).sum()), 3)
        if key not in feats:
            out = np.zeros((1, 4), np.float32)
            out[0, len(feats) % 4] = 1.0
            feats[key] = out
        return feats[key]

    txt_calls = {"n": 0}

    def enc_t(ids, mask):
        out = np.zeros((1, 4), np.float32)
        out[0, txt_calls["n"] % 4] = 1.0
        txt_calls["n"] += 1
        return out

    res = evaluate_itr(ds, enc_i, enc_t)
    assert res.metrics["ir_r1"] == 1.0
    assert res.metrics["tr_r1"] == 1.0
