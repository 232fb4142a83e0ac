"""Per-dataset synthesis converters (src/preprocess/* parity) on synthetic
inputs: AMOS-MM QA/report/choice extraction, CT-RATE path layout, M3D-RefSeg
mask-index conversion, and the LLM-backed rewrite/translate/thinking stages
with a stub backend."""

import json
import os

import numpy as np
import pytest

from u2tokenizer_tpu.data.converters import (
    amos_mm_extract_qa, amos_mm_report_choice_questions, amos_mm_reports,
    abdomen_atlas_reports, ct_rate_reports, ct_rate_volume_path,
    m3d_refseg_convert, rewrite_jsonl, thinking_synthesis_jsonl,
    translate_jsonl)



# pure-host fast tier (tests/conftest.py allowlist policy)
pytestmark = pytest.mark.fast

def _load(path):
    with open(path) as f:
        return [json.loads(l) for l in f]


def _amos_json(tmp_path):
    data = {"training": [], "validation": []}
    for split, n in (("training", 3), ("validation", 2)):
        for i in range(n):
            data[split].append({
                "image": f"./imagesTr/case_{split}_{i}.nii.gz",
                "meta": {"age": 50 + i},
                "labels": {
                    "report": {"findings": {
                        "chest": f"clear lungs case {i}",
                        "abdomen": f"normal liver case {i}",
                        "pelvis": "",
                    }},
                    "qa": [{"question": f"Largest organ in view {i}?",
                            "options": {"A": "liver", "B": "spleen",
                                        "C": "kidney", "D": "heart"},
                            "answer": "A"}],
                },
            })
    path = tmp_path / "dataset.json"
    path.write_text(json.dumps(data))
    return str(path)


def test_amos_mm_extract_qa(tmp_path):
    out = tmp_path / "qa.jsonl"
    n = amos_mm_extract_qa(_amos_json(tmp_path), str(out))
    rows = _load(out)
    assert n == len(rows) == 2  # validation split only
    assert rows[0]["task_type"] == "VQA-Chioce"
    assert "Choices: A. liver" in rows[0]["question"]
    assert rows[0]["image"].startswith("AMOS-MM/imagesTr/")
    assert rows[0]["answer"] == "A"


def test_amos_mm_reports_and_choices(tmp_path):
    ds = _amos_json(tmp_path)
    out = tmp_path / "reports.jsonl"
    n = amos_mm_reports(ds, str(out))
    rows = _load(out)
    assert n == 6  # 3 training cases x 2 non-empty parts
    assert {r["category"] for r in rows} == {"chest", "abdomen"}
    assert all("findings in" in r["question"] for r in rows)

    out2 = tmp_path / "choices.jsonl"
    n2 = amos_mm_report_choice_questions(ds, str(out2), n_choices=4, seed=1)
    rows2 = _load(out2)
    assert n2 == 6
    for r in rows2:
        letter = r["answer"][-1]
        assert "A" <= letter <= "D"
        # the lettered choice is the ground-truth findings text
        marker = f" {letter}. "
        chosen = r["question"].split(marker, 1)[1]
        for nxt in ("A. ", "B. ", "C. ", "D. ", "E. "):
            chosen = chosen.split(" " + nxt)[0]
        assert "case" in chosen


def test_ct_rate_reports(tmp_path):
    assert ct_rate_volume_path("train_1_a_1.nii.gz") == \
        "train_1/train_1_a/train_1_a_1.nii.gz"
    csv_path = tmp_path / "reports.csv"
    csv_path.write_text(
        "VolumeName,Findings_EN\n"
        "train_1_a_1.nii.gz,Lungs are clear.\n"
        "train_2_b_1.nii.gz,\n")  # empty findings dropped
    out = tmp_path / "ct.jsonl"
    n = ct_rate_reports(str(csv_path), str(out))
    rows = _load(out)
    assert n == 1
    assert rows[0]["image"] == ("CT-RATE/dataset/train/train_1/train_1_a/"
                                "train_1_a_1.nii.gz")
    assert rows[0]["answer"] == "Lungs are clear."


def test_abdomen_atlas_reports(tmp_path):
    root = tmp_path / "atlas"
    for case in ("BDMAP_0001", "BDMAP_0002"):
        os.makedirs(root / case)
        (root / case / "report.txt").write_text(f"report for {case}")
    out = tmp_path / "atlas.jsonl"
    n = abdomen_atlas_reports(str(root), str(out))
    rows = _load(out)
    assert n == 2 and rows[0]["dataset"] == "AbdomenAtlas"
    assert rows[1]["answer"] == "report for BDMAP_0002"


def test_m3d_refseg_convert(tmp_path):
    csv_path = tmp_path / "refseg.csv"
    csv_path.write_text(
        "Image,Mask,Question,Answer\n"
        "img1.npy,mask1.nii.gz,Where is the lesion?,It is at [SEG].\n")
    mask = np.zeros((1, 2, 3, 3), np.float32)
    mask[0, 1, 2, 2] = 1.0
    out = tmp_path / "refseg.jsonl"
    n = m3d_refseg_convert(str(csv_path), str(tmp_path), str(out),
                           mask_loader=lambda p: mask)
    rows = _load(out)
    assert n == 1
    flat_idx = 1 * 9 + 2 * 3 + 2
    assert rows[0]["answer"] == f"It is at [{flat_idx}]."
    assert rows[0]["task_type"] == "SEG"


def test_llm_backed_stages(tmp_path):
    src = tmp_path / "in.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"question": "describe", "answer": "lungs clear",
                            "image": "x.nii.gz"}) + "\n")

    backend = lambda prompt, system=None: (
        "<think>thought</think>refined text")
    out = tmp_path / "think.jsonl"
    assert thinking_synthesis_jsonl(backend, str(src), str(out)) == 1
    row = _load(out)[0]
    assert row["answer"].startswith("<think>thought</think>")
    assert row["synthesis"] is True

    backend2 = lambda prompt, system=None: "REWRITTEN"
    out2 = tmp_path / "rw.jsonl"
    assert rewrite_jsonl(backend2, str(src), str(out2)) == 1
    assert _load(out2)[0]["answer"] == "REWRITTEN"

    out3 = tmp_path / "zh.jsonl"
    assert translate_jsonl(backend2, str(src), str(out3)) == 1
    assert _load(out3)[0]["language"] == "zh"
