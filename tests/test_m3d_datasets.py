"""M3D dataset family + box utils tests on synthetic data."""

import csv
import json
import os

import numpy as np
import pytest

from test_data import MockTokenizer

from u2tokenizer_tpu.data.m3d_datasets import (
    ConcatDataset,
    M3DCapDataset,
    M3DPosRECDataset,
    M3DPosREGDataset,
    M3DSegDataset,
    M3DVQADataset,
    M3DVQAYNDataset,
    M3DRefSegDataset,
)
from u2tokenizer_tpu.utils.box import (
    box_iou_3d,
    box_to_text,
    dice_score,
    extract_box_from_text,
    mask_to_box,
)



# pure-host fast tier (tests/conftest.py allowlist policy)
pytestmark = pytest.mark.fast

def test_mask_to_box_roundtrip():
    mask = np.zeros((10, 20, 20))
    mask[2:5, 4:10, 6:18] = 1
    box = mask_to_box(mask)
    np.testing.assert_allclose(box, [0.2, 0.2, 0.3, 0.5, 0.5, 0.9])
    text = box_to_text(box)
    np.testing.assert_allclose(extract_box_from_text("it is at " + text), box,
                               atol=0.01)
    assert extract_box_from_text("no boxes here [1, 2]") is None
    assert mask_to_box(np.zeros((4, 4, 4))) is None


def test_box_iou():
    a = [0, 0, 0, 1, 1, 1]
    assert box_iou_3d(a, a) == 1.0
    assert box_iou_3d(a, [2, 2, 2, 3, 3, 3]) == 0.0
    b = [0, 0, 0.5, 1, 1, 1.5]
    np.testing.assert_allclose(box_iou_3d(a, b), 0.5 / 1.5)


def test_dice():
    a = np.zeros((4, 4)); a[:2] = 1
    assert dice_score(a, a) > 0.999
    assert dice_score(a, np.zeros_like(a)) < 1e-4


@pytest.fixture()
def m3d_root(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    # volumes + text
    for i in range(2):
        np.save(os.path.join(root, f"vol{i}.npy"),
                rng.uniform(0, 1, (1, 8, 16, 16)).astype(np.float32))
        with open(os.path.join(root, f"txt{i}.txt"), "w") as f:
            f.write(f"report number {i} with clear lungs")
    with open(os.path.join(root, "cap.json"), "w") as f:
        json.dump({"train": [{"image": f"vol{i}.npy", "text": f"txt{i}.txt"}
                             for i in range(2)]}, f)
    # vqa csv
    with open(os.path.join(root, "vqa.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "Image Path", "Question", "Choice A", "Choice B", "Choice C",
            "Choice D", "Answer", "Answer Choice", "Question Type"])
        w.writeheader()
        w.writerow({"Image Path": "vol0.npy", "Question": "What organ",
                    "Choice A": "liver", "Choice B": "lung", "Choice C": "heart",
                    "Choice D": "kidney", "Answer": "liver",
                    "Answer Choice": "A", "Question Type": "organ"})
    # seg split: masks + split json
    os.makedirs(os.path.join(root, "0000"), exist_ok=True)
    mask = np.zeros((1, 8, 16, 16), np.uint8)
    mask[0, 2:5, 3:9, 4:12] = 1
    np.save(os.path.join(root, "mask0.npy"), mask)
    with open(os.path.join(root, "0000", "train.json"), "w") as f:
        json.dump([{"image": "vol0.npy", "label": "mask0.npy", "cls_id": 0}], f)
    # refseg csv
    with open(os.path.join(root, "refseg.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Image", "Mask", "Question", "Answer"])
        w.writeheader()
        w.writerow({"Image": "vol0.npy", "Mask": "mask0.npy",
                    "Question": "segment the liver",
                    "Answer": "the liver mask is [SEG]"})
    return root


def _check_sample(s, max_length=48):
    assert s is not None
    assert s["input_id"].shape == (max_length,)
    assert s["label"].shape == (max_length,)
    assert (s["label"][:1] == -100).all()  # question span masked
    assert s["image"].ndim == 4


def test_cap_dataset(m3d_root):
    ds = M3DCapDataset(m3d_root, os.path.join(m3d_root, "cap.json"),
                       MockTokenizer(), 48, proj_out_num=4, mode="train", seed=0)
    assert len(ds) == 2
    s = ds[0]
    _check_sample(s)
    assert s["question_type"] == "Caption"
    assert "report number" in s["answer"]


def test_vqa_dataset(m3d_root):
    tok = MockTokenizer()
    ds = M3DVQADataset(m3d_root, os.path.join(m3d_root, "vqa.csv"), tok, 48,
                       proj_out_num=4, mode="train", seed=0)
    s = ds[0]
    _check_sample(s)
    assert s["answer"] == "A. liver"
    assert "Choices:" in s["question"]
    ds_open = M3DVQADataset(m3d_root, os.path.join(m3d_root, "vqa.csv"), tok,
                            48, close_ended=False, proj_out_num=4, mode="train")
    assert ds_open[0]["answer"] == "liver"
    yn = M3DVQAYNDataset(m3d_root, os.path.join(m3d_root, "vqa.csv"), tok, 48,
                         proj_out_num=4, mode="train")
    assert yn[0]["answer"] == "liver"


def test_posrec_posreg_seg(m3d_root):
    tok = MockTokenizer()
    rec = M3DPosRECDataset(m3d_root, m3d_root, tok, 48, tag="0000",
                           proj_out_num=4, mode="train", seed=0)
    assert len(rec) == 1
    s = rec[0]
    _check_sample(s)
    box = extract_box_from_text(s["answer"])
    assert box is not None
    np.testing.assert_allclose(box, [2/8, 3/16, 4/16, 5/8, 9/16, 12/16],
                               atol=0.01)

    reg = M3DPosREGDataset(m3d_root, m3d_root, tok, 48, tag="0000",
                           proj_out_num=4, mode="train", seed=0)
    s = reg[0]
    assert "liver" in s["answer"]

    seg = M3DSegDataset(m3d_root, m3d_root, tok, 48, tag="0000",
                        proj_out_num=4, mode="train", seed=0)
    s = seg[0]
    assert "[SEG]" in s["answer"]
    assert s["seg"].sum() > 0

    ref = M3DRefSegDataset(m3d_root, os.path.join(m3d_root, "refseg.csv"),
                           tok, 48, proj_out_num=4, mode="train")
    s = ref[0]
    assert "[SEG]" in s["answer"]


def test_concat_and_retry(m3d_root):
    tok = MockTokenizer()
    cap = M3DCapDataset(m3d_root, os.path.join(m3d_root, "cap.json"), tok, 48,
                        proj_out_num=4, mode="train", seed=0)
    vqa = M3DVQADataset(m3d_root, os.path.join(m3d_root, "vqa.csv"), tok, 48,
                        proj_out_num=4, mode="train", seed=0)
    uni = ConcatDataset([cap, vqa])
    assert len(uni) == 3
    assert uni[2]["answer"] == "A. liver"

    # corrupted volume -> resample another index, not crash
    cap2 = M3DCapDataset(m3d_root, os.path.join(m3d_root, "cap.json"), tok, 48,
                         proj_out_num=4, mode="train", seed=0)
    cap2.data_list[0] = {"image": "missing.npy", "text": "txt0.txt"}
    s = cap2[0]
    assert s is not None and "report number" in s["answer"]
