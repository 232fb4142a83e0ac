"""Tests: structured error reporting / restart wrapper; M3D ITR dataset."""

import json
import os

import numpy as np
import pytest

from test_data import MockTokenizer

from u2tokenizer_tpu.utils.errors import is_transient, record, run_with_restarts



# pure-host fast tier (tests/conftest.py allowlist policy)
pytestmark = pytest.mark.fast

def test_record_writes_report(tmp_path):
    @record(error_dir=str(tmp_path))
    def boom():
        raise ValueError("kaput")

    with pytest.raises(ValueError):
        boom()
    reports = [f for f in os.listdir(tmp_path) if f.startswith("error_")]
    assert len(reports) == 1
    data = json.load(open(tmp_path / reports[0]))
    assert data["exception_type"] == "ValueError"
    assert "kaput" in data["message"]
    assert "boom" in data["traceback"]


def test_run_with_restarts(tmp_path):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: socket closed by peer")
        return "done"

    out = run_with_restarts(flaky, max_restarts=5, backoff_s=0.01,
                            error_dir=str(tmp_path))
    assert out == "done"
    assert calls["n"] == 3

    # non-transient errors do not restart
    def fatal():
        calls["n"] += 1
        raise ValueError("logic bug")

    calls["n"] = 0
    with pytest.raises(ValueError):
        run_with_restarts(fatal, max_restarts=5, backoff_s=0.01,
                          error_dir=str(tmp_path))
    assert calls["n"] == 1
    assert not is_transient(ValueError("x"))
    assert is_transient(RuntimeError("DEADLINE_EXCEEDED while fetching"))


def test_itr_dataset(tmp_path):
    from u2tokenizer_tpu.data.m3d_datasets import (
        M3DITRDataset,
        truncate_text_random_sentences,
    )

    rng = np.random.default_rng(0)
    np.save(tmp_path / "v.npy", rng.uniform(0, 1, (1, 8, 16, 16)).astype(np.float32))
    with open(tmp_path / "t.txt", "w") as f:
        f.write("first sentence. second part here. third bit. fourth chunk.")
    with open(tmp_path / "cap.json", "w") as f:
        json.dump({"train": [{"image": "v.npy", "text": "t.txt"}]}, f)

    tok = MockTokenizer()
    ds = M3DITRDataset(str(tmp_path), str(tmp_path / "cap.json"), tok, 32,
                       mode="train", seed=0)
    s = ds[0]
    assert s["question_type"] == "Image_text_retrieval"
    assert s["input_id"].shape == (32,)
    assert s["image"].shape == (1, 8, 16, 16)
    assert "first sentence" in s["text"]

    # truncation keeps the first sentence and respects the budget
    import random
    long_text = ". ".join(f"sentence number {i} with several words"
                          for i in range(50))
    out = truncate_text_random_sentences(long_text, 20, tok, random.Random(0))
    assert out.split(".")[0].strip().startswith("sentence number 0")
    assert len(tok(out)["input_ids"]) < len(tok(long_text)["input_ids"])
