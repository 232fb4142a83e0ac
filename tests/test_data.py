"""Data layer tests: NIfTI IO, u2 transform geometry, dataset tokenization
semantics (label masking parity with fused_dataset.py:153-188)."""

import json
import os

import numpy as np
import pytest

from u2tokenizer_tpu.data.datasets import (
    IGNORE_INDEX,
    DataLoader,
    FusedDataset,
    collate_batch,
)
from u2tokenizer_tpu.data.nifti import read_nifti, write_nifti
from u2tokenizer_tpu.data.transforms import (
    U2VolumeTransform,
    crop_foreground,
    resize_trilinear,
    scale_intensity_range_percentiles,
)


from u2tokenizer_tpu.utils.mock_tokenizer import MockTokenizer  # noqa: F401
# (the package mock is the single tokenizer test double; re-exported for
# other test modules)



# pure-host fast tier (tests/conftest.py allowlist policy)
pytestmark = pytest.mark.fast

@pytest.fixture()
def nifti_volume(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.uniform(-1000, 400, size=(40, 50, 30)).astype(np.float32)
    path = str(tmp_path / "vol.nii.gz")
    write_nifti(path, vol)
    return path, vol


def test_nifti_roundtrip(nifti_volume):
    path, vol = nifti_volume
    loaded = read_nifti(path)
    assert loaded.shape == vol.shape
    np.testing.assert_allclose(loaded, vol, rtol=1e-6)


def test_nifti_uncompressed(tmp_path):
    vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = str(tmp_path / "v.nii")
    write_nifti(path, vol)
    np.testing.assert_allclose(read_nifti(path), vol)


def test_percentile_windowing():
    x = np.linspace(0, 100, 1001)
    out = scale_intensity_range_percentiles(x, 0.5, 99.5)
    assert out.min() == 0.0 and out.max() == 1.0
    assert (out[(x > 1) & (x < 99)] > 0).all()


def test_crop_foreground():
    x = np.zeros((1, 10, 10, 10))
    x[0, 2:5, 3:7, 1:9] = 1.0
    out = crop_foreground(x)
    assert out.shape == (1, 3, 4, 8)


def test_resize_identity():
    x = np.random.default_rng(0).normal(size=(8, 8, 8))
    np.testing.assert_array_equal(resize_trilinear(x, (8, 8, 8)), x)


def test_resize_align_corners():
    x = np.linspace(0, 1, 5)[:, None, None] * np.ones((5, 3, 3))
    out = resize_trilinear(x, (9, 3, 3), anti_aliasing=False)
    np.testing.assert_allclose(out[:, 0, 0], np.linspace(0, 1, 9), atol=1e-6)


def test_u2_transform_shape(nifti_volume):
    path, _ = nifti_volume
    t = U2VolumeTransform(data_type="validation", target_size=64,
                          chunk_depth=8, num_chunks=4)
    out = t(path)
    assert out.shape == (4, 8, 64, 64)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_u2_transform_training_augment(nifti_volume):
    path, _ = nifti_volume
    t = U2VolumeTransform(data_type="training", target_size=64,
                          chunk_depth=8, num_chunks=4, seed=0)
    out1 = t(path)
    out2 = t(path)
    assert out1.shape == out2.shape == (4, 8, 64, 64)
    # augmentation random state advances -> different outputs (with high prob)
    assert not np.array_equal(out1, out2)


@pytest.fixture()
def jsonl_dataset(tmp_path, nifti_volume):
    path, _ = nifti_volume
    rows = [
        {"image": os.path.basename(path),
         "question": "Describe the chest findings",
         "answer": "Lungs are clear with no effusion"},
        {"image": os.path.basename(path),
         "question": "Any abnormality",
         "answer": "None seen"},
    ]
    jsonl = tmp_path / "data.jsonl"
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(tmp_path), "data.jsonl"


def test_fused_dataset_masking(jsonl_dataset):
    base, jsonl = jsonl_dataset
    tok = MockTokenizer()
    ds = FusedDataset(base, jsonl, tok, max_length=64, image_tokens_num=4,
                      data_type="validation", num_chunks=4, chunk_depth=8,
                      target_size=64)
    s = ds[0]
    assert s["image"].shape == (4, 8, 64, 64)
    assert s["input_id"].shape == (64,)

    # question span + padding masked; answer tokens present
    q_ids = tok(s["question"])["input_ids"]
    qlen = len(q_ids)
    full_ids = tok(s["question"] + s["answer"])["input_ids"]
    valid = len(full_ids)
    assert (s["label"][:qlen] == IGNORE_INDEX).all()
    np.testing.assert_array_equal(s["label"][qlen:valid], full_ids[qlen:])
    # eos written at the first pad slot and kept as a training target
    assert s["input_id"][valid] == tok.eos_token_id
    assert s["label"][valid] == tok.eos_token_id
    assert (s["label"][valid + 1:] == IGNORE_INDEX).all()
    # question_ids = raw question only
    raw_q = tok(s["prompt_question"])["input_ids"]
    np.testing.assert_array_equal(s["question_ids"][:len(raw_q)], raw_q)
    assert (s["question_ids"][len(raw_q):] == tok.pad_token_id).all()


def test_fused_dataset_dpo_mode(jsonl_dataset, tmp_path):
    base, jsonl = jsonl_dataset
    # rewrite with chosen/rejected
    rows = []
    with open(os.path.join(base, jsonl)) as f:
        for line in f:
            r = json.loads(line)
            r["chosen"] = "good report"
            r["rejected"] = "bad report"
            rows.append(r)
    with open(os.path.join(base, "dpo.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = FusedDataset(base, "dpo.jsonl", MockTokenizer(), max_length=32,
                      image_tokens_num=4, dpo_mode=True, return_image=False)
    s = ds[0]
    assert s["chosen"] == "good report"
    assert s["rejected"] == "bad report"
    assert isinstance(s["image"], str)  # path only (return_image=False)


def test_dataloader_shards_and_batches(jsonl_dataset):
    base, jsonl = jsonl_dataset
    tok = MockTokenizer()
    ds = FusedDataset(base, jsonl, tok, max_length=32, image_tokens_num=4,
                      data_type="validation", num_chunks=4, chunk_depth=8,
                      target_size=64)
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    batches = list(dl)
    assert len(batches) == 1
    b = batches[0]
    assert b["images"].shape == (2, 4, 8, 64, 64)
    assert b["input_ids"].shape == (2, 32)
    assert b["labels"].shape == (2, 32)

    # two-process sharding reads disjoint halves
    dl0 = DataLoader(ds, batch_size=1, shuffle=False, process_index=0,
                     process_count=2, num_workers=1)
    dl1 = DataLoader(ds, batch_size=1, shuffle=False, process_index=1,
                     process_count=2, num_workers=1)
    assert len(list(dl0)) == 1 and len(list(dl1)) == 1


class _IndexDataset:
    """Tiny map-style dataset; item = its own index (no IO)."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return i


def test_dataloader_many_batches_no_deadlock():
    """Regression: the threaded loader must stream len(batches) >> num_workers.

    A previous implementation submitted whole-batch tasks that ran pool.map
    on the same executor; with > num_workers batches in flight every worker
    held a batch task and the per-item tasks never ran (hang). 64 batches at
    num_workers=4 is far past the old trigger threshold. Run consumption on
    a daemon thread with a hard 60 s deadline so a regression fails fast
    instead of hanging the suite."""
    import threading

    ds = _IndexDataset(256)
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=4,
                    collate_fn=lambda items: list(items))
    out = {}

    def consume():
        out["batches"] = list(dl)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(60)
    assert not t.is_alive(), "DataLoader deadlocked (no progress in 60 s)"
    batches = out["batches"]
    assert len(batches) == 64
    # in-order, exactly-once delivery
    assert [i for b in batches for i in b] == list(range(256))
