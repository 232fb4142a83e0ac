"""Native (C++) ingest library tests: build, load parity vs the numpy NIfTI
reader, and full-preprocess parity vs U2VolumeTransform."""

import numpy as np
import pytest

from u2tokenizer_tpu import native
from u2tokenizer_tpu.data.nifti import read_nifti, write_nifti
from u2tokenizer_tpu.data.transforms import U2VolumeTransform

pytestmark = [pytest.mark.skipif(not native.native_available(),
                                 reason="native library not built"),
              pytest.mark.fast]  # pure-host (C++ loader) tier


@pytest.fixture()
def vol_path(tmp_path):
    rng = np.random.default_rng(1)
    vol = rng.uniform(-1000, 400, size=(37, 49, 23)).astype(np.float32)
    path = str(tmp_path / "case.nii.gz")
    write_nifti(path, vol)
    return path, vol


def test_native_load_matches_numpy(vol_path):
    path, vol = vol_path
    a = native.load_nifti_native(path)
    b = read_nifti(path)
    assert a.shape == b.shape == vol.shape
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_native_preprocess_matches_python(vol_path):
    path, _ = vol_path
    out_native = native.load_and_preprocess_native(
        path, target=64, chunk_depth=8, num_chunks=4)
    t = U2VolumeTransform(data_type="validation", target_size=64,
                          chunk_depth=8, num_chunks=4)
    out_py = t(path)
    assert out_native.shape == out_py.shape == (4, 8, 64, 64)
    # identical algorithm, different float orders: tight but not bitwise
    assert np.abs(out_native - out_py).max() < 5e-2
    # correlation of the actual content should be near-perfect
    a, b = out_native.ravel(), out_py.ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999


def test_native_uncompressed(tmp_path):
    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    path = str(tmp_path / "v.nii")
    write_nifti(path, vol)
    np.testing.assert_allclose(native.load_nifti_native(path), vol, atol=1e-5)


def test_native_missing_file():
    with pytest.raises(IOError):
        native.load_nifti_native("/nonexistent/file.nii.gz")


def test_bulk_preprocess_queue(tmp_path):
    """Parallel work queue: ordered results, per-volume error isolation,
    .npy output mode."""
    rng = np.random.default_rng(3)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"case_{i}.nii.gz")
        write_nifti(p, rng.uniform(-200, 500, (20, 24, 12 + i)).astype(
            np.float32))
        paths.append(p)
    paths.insert(1, str(tmp_path / "missing.nii.gz"))  # isolated failure

    results = native.bulk_preprocess(paths, target=32, chunk_depth=8,
                                     num_chunks=2, num_workers=2)
    assert [r[0] for r in results] == paths  # input order preserved
    ok = [r for r in results if r[2] is None]
    bad = [r for r in results if r[2] is not None]
    assert len(ok) == 3 and len(bad) == 1
    assert bad[0][0].endswith("missing.nii.gz")
    for _, arr, _ in ok:
        assert arr.shape == (2, 8, 32, 32)

    out_dir = str(tmp_path / "npy")
    results = native.bulk_preprocess(paths[:1] + paths[2:], target=32,
                                     chunk_depth=8, num_chunks=2,
                                     out_dir=out_dir)
    assert all(e is None and a is None for _, a, e in results)
    import os
    names = sorted(os.listdir(out_dir))
    assert names == ["case_0.npy", "case_1.npy", "case_2.npy"]
    assert np.load(os.path.join(out_dir, "case_0.npy")).shape == (2, 8, 32, 32)
