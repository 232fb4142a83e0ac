"""Native (C++) runtime components: ctypes bindings for the CT ingest
library (nifti_loader.cpp). Falls back to the pure-Python path when the
shared library hasn't been built — run native/build.sh to enable."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libu2native.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile the native library in place (g++ -O3 ... -lz)."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    script = os.path.join(os.path.dirname(__file__), "build.sh")
    try:
        subprocess.run(["sh", script], check=True, capture_output=True)
        return True
    except subprocess.CalledProcessError as e:
        print(f"native build failed: {e.stderr.decode()[:500]}")
        return False


def get_lib(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not (auto_build and build()):
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.u2_load_nifti.restype = ctypes.c_int
    lib.u2_load_nifti.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64)]
    lib.u2_preprocess.restype = ctypes.c_int
    lib.u2_preprocess.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.u2_load_and_preprocess.restype = ctypes.c_int
    lib.u2_load_and_preprocess.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.u2_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def native_available() -> bool:
    return get_lib(auto_build=True) is not None


def load_nifti_native(path: str) -> np.ndarray:
    """Native NIfTI read -> (X, Y, Z) float32 (fortran voxel order)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    dims = (ctypes.c_int64 * 8)()
    rc = lib.u2_load_nifti(path.encode(), ctypes.byref(out), dims)
    if rc != 0:
        raise IOError(f"u2_load_nifti({path}) failed with code {rc}")
    x, y, z = dims[0], dims[1], dims[2]
    arr = np.ctypeslib.as_array(out, shape=(z, y, x)).copy()
    lib.u2_free(out)
    # native buffer is fortran (x fastest) laid flat; as_array above read it
    # as (z, y, x) row-major == same memory; transpose to (X, Y, Z)
    return np.ascontiguousarray(arr.transpose(2, 1, 0)).astype(np.float32)


def load_and_preprocess_native(path: str, target: int = 256,
                               chunk_depth: int = 32,
                               num_chunks: int = 8) -> np.ndarray:
    """Fused native load+preprocess -> (num_chunks, chunk_depth, target, target)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    rc = lib.u2_load_and_preprocess(path.encode(), target, chunk_depth,
                                    num_chunks, ctypes.byref(out))
    if rc != 0:
        raise IOError(f"u2_load_and_preprocess({path}) failed with code {rc}")
    shape = (num_chunks, chunk_depth, target, target)
    arr = np.ctypeslib.as_array(out, shape=shape).copy()
    lib.u2_free(out)
    return arr


def bulk_preprocess(paths, target: int = 256, chunk_depth: int = 32,
                    num_chunks: int = 8, num_workers: Optional[int] = None,
                    out_dir: Optional[str] = None, fallback=None):
    """Multi-volume ingest work queue over the GIL-free native loader.

    ctypes calls release the GIL for the duration of the C++ load+preprocess,
    so a thread pool gives true multi-core parallelism with zero IPC cost
    (the reference's offline resizers use multiprocessing.Pool —
    src/utils/ct_rate_reduction.py:20-40; threads beat processes here because
    the per-volume output is ~67 MB that would otherwise be pickled).

    Args:
      paths: iterable of NIfTI paths.
      num_workers: thread count (default: os.cpu_count()).
      out_dir: when set, each result is written as <out_dir>/<stem>.npy and
        the returned arrays are None (bounded memory for dataset-scale runs).
      fallback: optional ``path -> (T, D, H, W) array`` used when the native
        library is unavailable (e.g. data.transforms.U2VolumeTransform).

    Returns:
      list of (path, array_or_None, error_or_None), input order preserved.
    """
    from concurrent.futures import ThreadPoolExecutor

    paths = list(paths)
    use_native = native_available()
    if not use_native and fallback is None:
        raise RuntimeError("native library unavailable and no fallback given")

    def path_stem(path: str) -> str:
        stem = os.path.basename(path)
        for ext in (".nii.gz", ".nii", ".npy"):
            if stem.endswith(ext):
                stem = stem[: -len(ext)]
                break
        return stem

    out_names = {}
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        # Same-named volumes from different input directories (common across
        # dataset shards) must not silently overwrite each other: on stem
        # collision, disambiguate with the parent-directory name; if even
        # that collides, refuse rather than drop data.
        by_stem = {}
        for p in paths:
            by_stem.setdefault(path_stem(p), []).append(p)
        for stem, group in by_stem.items():
            if len(group) == 1:
                out_names[group[0]] = stem
            else:
                for p in group:
                    parent = os.path.basename(os.path.dirname(p)) or "root"
                    out_names[p] = f"{parent}__{stem}"
        if len(set(out_names.values())) != len(paths):
            raise ValueError(
                "bulk_preprocess: output stem collision even after "
                "directory-prefix disambiguation; pass distinct paths")

    def work(path: str):
        try:
            if use_native:
                arr = load_and_preprocess_native(path, target, chunk_depth,
                                                 num_chunks)
            else:
                arr = np.asarray(fallback(path), np.float32)
            if out_dir is not None:
                np.save(os.path.join(out_dir, out_names[path] + ".npy"), arr)
                return path, None, None
            return path, arr, None
        except Exception as e:  # noqa: BLE001 — per-volume isolation
            return path, None, f"{type(e).__name__}: {e}"

    with ThreadPoolExecutor(max_workers=num_workers or os.cpu_count()) as ex:
        return list(ex.map(work, paths))
