"""Minimal NIfTI-1/2 reader (pure numpy + gzip — no nibabel dependency).

Replaces the reference's nibabel ingestion (src/utils/u2Transform.py:70:
``nib.load(path).get_fdata()``). Returns the voxel array in the same (X, Y, Z)
fortran-order layout nibabel's get_fdata produces, with scl_slope/scl_inter
applied, as float64 (get_fdata default).
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import Tuple

import numpy as np

_NIFTI1_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
    256: np.int8, 512: np.uint16, 768: np.uint32, 1024: np.int64,
    1280: np.uint64,
}


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_nifti(path: str) -> np.ndarray:
    """Read a .nii / .nii.gz volume -> float64 array shaped (X, Y, Z[, ...])."""
    with _open(path) as f:
        header = f.read(348)
        if len(header) < 348:
            raise ValueError(f"{path}: truncated NIfTI header")
        sizeof_hdr = struct.unpack("<i", header[:4])[0]
        if sizeof_hdr == 348:
            bo = "<"
        elif struct.unpack(">i", header[:4])[0] == 348:
            bo = ">"
        elif sizeof_hdr == 540 or struct.unpack(">i", header[:4])[0] == 540:
            return _read_nifti2(f, header, path)
        else:
            raise ValueError(f"{path}: not a NIfTI file (sizeof_hdr={sizeof_hdr})")

        magic = header[344:348]
        if magic[:2] not in (b"n+", b"ni"):
            raise ValueError(f"{path}: bad NIfTI magic {magic!r}")

        dim = struct.unpack(bo + "8h", header[40:56])
        ndim = dim[0]
        shape = tuple(max(1, d) for d in dim[1:1 + ndim])
        datatype = struct.unpack(bo + "h", header[70:72])[0]
        scl_slope = struct.unpack(bo + "f", header[112:116])[0]
        scl_inter = struct.unpack(bo + "f", header[116:120])[0]
        vox_offset = struct.unpack(bo + "f", header[108:112])[0]

        np_dtype = _NIFTI1_DTYPES.get(datatype)
        if np_dtype is None:
            raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
        dt = np.dtype(np_dtype).newbyteorder(bo)

        offset = int(vox_offset) if vox_offset else 352
        f.seek(offset)
        count = int(np.prod(shape))
        raw = f.read(count * dt.itemsize)
        data = np.frombuffer(raw, dtype=dt, count=count)
        # NIfTI voxel data is fortran-ordered: X fastest.
        data = data.reshape(shape, order="F").astype(np.float64)

    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        data = data * slope + scl_inter
    return data


def _read_nifti2(f, header348: bytes, path: str) -> np.ndarray:
    header = header348 + f.read(540 - 348)
    bo = "<" if struct.unpack("<i", header[:4])[0] == 540 else ">"
    magic = header[4:8]
    if magic[:2] not in (b"n+", b"ni"):
        raise ValueError(f"{path}: bad NIfTI-2 magic {magic!r}")
    datatype = struct.unpack(bo + "h", header[12:14])[0]
    dim = struct.unpack(bo + "8q", header[16:80])
    shape = tuple(max(1, d) for d in dim[1:1 + dim[0]])
    vox_offset = struct.unpack(bo + "q", header[168:176])[0]
    scl_slope = struct.unpack(bo + "d", header[176:184])[0]
    scl_inter = struct.unpack(bo + "d", header[184:192])[0]
    np_dtype = _NIFTI1_DTYPES.get(datatype)
    if np_dtype is None:
        raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
    dt = np.dtype(np_dtype).newbyteorder(bo)
    f.seek(int(vox_offset))
    count = int(np.prod(shape))
    data = np.frombuffer(f.read(count * dt.itemsize), dtype=dt, count=count)
    data = data.reshape(shape, order="F").astype(np.float64)
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        data = data * slope + scl_inter
    return data


def write_nifti(path: str, data: np.ndarray) -> None:
    """Write a minimal NIfTI-1 file (float32, identity affine). Test helper
    and offline-resizer output."""
    data = np.asarray(data, np.float32)
    header = bytearray(348)
    struct.pack_into("<i", header, 0, 348)
    dim = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", header, 40, *dim)
    struct.pack_into("<h", header, 70, 16)  # float32
    struct.pack_into("<h", header, 72, 32)  # bitpix
    struct.pack_into("<f", header, 108, 352.0)  # vox_offset
    struct.pack_into("<f", header, 112, 1.0)  # scl_slope
    pixdim = [1.0] * 8
    struct.pack_into("<8f", header, 76, *pixdim)
    header[344:348] = b"n+1\x00"
    payload = bytes(header) + b"\x00" * 4 + np.asfortranarray(data).tobytes(order="F")
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(payload)
