"""CT volume preprocessing: the u2Transform ingest path, rebuilt without
MONAI/torch.

Reference pipeline (src/utils/u2Transform.py:29-125):
  1. nib.load -> (X, Y, Z) -> transpose(2, 0, 1) -> (1, Z, X, Y)
  2. ScaleIntensityRangePercentiles(0.5, 99.5 -> [0, 1], clip)
  3. CropForeground (bbox of voxels > 0)
  4. (training) RandRotate90 p=.5 axes (1,2) | RandFlip p=.1 x3 |
     RandScaleIntensity .1 p=.5 | RandShiftIntensity .1 p=.5
  5. permute -> (X, Y, Z); aspect-preserving resize so min(X, Y) ratio fits
     256, anti-aliased trilinear (align_corners), Z resized only if > 256
  6. zero-pad to (256, 256, 256), permute -> (Z, X, Y),
     view(-1, 32, 256, 256): T=8 chunks of 32 slices.

The host side (percentiles, crop bbox, resize) runs in numpy/scipy — it is
per-sample, data-dependent-shape work that belongs on the CPU data workers,
exactly where the reference runs MONAI. The fixed-shape batch normalize path
(`normalize_volume`) is also provided as a jittable function.

Note: the reference passes mode='bilinear' to MONAI resize on a 3D volume;
the effective interpolation is trilinear with align_corners=True and
skimage-style gaussian anti-aliasing (sigma = (factor-1)/2) — reproduced
here with scipy.ndimage.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
from scipy import ndimage

from .nifti import read_nifti


def scale_intensity_range_percentiles(
    x: np.ndarray, lower: float = 0.5, upper: float = 99.5,
    b_min: float = 0.0, b_max: float = 1.0, clip: bool = True,
) -> np.ndarray:
    """MONAI ScaleIntensityRangePercentiles semantics (relative=False)."""
    a_min, a_max = np.percentile(x, [lower, upper])
    if a_max == a_min:
        out = x - a_min + b_min
    else:
        out = (x - a_min) / (a_max - a_min) * (b_max - b_min) + b_min
    if clip:
        out = np.clip(out, min(b_min, b_max), max(b_min, b_max))
    return out


def crop_foreground(x: np.ndarray, margin: int = 0) -> np.ndarray:
    """MONAI CropForeground with default select_fn (> 0): crop the bounding
    box of positive voxels over all spatial axes. x: (C, *spatial)."""
    mask = np.any(x > 0, axis=0)
    if not mask.any():
        return x
    slices = [slice(None)]
    for ax in range(mask.ndim):
        other = tuple(i for i in range(mask.ndim) if i != ax)
        proj = mask.any(axis=other)
        idx = np.where(proj)[0]
        lo = max(0, idx[0] - margin)
        hi = min(mask.shape[ax], idx[-1] + 1 + margin)
        slices.append(slice(lo, hi))
    return x[tuple(slices)]


def resize_trilinear(x: np.ndarray, out_size: Tuple[int, ...],
                     anti_aliasing: bool = True) -> np.ndarray:
    """Anti-aliased align_corners=True trilinear resize of a (*spatial,) array."""
    in_size = x.shape
    if tuple(in_size) == tuple(out_size):
        return x
    if anti_aliasing:
        factors = [i / o for i, o in zip(in_size, out_size)]
        sigma = [max(0.0, (f - 1.0) / 2.0) for f in factors]
        if any(s > 0 for s in sigma):
            x = ndimage.gaussian_filter(x, sigma=sigma, truncate=4.0)
    coords = np.meshgrid(
        *[np.linspace(0, i - 1, o) if o > 1 else np.array([(i - 1) / 2.0])
          for i, o in zip(in_size, out_size)],
        indexing="ij")
    return ndimage.map_coordinates(x, np.stack(coords), order=1,
                                   mode="nearest")


@dataclass
class AugmentConfig:
    """Training-time augmentations (u2Transform.py:38-43)."""

    rotate90_prob: float = 0.5
    flip_prob: float = 0.10
    scale_intensity: float = 0.1
    scale_prob: float = 0.5
    shift_intensity: float = 0.1
    shift_prob: float = 0.5


def apply_augmentations(x: np.ndarray, rng: np.random.Generator,
                        cfg: AugmentConfig) -> np.ndarray:
    """x: (C, Z, X, Y) — matches the reference transform ordering where
    RandRotate90 uses spatial_axes (1, 2) = (X, Y) of the (Z, X, Y) layout."""
    if rng.random() < cfg.rotate90_prob:
        k = rng.integers(1, 4)
        x = np.rot90(x, k=k, axes=(2, 3))
    for ax in (1, 2, 3):
        if rng.random() < cfg.flip_prob:
            x = np.flip(x, axis=ax)
    if rng.random() < cfg.scale_prob:
        factor = 1.0 + rng.uniform(-cfg.scale_intensity, cfg.scale_intensity)
        x = x * factor
    if rng.random() < cfg.shift_prob:
        x = x + rng.uniform(-cfg.shift_intensity, cfg.shift_intensity)
    return np.ascontiguousarray(x)


class U2VolumeTransform:
    """The u2 ingest: NIfTI path -> (T, chunk_depth, size, size) float32.

    Defaults reproduce the reference: target 256, depth 256 = 8 chunks x 32.
    """

    def __init__(self, data_type: str = "validation",
                 target_size: int = 256, chunk_depth: int = 32,
                 num_chunks: int = 8,
                 augment: Optional[AugmentConfig] = None,
                 seed: Optional[int] = None,
                 use_native: bool = True):
        self.training = data_type in ("training", "train")
        self.target_size = target_size
        self.chunk_depth = chunk_depth
        self.num_chunks = num_chunks
        self.augment = augment or AugmentConfig()
        self.rng = np.random.default_rng(seed)
        # validation path can run fully in the native C++ loader
        # (augmentations keep the training path in Python where the RNG lives)
        self.use_native = use_native and not self.training

    def __call__(self, path: str) -> np.ndarray:
        if self.use_native:
            try:
                from .. import native

                if native.native_available():
                    return native.load_and_preprocess_native(
                        path, self.target_size, self.chunk_depth,
                        self.num_chunks)
            except Exception:
                pass  # fall through to the Python path
        vol = read_nifti(path)
        return self.from_array(vol)

    def from_array(self, vol: np.ndarray) -> np.ndarray:
        """vol: (X, Y, Z) raw voxel array (nibabel layout)."""
        target = self.target_size
        depth = self.chunk_depth * self.num_chunks

        x = vol.transpose(2, 0, 1)[None]  # (1, Z, X, Y)
        x = scale_intensity_range_percentiles(x)
        x = crop_foreground(x)
        if self.training:
            x = apply_augmentations(x, self.rng, self.augment)
        x = x[0].transpose(1, 2, 0)  # (X, Y, Z)

        ratio = min(target / x.shape[0], target / x.shape[1])
        sx = int(x.shape[0] * ratio)
        sy = int(x.shape[1] * ratio)
        sz = x.shape[2] if depth >= x.shape[2] else depth
        x = resize_trilinear(x, (sx, sy, sz))

        out = np.zeros((target, target, depth), np.float32)
        out[:sx, :sy, :sz] = x
        out = out.transpose(2, 0, 1)  # (Z, X, Y)
        return out.reshape(self.num_chunks, self.chunk_depth, target, target)


# ---------------------------------------------------------------------------
# "linear" (non-u2) mode: single fixed chunk (src/utils/data_transforms.py)
# ---------------------------------------------------------------------------

def normalize_ct(x: np.ndarray) -> np.ndarray:
    """Reference src/utils/utils.py:58-80 normalize: foreground z-score then
    min-max to [0, 1]. Input (X, Y, Z); output (1, Z, X, Y)."""
    mask = x > x.mean()
    fg = x[mask]
    if fg.size:
        lo, hi = np.percentile(fg, [0.05, 99.95])
        x = np.clip(x, lo, hi)
        mean, std = fg.mean(), max(fg.std(), 1e-8)
        x = (x - mean) / std
    x = (x - x.min()) / max(x.max() - x.min(), 1e-8)
    return x.transpose(2, 0, 1)[None].astype(np.float32)


class LinearVolumeTransform:
    """Non-u2 path: normalize -> crop foreground -> resize to (32, 256, 256),
    one chunk (data_transforms.py:28-61)."""

    def __init__(self, data_type: str = "validation",
                 out_shape: Tuple[int, int, int] = (32, 256, 256)):
        self.training = data_type in ("training", "train")
        self.out_shape = out_shape
        self.rng = np.random.default_rng()

    def __call__(self, path: str) -> np.ndarray:
        vol = read_nifti(path)
        x = normalize_ct(vol)  # (1, Z, X, Y)
        x = crop_foreground(x)
        if self.training:
            x = apply_augmentations(x, self.rng, AugmentConfig())
        resized = resize_trilinear(x[0], self.out_shape, anti_aliasing=False)
        return resized[None].astype(np.float32)  # (1, 32, 256, 256)


def normalize_volume(x, lower=0.5, upper=99.5):
    """Jittable fixed-shape percentile windowing for on-device batch paths."""
    import jax.numpy as jnp

    flat = x.reshape(x.shape[0], -1)
    lo = jnp.percentile(flat, lower, axis=1, keepdims=True)
    hi = jnp.percentile(flat, upper, axis=1, keepdims=True)
    out = (flat - lo) / jnp.maximum(hi - lo, 1e-8)
    return jnp.clip(out, 0.0, 1.0).reshape(x.shape)
