"""Multimodal projectors.

Reference: src/model/multimodal_projector/. The production path is the
SpatialPoolingProjector ('spp', spatial_pooling_projector.py:7-58): 2048 patch
tokens → declared-grid 3D average pool → 256 tokens → linear/mlp stack
mm_hidden → llm_hidden. 'linear' (FullLinear, builder.py:68-77) and
'identity' (builder.py:4-11) alternatives are kept for parity.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import ProjectorConfig, VisionConfig
from ..ops.pooling import sequence_pool, spatial_pool_3d

Dtype = Any


class SpatialPoolingProjector(nn.Module):
    cfg: ProjectorConfig
    grid_pre: Tuple[int, int, int]
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.pooling_type == "spatial":
            x = spatial_pool_3d(x, self.grid_pre, self.cfg.pooling_size)
        elif self.cfg.pooling_type == "sequence":
            x = sequence_pool(x, self.cfg.pooling_size)
        else:
            raise ValueError(f"Unknown pooling type: {self.cfg.pooling_type}")

        depth = int(self.cfg.layer_num)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="projector_0")(x)
        for i in range(1, depth):
            if self.cfg.layer_type == "mlp":
                x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.out_dim, dtype=self.dtype, name=f"projector_{i}")(x)
        return x


class FullLinear(nn.Module):
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear")(x)


def build_projector(cfg: ProjectorConfig, vision: VisionConfig, out_dim: int,
                    dtype=jnp.float32, name: str = "mm_projector") -> nn.Module:
    if cfg.projector_type == "spp":
        return SpatialPoolingProjector(
            cfg, cfg.grid_pre(vision.image_size, vision.patch_size),
            out_dim, dtype, name=name)
    if cfg.projector_type == "linear":
        return FullLinear(out_dim, dtype, name=name)
    if cfg.projector_type == "identity":
        return None
    raise ValueError(f"Unknown projector type: {cfg.projector_type}")
