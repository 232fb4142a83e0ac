"""3D Vision Transformer tower.

TPU-native reimplementation of the reference's MONAI-derived ViT
(src/model/multimodal_encoder/vit.py:22-176): perceptron patch embedding
(flattened-patch linear projection + learned position embeddings), a zero-init
cls token, ``num_layers`` pre-LN transformer blocks, and a final LayerNorm.
The patch embedding is a single reshaped matmul — the MXU-friendly form of
the reference's Rearrange+Linear.

Geometry parity note: the reference declares img_size (256, 256, 32) /
patch (4, 16, 16) but feeds tensors shaped (B, 1, 32, 256, 256); the runtime
patch grid is (8, 16, 16) = 2048 patches, which equals the declared product.
We patchify the runtime (D, H, W) axes in that order with feature layout
(pd, ph, pw, c), matching MONAI's "b c (h p1) (w p2) (d p3) ->
b (h w d) (p1 p2 p3 c)" rearrange at runtime.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import VisionConfig
from ..ops.attention import sdpa
from ..ops.flash_attention import flash_attention

Dtype = Any


class PatchEmbed3D(nn.Module):
    """Perceptron-mode patch embedding (MONAI PatchEmbeddingBlock)."""

    cfg: VisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, C, D, H, W); patch grid row-major over (D, H, W) with
        # features ordered (pd, ph, pw, c) as in the reference rearrange.
        b, c, d, h, w = x.shape
        pd, ph, pw = self.cfg.patch_size
        gd, gh, gw = d // pd, h // ph, w // pw
        y = _ConvProj(self.cfg.hidden_size, self.cfg.patch_size, c,
                      self.dtype, name="proj")(x)
        y = y.reshape(b, gd * gh * gw, self.cfg.hidden_size)
        pos = self.param(
            "position_embeddings",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0),
            (1, gd * gh * gw, self.cfg.hidden_size), jnp.float32)
        return y + pos.astype(y.dtype)


class _ConvProj(nn.Module):
    """Patch projection with Dense-layout params, conv lowering.

    Params keep the flattened (pd*ph*pw*c, F) 'kernel' (+'bias') layout —
    the M3D-CLIP weight-converter contract (hf_weights.convert_vit) — but
    the contraction runs as a strided conv: the naive 8-D reshape+transpose
    materializes a (B, gd, pd, gh, ph, gw, pw, C) temp whose 16-wide minor
    dims tile-pad 8x on TPU (measured: a 16 GB temp at 512 chunks, the B64
    serving OOM); XLA lowers the conv with no such temp.
    """

    features: int
    patch: Any
    in_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pd, ph, pw = self.patch
        flat = pd * ph * pw * self.in_channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (flat, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # flattened feature index = ((ipd*ph + iph)*pw + ipw)*c + ic, so the
        # conv rhs is the kernel reshaped to (pd, ph, pw, c, F) verbatim.
        k = kernel.astype(self.dtype).reshape(
            pd, ph, pw, self.in_channels, self.features)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, window_strides=(pd, ph, pw),
            padding="VALID", dimension_numbers=("NCDHW", "DHWIO", "NDHWC"))
        return y + bias.astype(self.dtype)


class SelfAttentionBlock(nn.Module):
    """MONAI SABlock: fused qkv projection, per-head SDPA, output proj."""

    hidden_size: int
    num_heads: int
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, s, e = x.shape
        head_dim = self.hidden_size // self.num_heads
        qkv = nn.Dense(3 * self.hidden_size, use_bias=self.qkv_bias,
                       dtype=self.dtype, name="qkv")(x)
        # feature layout (qkv, heads, head_dim) — qkv-major, matching MONAI's
        # "b h (qkv l d) -> qkv b l h d" rearrange. Slice instead of a 5-D
        # reshape: the (B, S, 3, H, 64) intermediate tiles terribly on TPU
        # (64-lane padding doubles it — a 4.5 GB temp at 256 chunks).
        e3 = self.hidden_size
        q = qkv[..., :e3].reshape(b, s, self.num_heads, head_dim)
        k = qkv[..., e3:2 * e3].reshape(b, s, self.num_heads, head_dim)
        v = qkv[..., 2 * e3:].reshape(b, s, self.num_heads, head_dim)
        if self.use_flash and jax.default_backend() == "tpu":
            out = flash_attention(q, k, v, block_q=512).reshape(b, s, e)
        else:
            out = sdpa(q, k, v).reshape(b, s, e)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="out_proj")(out)


class TransformerBlock(nn.Module):
    """Pre-LN block: x += attn(LN(x)); x += mlp(LN(x))."""

    hidden_size: int
    mlp_dim: int
    num_heads: int
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + SelfAttentionBlock(self.hidden_size, self.num_heads,
                                   self.qkv_bias, self.dtype,
                                   self.use_flash, name="attn")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class ViT3D(nn.Module):
    """Full ViT returning (final_normed, all_hidden_states) (vit.py:114-126)."""

    cfg: VisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = PatchEmbed3D(self.cfg, self.dtype, name="patch_embedding")(x)
        if self.cfg.classification:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.cfg.hidden_size), jnp.float32)
            cls = jnp.broadcast_to(cls.astype(x.dtype),
                                   (x.shape[0], 1, self.cfg.hidden_size))
            x = jnp.concatenate([cls, x], axis=1)
        hidden_states = []
        for i in range(self.cfg.num_layers):
            x = TransformerBlock(
                self.cfg.hidden_size, self.cfg.mlp_dim, self.cfg.num_heads,
                self.cfg.qkv_bias, self.dtype,
                self.cfg.use_flash_attention, name=f"blocks_{i}")(x)
            hidden_states.append(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x, hidden_states


class ViT3DTower(nn.Module):
    """Feature-selecting wrapper (vit.py:131-176): picks the output layer and
    strips the cls token for select_feature='patch'."""

    cfg: VisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        last, hidden = ViT3D(self.cfg, self.dtype, name="vision_tower")(images)
        if self.cfg.select_layer == -1:
            feats = last
        elif self.cfg.select_layer < -1:
            # Reference vit.py:152 indexes hidden_states with select_feature
            # (a string) — an upstream bug on an untested path; we implement
            # the evident intent.
            feats = hidden[self.cfg.select_layer]
        else:
            raise ValueError(f"Unexpected select layer: {self.cfg.select_layer}")
        if self.cfg.select_feature == "patch":
            if self.cfg.classification:
                feats = feats[:, 1:]
        elif self.cfg.select_feature != "cls_patch":
            raise ValueError(f"Unexpected select feature: {self.cfg.select_feature}")
        return feats
