"""3D promptable segmentation head (SegVol / SAM-3D capability).

TPU-native rebuild of the reference's vendored segmentation stack
(base_model_tokenizers/Llama-3.2-1B-Instruct/modeling_u2Llama.py:
ImageEncoderViT :329, PromptEncoder :684, MaskDecoder :905, Sam :1115,
SegVol :1364; Dice/BCE losses :27-67) and its LLM integration
(src/demo/demo.py:64 ``generate(..., seg_enable=True)``; '[SEG]' token +
``seg_projector`` per src/train/train_stage1.py:221,357).

Design (idiomatic flax, not a torch port):
  * ``SegImageEncoder3D`` — 3D patch-embed (strided conv as reshaped matmul)
    + standard pre-LN transformer blocks; returns a (B, Dg, Hg, Wg, C)
    feature grid (the reference uses a windowed SAM ViT; global attention
    over ≤2048 patch tokens maps better onto the MXU than 3D windowing).
  * ``PromptEncoder3D`` — text-prompt path of the reference prompt encoder:
    the projected '[SEG]' hidden state is the sparse prompt; a learned
    no-mask embedding is the dense prompt; random-Fourier 3D positional
    encoding for the image grid (SAM PositionEmbeddingRandom, :684-903).
  * ``MaskDecoder3D`` — SAM two-way transformer (token self-attn, token→image
    cross-attn, MLP, image→token cross-attn), learned mask/IoU tokens,
    two ×2 transposed-conv upscales, hypernetwork MLP; mask = hyper ·
    upscaled features (:905-1114).
  * ``SegVol3D`` — composition + trilinear upsample of logits to the input
    shape (:1364-1410).
  * ``seg_projector`` — 2-layer MLP from LLM hidden → prompt dim (the
    checkpoint layout model.seg_projector.{0,2}, src/demo/demo_show.ipynb).

Training uses ``seg_loss`` = BCE + soft Dice (modeling_u2Llama.py:27-67).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import SegConfig
from ..ops.attention import sdpa

Dtype = Any


class SegImageEncoder3D(nn.Module):
    cfg: SegConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        """(B, 1, D, H, W) -> (B, Dg, Hg, Wg, C) feature grid."""
        cfg = self.cfg
        b = image.shape[0]
        pd, ph, pw = cfg.patch_size
        dg, hg, wg = cfg.feat_shape
        # patch embed as a reshaped matmul (MXU-friendly, no conv lowering)
        x = image.reshape(b, 1, dg, pd, hg, ph, wg, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b, dg * hg * wg, pd * ph * pw)
        x = nn.Dense(cfg.encoder_dim, dtype=self.dtype, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, dg * hg * wg, cfg.encoder_dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        for i in range(cfg.encoder_layers):
            y = nn.LayerNorm(dtype=self.dtype, name=f"norm1_{i}")(x)
            qkv = nn.Dense(3 * cfg.encoder_dim, dtype=self.dtype,
                           name=f"qkv_{i}")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            hd = cfg.encoder_dim // cfg.encoder_heads
            shape = (b, -1, cfg.encoder_heads, hd)
            o = sdpa(q.reshape(shape), k.reshape(shape), v.reshape(shape))
            o = o.reshape(b, -1, cfg.encoder_dim)
            x = x + nn.Dense(cfg.encoder_dim, dtype=self.dtype,
                             name=f"attn_out_{i}")(o)
            y = nn.LayerNorm(dtype=self.dtype, name=f"norm2_{i}")(x)
            h = nn.Dense(cfg.encoder_dim * 4, dtype=self.dtype,
                         name=f"mlp1_{i}")(y)
            x = x + nn.Dense(cfg.encoder_dim, dtype=self.dtype,
                             name=f"mlp2_{i}")(nn.gelu(h))
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.cfg.prompt_dim, dtype=self.dtype, name="neck")(x)
        return x.reshape(b, dg, hg, wg, self.cfg.prompt_dim)


class PromptEncoder3D(nn.Module):
    """Text-prompt encoder + 3D random-Fourier dense positional encoding."""

    cfg: SegConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0),
            (3, self.cfg.prompt_dim // 2), jnp.float32)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(0.02),
            (1, self.cfg.prompt_dim), jnp.float32)
        self.text_proj = nn.Dense(self.cfg.prompt_dim, dtype=self.dtype,
                                  name="text_proj")

    def _fourier(self, coords: jnp.ndarray) -> jnp.ndarray:
        """[0,1] coords (..., 3) -> (..., prompt_dim) sin/cos features."""
        proj = (2.0 * coords - 1.0) @ self.pe_gaussian.astype(coords.dtype)
        proj = 2.0 * jnp.pi * proj
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def dense_pe(self) -> jnp.ndarray:
        """(1, Dg*Hg*Wg, prompt_dim) positional encoding of the feature grid."""
        dg, hg, wg = self.cfg.feat_shape
        d = (jnp.arange(dg, dtype=jnp.float32) + 0.5) / dg
        h = (jnp.arange(hg, dtype=jnp.float32) + 0.5) / hg
        w = (jnp.arange(wg, dtype=jnp.float32) + 0.5) / wg
        grid = jnp.stack(jnp.meshgrid(d, h, w, indexing="ij"), axis=-1)
        return self._fourier(grid.reshape(1, -1, 3)).astype(self.dtype)

    def __call__(self, text_embedding: Optional[jnp.ndarray], batch: int):
        """-> (sparse (B, n, prompt_dim), dense (B, Dg*Hg*Wg, prompt_dim))."""
        dg, hg, wg = self.cfg.feat_shape
        if text_embedding is None:
            sparse = jnp.zeros((batch, 0, self.cfg.prompt_dim), self.dtype)
        else:
            sparse = self.text_proj(text_embedding.astype(self.dtype))
            if sparse.ndim == 2:
                sparse = sparse[:, None, :]
        dense = jnp.broadcast_to(
            self.no_mask_embed.astype(self.dtype)[None],
            (batch, dg * hg * wg, self.cfg.prompt_dim))
        return sparse, dense


class _Attention(nn.Module):
    dim: int
    heads: int
    downsample: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        hd = inner // self.heads
        b = q.shape[0]
        proj = lambda x, n: nn.Dense(inner, dtype=self.dtype, name=n)(x)
        qh = proj(q, "q_proj").reshape(b, -1, self.heads, hd)
        kh = proj(k, "k_proj").reshape(b, -1, self.heads, hd)
        vh = proj(v, "v_proj").reshape(b, -1, self.heads, hd)
        o = sdpa(qh, kh, vh).reshape(b, -1, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(o)


class TwoWayBlock(nn.Module):
    cfg: SegConfig
    skip_first_pe: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, image, token_pe, image_pe):
        c = self.cfg
        # token self-attention
        q = tokens if self.skip_first_pe else tokens + token_pe
        tokens = tokens + _Attention(c.prompt_dim, c.decoder_heads,
                                     dtype=self.dtype, name="self_attn")(q, q, tokens)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm1")(tokens)
        # token -> image cross-attention
        q = tokens + token_pe
        k = image + image_pe
        tokens = tokens + _Attention(c.prompt_dim, c.decoder_heads, 2,
                                     dtype=self.dtype,
                                     name="cross_t2i")(q, k, image)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm2")(tokens)
        # MLP
        h = nn.Dense(c.prompt_dim * 4, dtype=self.dtype, name="mlp1")(tokens)
        tokens = tokens + nn.Dense(c.prompt_dim, dtype=self.dtype,
                                   name="mlp2")(nn.relu(h))
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm3")(tokens)
        # image -> token cross-attention
        q = tokens + token_pe
        image = image + _Attention(c.prompt_dim, c.decoder_heads, 2,
                                   dtype=self.dtype,
                                   name="cross_i2t")(image + image_pe, q, tokens)
        image = nn.LayerNorm(dtype=self.dtype, name="norm4")(image)
        return tokens, image


class MaskDecoder3D(nn.Module):
    cfg: SegConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_emb, image_pe, sparse, dense):
        """image_emb/dense: (B, N, C); -> (mask logits (B,1,Dg*2²,...), iou)."""
        c = self.cfg
        b = image_emb.shape[0]
        iou_token = self.param("iou_token", nn.initializers.normal(0.02),
                               (1, 1, c.prompt_dim), jnp.float32)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, c.prompt_dim), jnp.float32)
        out_tokens = jnp.concatenate([
            jnp.broadcast_to(iou_token.astype(self.dtype), (b, 1, c.prompt_dim)),
            jnp.broadcast_to(mask_token.astype(self.dtype), (b, 1, c.prompt_dim)),
        ], axis=1)
        tokens = jnp.concatenate([out_tokens, sparse], axis=1)
        token_pe = tokens  # SAM uses the initial tokens as their own PE
        image = image_emb + dense
        pe = jnp.broadcast_to(image_pe, image.shape)

        for i in range(c.decoder_layers):
            tokens, image = TwoWayBlock(c, skip_first_pe=(i == 0),
                                        dtype=self.dtype,
                                        name=f"block_{i}")(tokens, image,
                                                           token_pe, pe)
        # final token -> image attention
        q = tokens + token_pe
        tokens = tokens + _Attention(c.prompt_dim, c.decoder_heads, 2,
                                     dtype=self.dtype,
                                     name="final_t2i")(q, image + pe, image)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm_final")(tokens)

        iou_pred = nn.Dense(1, dtype=self.dtype, name="iou_head")(tokens[:, 0])
        mask_tok = tokens[:, 1]

        # upscale the image features 2x2x2 twice (transposed conv)
        dg, hg, wg = c.feat_shape
        x = image.reshape(b, dg, hg, wg, c.prompt_dim)
        x = nn.ConvTranspose(c.prompt_dim // 4, (2, 2, 2), (2, 2, 2),
                             dtype=self.dtype, name="up1")(x)
        x = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="up_norm")(x))
        x = nn.ConvTranspose(c.prompt_dim // 8, (2, 2, 2), (2, 2, 2),
                             dtype=self.dtype, name="up2")(x)
        x = nn.gelu(x)

        # hypernetwork: mask token -> per-channel weights
        h = mask_tok
        for i in range(2):
            h = nn.relu(nn.Dense(c.prompt_dim, dtype=self.dtype,
                                 name=f"hyper_{i}")(h))
        h = nn.Dense(c.prompt_dim // 8, dtype=self.dtype, name="hyper_out")(h)
        logits = jnp.einsum("bdhwc,bc->bdhw", x, h)[:, None]
        return logits, iou_pred


def trilinear_resize(x: jnp.ndarray, size: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, 1, D, H, W) -> (B, 1, *size) trilinear (F.interpolate parity)."""
    b, ch = x.shape[:2]
    out = jax.image.resize(x.reshape(b * ch, *x.shape[2:]),
                           (b * ch, *size), method="trilinear")
    return out.reshape(b, ch, *size)


class SegVol3D(nn.Module):
    """Full promptable segmentation pipeline (modeling_u2Llama.py:1364-1410)."""

    cfg: SegConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.image_encoder = SegImageEncoder3D(self.cfg, self.dtype,
                                               name="image_encoder")
        self.prompt_encoder = PromptEncoder3D(self.cfg, self.dtype,
                                              name="prompt_encoder")
        self.mask_decoder = MaskDecoder3D(self.cfg, self.dtype,
                                          name="mask_decoder")

    def __call__(self, image: jnp.ndarray,
                 text_embedding: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(B, 1, D, H, W) + optional (B, E_seg) prompt -> (B, 1, D, H, W)
        mask logits."""
        b = image.shape[0]
        img_shape = image.shape[2:]
        feats = self.image_encoder(image)
        feats = feats.reshape(b, -1, self.cfg.prompt_dim)
        sparse, dense = self.prompt_encoder(text_embedding, b)
        image_pe = self.prompt_encoder.dense_pe()
        low_res, _ = self.mask_decoder(feats, image_pe, sparse, dense)
        return trilinear_resize(low_res, img_shape)


class SegProjector(nn.Module):
    """LLM '[SEG]' hidden state -> seg text prompt (2-layer MLP; checkpoint
    layout model.seg_projector.{0,2} per src/demo/demo_show.ipynb)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(hidden)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(nn.gelu(h))


# ---------------------------------------------------------------------------
# losses (modeling_u2Llama.py:27-67 BinaryDiceLoss / BCELoss semantics)
# ---------------------------------------------------------------------------

def dice_loss(logits: jnp.ndarray, target: jnp.ndarray,
              smooth: float = 1.0) -> jnp.ndarray:
    """Soft binary Dice over sigmoid(logits); mean over batch."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(logits.shape[0], -1)
    t = target.astype(jnp.float32).reshape(target.shape[0], -1)
    num = 2.0 * jnp.sum(p * t, axis=-1) + smooth
    den = jnp.sum(p * p, axis=-1) + jnp.sum(t * t, axis=-1) + smooth
    return jnp.mean(1.0 - num / den)


def bce_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    z = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return jnp.mean(jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z))))


def seg_loss(logits: jnp.ndarray, target: jnp.ndarray,
             bce_weight: float = 1.0, dice_weight: float = 1.0) -> jnp.ndarray:
    return bce_weight * bce_loss(logits, target) + \
        dice_weight * dice_loss(logits, target)
