"""μ²LLM: the full multimodal causal LM.

Composes the 3D ViT tower, the spatial-pooling projector, the μ²tokenizer and
the decoder. Mirrors the reference meta-architecture
(src/model/u2_arch.py:80-117 u2MetaForCausalLM):

  * ``encode_images``: ViT3D per depth-chunk -> SPP projector (u2_arch.py:91-94).
  * μ² path: (B, T, D, H, W) volume -> (B·T, 1, D, H, W) chunk batch ->
    per-chunk 256 projected tokens -> (B, T, 256, E) -> μ²tokenizer with the
    question-token embeddings as text condition (u2_arch.py:105-110).
  * Splice contract (u2_arch.py:115-116): inputs_embeds =
    concat(embeds[:, :1], image_features, embeds[:, 1 + n_img:]). This is the
    byte-level parity contract with the reference — the image features
    overwrite embedding rows [1, 1+n_img) regardless of token content.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import U2ModelConfig
from .llm.decoder import CausalLM, KVCache
from .projector import build_projector
from .u2tok.u2tokenizer import U2Tokenizer
from .vit3d import ViT3DTower

Dtype = Any


def causal_padding_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, S) {0,1} -> bool (B, 1, S, S) causal mask with padded keys removed."""
    b, s = attention_mask.shape
    causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]
    key_ok = attention_mask[:, None, None, :].astype(bool)
    return causal & key_ok


class U2CausalLM(nn.Module):
    cfg: U2ModelConfig
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    def setup(self):
        self.vision_tower = ViT3DTower(self.cfg.vision, self.dtype,
                                       name="vision_tower")
        self.mm_projector = build_projector(
            self.cfg.projector, self.cfg.vision, self.cfg.llm.hidden_size,
            self.dtype, name="mm_projector")
        if self.cfg.u2t.enable:
            self.u2tokenizer = U2Tokenizer(
                self.cfg.llm.hidden_size, self.cfg.u2t, self.dtype,
                name="u2tokenizer")
        self.llm = CausalLM(self.cfg.llm, self.dtype, self.remat, name="llm")
        if self.cfg.seg.enable:
            from .seg import SegProjector, SegVol3D

            self.seg_module = SegVol3D(self.cfg.seg, self.dtype,
                                       name="seg_module")
            self.seg_projector = SegProjector(self.cfg.seg.prompt_dim,
                                              self.dtype,
                                              name="seg_projector")

    # --- vision ---

    def encode_images(self, images: jnp.ndarray) -> jnp.ndarray:
        """(N, 1, D, H, W) -> (N, proj_out_num, llm_hidden)."""
        feats = self.vision_tower(images)
        if self.mm_projector is not None:
            feats = self.mm_projector(feats)
        return feats

    def encode_vision(self, images: jnp.ndarray,
                      question_ids: Optional[jnp.ndarray]) -> jnp.ndarray:
        """(B, T, D, H, W) volume chunks -> (B, n_img, llm_hidden) image tokens."""
        b, t = images.shape[:2]
        chunks = images.reshape(b * t, 1, *images.shape[2:])
        feats = self.encode_images(chunks)
        return self.fuse_vision(
            feats.reshape(b, t, feats.shape[-2], feats.shape[-1]),
            question_ids)

    def fuse_vision(self, v_tokens: jnp.ndarray,
                    question_ids: Optional[jnp.ndarray]) -> jnp.ndarray:
        """(B, T, N, E) per-chunk projected features -> (B, n_img, E) image
        tokens (μ²tokenizer fuse or flat concat). Split out from
        encode_vision so callers can microbatch the chunk encode
        (generate._microbatched_embeds)."""
        from ..parallel.mesh import batch_sharded_activation

        b, t = v_tokens.shape[:2]
        if self.cfg.u2t.enable:
            t_tokens = self.llm.embed_tokens(question_ids)
            # Pin the fuse activations batch-sharded: embed_tokens' output
            # otherwise carries the decoder's tensor-sharded layout into the
            # TTA, and SPMD resolves the conflict with an involuntary full
            # rematerialization every step (no-op without an activation
            # mesh — see parallel.mesh.activation_mesh).
            t_tokens = batch_sharded_activation(t_tokens)
            v_tokens = batch_sharded_activation(v_tokens)
            return batch_sharded_activation(
                self.u2tokenizer(v_tokens, t_tokens))
        return v_tokens.reshape(b, t * v_tokens.shape[-2], v_tokens.shape[-1])

    def splice_embeds(self, input_ids: jnp.ndarray,
                      image_features: jnp.ndarray) -> jnp.ndarray:
        """Splice precomputed image tokens into the prompt embeddings
        (the u2_arch.py:115-116 contract)."""
        embeds = self.llm.embed_tokens(input_ids)
        img = image_features.astype(embeds.dtype)
        n = img.shape[1]
        return jnp.concatenate([embeds[:, :1], img, embeds[:, 1 + n:]], axis=1)

    # --- multimodal splice ---

    def prepare_inputs_embeds(self, input_ids: jnp.ndarray,
                              images: Optional[jnp.ndarray],
                              question_ids: Optional[jnp.ndarray]) -> jnp.ndarray:
        if images is None:
            return self.llm.embed_tokens(input_ids)
        return self.splice_embeds(
            input_ids, self.encode_vision(images, question_ids))

    # --- forward ---

    def __call__(
        self,
        input_ids: jnp.ndarray,                 # (B, S)
        images: Optional[jnp.ndarray] = None,   # (B, T, D, H, W)
        question_ids: Optional[jnp.ndarray] = None,  # (B, Sq)
        attention_mask: Optional[jnp.ndarray] = None,  # (B, S)
        cache: Optional[KVCache] = None,
        write_index: Optional[jax.Array] = None,
    ):
        embeds = self.prepare_inputs_embeds(input_ids, images, question_ids)
        return self.forward_embeds(embeds, attention_mask, cache, write_index)

    def forward_embeds(self, inputs_embeds, attention_mask=None, cache=None,
                       write_index=None, positions=None, mask=None, lens=None,
                       compute_logits=True):
        b, s, _ = inputs_embeds.shape
        if attention_mask is None and mask is None:
            attention_mask = jnp.ones((b, s), dtype=jnp.int32)
        if mask is None:
            mask = causal_padding_mask(attention_mask)
            if lens is None and attention_mask is not None:
                # batches are right-padded framework-wide; lens routes the
                # prefill through the Pallas flash kernel
                lens = attention_mask.sum(-1).astype(jnp.int32)
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        return self.llm(inputs_embeds, positions, mask, cache, write_index,
                        lens, compute_logits)

    def encode_vision_with_attention(self, images: jnp.ndarray,
                                     question_ids: jnp.ndarray) -> jnp.ndarray:
        """encode_vision with μ²tokenizer attention capture enabled: call via
        ``apply(..., mutable=["intermediates"], method=
        "encode_vision_with_attention")`` and read the sown softmax maps
        (the reference's return_attn demo paths, svr.py:50-62,
        tta.py:126-140)."""
        b, t = images.shape[:2]
        chunks = images.reshape(b * t, 1, *images.shape[2:])
        feats = self.encode_images(chunks)
        v_tokens = feats.reshape(b, t, feats.shape[-2], feats.shape[-1])
        t_tokens = self.llm.embed_tokens(question_ids)
        return self.u2tokenizer(v_tokens, t_tokens, capture_attention=True)

    # --- exposed submodule entry points (for apply(..., method=...)) ---

    def embed_tokens(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.llm.embed_tokens(input_ids)

    def decode_step(self, token_embeds, positions, mask, cache, write_index,
                    decode_bounds=None, prefix_cache=None, prefix_mask=None,
                    compute_logits=True):
        """One decode step: (B, 1, E) embeds against the full cache (or,
        with ``prefix_cache``, against a case-shared prompt prefix plus the
        per-row suffix cache — fan-out decoding, generate.make_fanout_*)."""
        return self.llm(token_embeds, positions, mask, cache, write_index,
                        decode_bounds=decode_bounds,
                        prefix_cache=prefix_cache, prefix_mask=prefix_mask,
                        compute_logits=compute_logits)

    def lm_logits(self, hidden):
        return self.llm.lm_logits(hidden)

    def forward_seg(self, input_ids, images, question_ids, seg_image,
                    seg_positions, attention_mask=None):
        """LM forward + mask logits from the '[SEG]' hidden states.

        seg_positions: (B,) index of the [SEG] token per row (training: from
        the labels; inference: from the generated ids). Serves as the init
        target for models with cfg.seg.enable and as the joint-training
        forward (LM CE + BCE/Dice, train_stage1.py seg_enable collator)."""
        logits, hidden, _ = self(input_ids, images, question_ids,
                                 attention_mask)
        seg_hidden = jnp.take_along_axis(
            hidden, seg_positions[:, None, None], axis=1)[:, 0]
        masks = self.segment(seg_image, seg_hidden)
        return logits, masks

    def segment(self, seg_image: jnp.ndarray,
                seg_hidden: Optional[jnp.ndarray]) -> jnp.ndarray:
        """(B, 1, D, H, W) volume + (B, llm_hidden) '[SEG]' hidden state ->
        (B, 1, D, H, W) mask logits (generate(..., seg_enable=True) parity,
        src/demo/demo.py:64)."""
        prompt = None
        if seg_hidden is not None:
            prompt = self.seg_projector(seg_hidden)
        return self.seg_module(seg_image, prompt)
