"""trust_remote_code package emission.

``save_trust_remote_code_package`` writes a fully self-contained HF
checkpoint directory: weights + config (via hf_export.save_hf_checkpoint)
plus ``configuration_u2.py`` and ``modeling_u2.py`` so a plain torch stack
loads it with ``AutoModelForCausalLM.from_pretrained(trust_remote_code=True)``
— the portability property of the reference's released checkpoints
(base_model_tokenizers/*/modeling_u2Llama.py; SURVEY §2.8). The emitted
modeling code is an original torch implementation mirroring THIS framework's
semantics and the exported state-dict naming, not a copy of the reference's
vendored files; cross-stack logits parity is tested in
tests/test_remote_code.py (flax forward == emitted torch module forward).

Scope: the μ² multimodal path (3D ViT + SPP projector + μ²tokenizer splice)
on Qwen3/Llama backbones with the ``attn_type`` flavor ('rma'/'rope'/
'vanilla'); segmentation weights are exported but the torch module is
text+vision only.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

from ..config import U2ModelConfig
from .hf_export import save_hf_checkpoint

CONFIGURATION_TEMPLATE = '''"""u2 model configuration (emitted by u2tokenizer_tpu.models.remote_code)."""

from transformers import {base_config} as _BaseConfig


class u2Config(_BaseConfig):
    model_type = "{model_type}"

    def __init__(self, **kwargs):
        for key, default in [
            ("image_channel", 1), ("image_size", None), ("patch_size", None),
            ("vision_tower", "vit3d"), ("vision_select_layer", -1),
            ("vision_select_feature", "patch"), ("mm_hidden_size", 768),
            ("mm_projector_type", "spp"), ("proj_layer_type", "mlp"),
            ("proj_layer_num", 2), ("proj_pooling_type", "spatial"),
            ("proj_pooling_size", 2), ("enable_u2tokenizer", True),
            ("u2t_num_heads", 8), ("u2t_num_layers", 4), ("u2t_top_k", 1024),
            ("use_multi_scale", True), ("num_3d_query_token", 256),
            ("attn_type", "rma"), ("enable_diffts", False),
            ("enable_dmtp", False), ("u2t_max_seq_len", 512),
        ]:
            setattr(self, key, kwargs.pop(key, default))
        super().__init__(**kwargs)
'''


MODELING_TEMPLATE = '''"""u2 multimodal model (emitted by u2tokenizer_tpu.models.remote_code).

Original torch implementation of the mu^2 architecture matching the exported
state-dict naming: 3D ViT tower -> spatial-pooling projector -> mu^2tokenizer
(SVR + token selection + multi-scale pooling + TTA) -> token splice into a
{family} decoder.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F
from transformers import {base_model} as _BaseForCausalLM
from transformers import {base_inner} as _BaseModel

from .configuration_u2 import u2Config


# --------------------------- attention primitives ---------------------------

class RelativeMultiheadAttention(nn.Module):
    """MHA with a learned relative-position bias table (batch-first)."""

    def __init__(self, d_model, num_heads, max_seq_len=512):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = d_model // num_heads
        self.wq = nn.Linear(d_model, d_model)
        self.wk = nn.Linear(d_model, d_model)
        self.wv = nn.Linear(d_model, d_model)
        self.dense = nn.Linear(d_model, d_model)
        self.max_seq_len = max_seq_len
        self.relative_bias = nn.Parameter(
            torch.zeros(2 * max_seq_len - 1, num_heads))

    def _split(self, x):
        b, s, _ = x.shape
        return x.view(b, s, self.num_heads, self.head_dim).transpose(1, 2)

    def forward(self, query, key, value, is_compress=False):
        b, sq, _ = query.shape
        q = self._split(self.wq(query))
        k = self._split(self.wk(key))
        v = (value.view(b, -1, self.num_heads, self.head_dim).transpose(1, 2)
             if is_compress else self._split(self.wv(value)))
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.head_dim)
        pos = torch.arange(sq, device=query.device)
        rel = pos[None, :] - pos[:, None] + self.max_seq_len - 1
        bias = self.relative_bias[rel]                   # (S, S, H)
        scores = scores + bias.permute(2, 0, 1)[None]
        probs = torch.softmax(scores.float(), dim=-1).to(q.dtype)
        out = (probs @ v).transpose(1, 2).reshape(b, sq, -1)
        if is_compress:
            return out
        return self.dense(out)


class RotaryMultiheadAttention(nn.Module):
    """MHA with rotary position embeddings (batch-first, theta 10000)."""

    def __init__(self, d_model, num_heads, max_seq_len=512, theta=10000.0):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = d_model // num_heads
        self.theta = theta
        self.wq = nn.Linear(d_model, d_model)
        self.wk = nn.Linear(d_model, d_model)
        self.wv = nn.Linear(d_model, d_model)
        self.dense = nn.Linear(d_model, d_model)

    def _rope(self, x, seq_len):
        half = self.head_dim // 2
        inv = 1.0 / (self.theta ** (torch.arange(
            half, dtype=torch.float32, device=x.device) / half))
        freqs = torch.arange(seq_len, device=x.device,
                             dtype=torch.float32)[:, None] * inv
        emb = torch.cat([freqs, freqs], dim=-1)
        cos, sin = emb.cos().to(x.dtype), emb.sin().to(x.dtype)
        x1, x2 = x[..., :half], x[..., half:]
        rot = torch.cat([-x2, x1], dim=-1)
        return x * cos[None, None] + rot * sin[None, None]

    def forward(self, query, key, value):
        b, sq, _ = query.shape
        split = lambda t: t.view(b, -1, self.num_heads,
                                 self.head_dim).transpose(1, 2)
        q = self._rope(split(self.wq(query)), sq)
        k = self._rope(split(self.wk(key)), key.shape[1])
        v = split(self.wv(value))
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.head_dim)
        probs = torch.softmax(scores.float(), dim=-1).to(q.dtype)
        out = (probs @ v).transpose(1, 2).reshape(b, sq, -1)
        return self.dense(out)


class VanillaMultiheadAttention(nn.Module):
    """Plain batch-first MHA with the wq/wk/wv/dense layout."""

    def __init__(self, d_model, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = d_model // num_heads
        self.wq = nn.Linear(d_model, d_model)
        self.wk = nn.Linear(d_model, d_model)
        self.wv = nn.Linear(d_model, d_model)
        self.dense = nn.Linear(d_model, d_model)

    def forward(self, query, key, value):
        b, sq, _ = query.shape
        split = lambda t: t.view(b, -1, self.num_heads,
                                 self.head_dim).transpose(1, 2)
        q, k, v = split(self.wq(query)), split(self.wk(key)), split(self.wv(value))
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.head_dim)
        probs = torch.softmax(scores.float(), dim=-1).to(q.dtype)
        out = (probs @ v).transpose(1, 2).reshape(b, sq, -1)
        return self.dense(out)


class MultiHeadCrossAttention(nn.Module):
    """Cross attention; is_compress skips W_v and the output projection."""

    def __init__(self, d_model, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = d_model // num_heads
        self.wq = nn.Linear(d_model, d_model)
        self.wk = nn.Linear(d_model, d_model)
        self.wv = nn.Linear(d_model, d_model)
        self.dense = nn.Linear(d_model, d_model)

    def forward(self, query, value, is_compress=False):
        b, sq, _ = query.shape
        split = lambda t: t.view(b, -1, self.num_heads,
                                 self.head_dim).transpose(1, 2)
        q, k = split(self.wq(query)), split(self.wk(value))
        v = split(value) if is_compress else split(self.wv(value))
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.head_dim)
        probs = torch.softmax(scores.float(), dim=-1).to(q.dtype)
        out = (probs @ v).transpose(1, 2).reshape(b, sq, -1)
        if is_compress:
            return out
        return self.dense(out)


def _make_self_attention(attn_type, d_model, num_heads, max_seq_len=512):
    if attn_type == "rma":
        return RelativeMultiheadAttention(d_model, num_heads, max_seq_len)
    if attn_type == "rope":
        return RotaryMultiheadAttention(d_model, num_heads, max_seq_len)
    return VanillaMultiheadAttention(d_model, num_heads)


# ------------------------------- mu^2tokenizer -------------------------------

class SpatioTemporalAttentionLayer(nn.Module):
    def __init__(self, embed_size, num_heads, attn_type, max_seq_len=512):
        super().__init__()
        self.spatial_attention = _make_self_attention(
            attn_type, embed_size, num_heads, max_seq_len)
        self.temporal_attention = _make_self_attention(
            attn_type, embed_size, num_heads, max_seq_len)

    def forward(self, x):
        b, t, n, e = x.shape
        xs = x.reshape(b * t, n, e)
        xs = self.spatial_attention(xs, xs, xs)
        x = xs.reshape(b, t, n, e)
        xt = x.permute(0, 2, 1, 3).reshape(b * n, t, e)
        xt = self.temporal_attention(xt, xt, xt)
        return xt.reshape(b, n, t, e).permute(0, 2, 1, 3)


class TokenSelection(nn.Module):
    def __init__(self, embed_size, top_k):
        super().__init__()
        self.score_net = nn.Linear(embed_size, 1)
        self.top_k = top_k

    def forward(self, x):
        b, t, n, e = x.shape
        scores = self.score_net(x).reshape(b, t * n)
        flat = x.reshape(b, t * n, e)
        _, idx = torch.topk(scores, self.top_k, dim=1)
        return torch.gather(flat, 1, idx[..., None].expand(-1, -1, e))


class DifferentiableTokenSelection(nn.Module):
    def __init__(self, embed_size, top_k, tau=1.0):
        super().__init__()
        self.score_net = nn.Linear(embed_size, top_k)
        self.tau = tau

    def forward(self, x):
        b, t, n, e = x.shape
        flat = x.reshape(b, t * n, e)
        scores = self.score_net(flat)                    # (B, TN, K)
        weights = torch.softmax(scores / self.tau, dim=1)
        return torch.einsum("bsk,bse->bke", weights, flat)


class DynamicMultiScalePooling(nn.Module):
    def __init__(self, embed_size, scales=(1, 2, 4)):
        super().__init__()
        self.gate_fc = nn.Linear(embed_size, 1)
        self.scales = scales

    def forward(self, x):
        pooled = []
        for scale in self.scales:
            if x.shape[1] >= scale:
                pooled.append(F.avg_pool1d(
                    x.transpose(1, 2), scale, scale).transpose(1, 2)
                    if scale > 1 else x)
        gates = torch.cat([self.gate_fc(p.mean(dim=1)) for p in pooled],
                          dim=1)
        weights = torch.softmax(gates, dim=1)
        return torch.cat([p * weights[:, i][:, None, None]
                          for i, p in enumerate(pooled)], dim=1)


def _multi_scale_pool(x, scales=(1, 2, 4)):
    outs = []
    for scale in scales:
        if x.shape[1] >= scale:
            outs.append(F.avg_pool1d(x.transpose(1, 2), scale,
                                     scale).transpose(1, 2)
                        if scale > 1 else x)
    return torch.cat(outs, dim=1)


class _AttentionNetwork(nn.Module):
    def __init__(self, hidden, heads, layers, attn_type, max_seq_len=512):
        super().__init__()
        self.layers = nn.ModuleList([
            SpatioTemporalAttentionLayer(hidden, heads, attn_type,
                                         max_seq_len)
            for _ in range(layers)])

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class SpatioTemporalVisualTokenRefiner(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.attention_network = _AttentionNetwork(
            cfg.hidden_size, cfg.u2t_num_heads, cfg.u2t_num_layers,
            cfg.attn_type, getattr(cfg, "u2t_max_seq_len", 512))
        if cfg.enable_diffts:
            self.token_selection = DifferentiableTokenSelection(
                cfg.hidden_size, cfg.u2t_top_k)
        else:
            self.token_selection = TokenSelection(cfg.hidden_size,
                                                  cfg.u2t_top_k)
        self.use_multi_scale = cfg.use_multi_scale
        self.enable_dmtp = cfg.enable_dmtp
        if cfg.enable_dmtp:
            self.dynamic_pool = DynamicMultiScalePooling(cfg.hidden_size)

    def forward(self, x):
        x = self.attention_network(x)
        x = self.token_selection(x)
        if self.use_multi_scale:
            x = self.dynamic_pool(x) if self.enable_dmtp \\
                else _multi_scale_pool(x)
        return x


class TextConditionTokenAttMap(nn.Module):
    def __init__(self, d_model, num_heads, attn_type, max_seq_len=512):
        super().__init__()
        self.self_attention = _make_self_attention(attn_type, d_model,
                                                   num_heads, max_seq_len)
        self.visual_cross_attention = MultiHeadCrossAttention(d_model,
                                                              num_heads)
        self.text_cross_attention = MultiHeadCrossAttention(d_model,
                                                            num_heads)
        self.norm_self = nn.LayerNorm(d_model)
        self.norm_cross_v = nn.LayerNorm(d_model)
        self.norm_cross_t = nn.LayerNorm(d_model)

    def forward(self, query, visual_value, text_value):
        self_out = self.self_attention(query, query, query)
        self_out = self.norm_self(query + self_out)
        cross = self.visual_cross_attention(self_out, visual_value)
        cross_v = self.norm_cross_v(self_out + cross)
        cross_t = self.text_cross_attention(cross_v, text_value)
        return self.norm_cross_t(cross_v + cross_t)


class TextConditionTokenAggregator(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.layers_vt = nn.ModuleList([
            TextConditionTokenAttMap(cfg.hidden_size, cfg.u2t_num_heads,
                                     cfg.attn_type,
                                     getattr(cfg, "u2t_max_seq_len", 512))
            for _ in range(cfg.u2t_num_layers)])
        self.layer_linagg = nn.ModuleDict({
            "linear_aggregator": MultiHeadCrossAttention(cfg.hidden_size,
                                                         cfg.u2t_num_heads)})

    def forward(self, query, visual_value, text_value):
        for layer in self.layers_vt:
            query = layer(query, visual_value, text_value)
        return self.layer_linagg["linear_aggregator"](
            query, visual_value, is_compress=True)


class u2Tokenizer(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.svt_module = SpatioTemporalVisualTokenRefiner(cfg)
        self.tta_module = TextConditionTokenAggregator(cfg)
        self.query_tokens = nn.Parameter(
            torch.zeros(1, cfg.num_3d_query_token, cfg.hidden_size))

    def forward(self, v_token, t_token):
        query = self.query_tokens.expand(v_token.shape[0], -1, -1)
        v_token = self.svt_module(v_token)
        return self.tta_module(query, v_token, t_token)


# --------------------------------- 3D ViT -----------------------------------

class ViTAttention(nn.Module):
    def __init__(self, hidden, heads, qkv_bias=False):
        super().__init__()
        self.heads = heads
        self.head_dim = hidden // heads
        self.qkv = nn.Linear(hidden, hidden * 3, bias=qkv_bias)
        self.out_proj = nn.Linear(hidden, hidden)

    def forward(self, x):
        b, s, e = x.shape
        qkv = self.qkv(x)
        q, k, v = qkv.chunk(3, dim=-1)   # qkv-major feature layout
        split = lambda t: t.view(b, s, self.heads,
                                 self.head_dim).transpose(1, 2)
        q, k, v = split(q), split(k), split(v)
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.head_dim)
        probs = torch.softmax(scores.float(), dim=-1).to(q.dtype)
        return self.out_proj((probs @ v).transpose(1, 2).reshape(b, s, e))


class ViTBlock(nn.Module):
    def __init__(self, hidden, mlp_dim, heads, qkv_bias=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(hidden)
        self.attn = ViTAttention(hidden, heads, qkv_bias)
        self.norm2 = nn.LayerNorm(hidden)
        self.mlp = nn.ModuleDict({
            "linear1": nn.Linear(hidden, mlp_dim),
            "linear2": nn.Linear(mlp_dim, hidden),
        })

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        y = self.mlp["linear2"](F.gelu(self.mlp["linear1"](self.norm2(x)),
                                       approximate="none"))
        return x + y


class PatchEmbedding(nn.Module):
    """Flattened-patch linear projection over the runtime (D, H, W) axes
    with (pd, ph, pw, c) feature ordering."""

    def __init__(self, cfg):
        super().__init__()
        image = list(cfg.image_size)
        # input tensors are (B, C, D, H, W); the declared image_size may be
        # (H, W, D) (src flavor) or (D, H, W) (checkpoint flavor)
        self.patch = list(cfg.patch_size)
        n_patches = 1
        for i, p in zip(image, self.patch):
            n_patches *= i // p
        in_dim = cfg.image_channel
        for p in self.patch:
            in_dim *= p
        self.patch_embeddings = nn.ModuleList(
            [nn.Identity(), nn.Linear(in_dim, cfg.mm_hidden_size)])
        self.position_embeddings = nn.Parameter(
            torch.zeros(1, n_patches, cfg.mm_hidden_size))

    def forward(self, x):
        b, c, d, h, w = x.shape
        pd, ph, pw = self.patch
        x = x.reshape(b, c, d // pd, pd, h // ph, ph, w // pw, pw)
        x = x.permute(0, 2, 4, 6, 3, 5, 7, 1)
        x = x.reshape(b, -1, pd * ph * pw * c)
        return self.patch_embeddings[1](x) + self.position_embeddings


class ViT3D(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        layers = getattr(cfg, "vision_num_layers", 12)
        mlp_dim = getattr(cfg, "vision_mlp_dim", 3072)
        heads = getattr(cfg, "vision_num_heads", 12)
        qkv_bias = getattr(cfg, "vision_qkv_bias", False)
        self.patch_embedding = PatchEmbedding(cfg)
        self.cls_token = nn.Parameter(
            torch.zeros(1, 1, cfg.mm_hidden_size))
        self.blocks = nn.ModuleList([
            ViTBlock(cfg.mm_hidden_size, mlp_dim, heads, qkv_bias)
            for _ in range(layers)])
        self.norm = nn.LayerNorm(cfg.mm_hidden_size)

    def forward(self, x):
        x = self.patch_embedding(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class ViT3DTower(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.vision_tower = ViT3D(cfg)
        self.select_feature = cfg.vision_select_feature

    def forward(self, x):
        feats = self.vision_tower(x)
        if self.select_feature == "patch":
            feats = feats[:, 1:]
        return feats


class SpatialPoolingProjector(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.grid = [i // p for i, p in zip(cfg.image_size, cfg.patch_size)]
        self.pool = cfg.proj_pooling_size
        self.pooling_type = cfg.proj_pooling_type
        modules = [nn.Linear(cfg.mm_hidden_size, cfg.hidden_size)]
        for _ in range(1, int(cfg.proj_layer_num)):
            if cfg.proj_layer_type == "mlp":
                modules.append(nn.GELU())
            modules.append(nn.Linear(cfg.hidden_size, cfg.hidden_size))
        self.projector = nn.Sequential(*modules)

    def forward(self, x):
        b, s, e = x.shape
        if self.pooling_type == "spatial":
            g0, g1, g2 = self.grid
            x = x.reshape(b, g0, g1, g2, e).permute(0, 4, 1, 2, 3)
            x = F.avg_pool3d(x, self.pool, self.pool)
            x = x.permute(0, 2, 3, 4, 1).reshape(b, -1, e)
        else:
            x = F.avg_pool1d(x.transpose(1, 2), self.pool ** 3,
                             self.pool ** 3).transpose(1, 2)
        return self.projector(x)


# ------------------------------- meta model ---------------------------------

class u2Model(_BaseModel):
    config_class = u2Config

    def __init__(self, config):
        super().__init__(config)
        if getattr(config, "vision_tower", None):
            self.vision_tower = ViT3DTower(config)
            self.mm_projector = SpatialPoolingProjector(config)
            if config.enable_u2tokenizer:
                self.u2tokenizer = u2Tokenizer(config)


class u2ForCausalLM(_BaseForCausalLM):
    config_class = u2Config

    def __init__(self, config):
        super().__init__(config)
        self.model = u2Model(config)
        self.lm_head = nn.Linear(config.hidden_size, config.vocab_size,
                                 bias=False)
        self.post_init()

    def encode_images(self, images):
        feats = self.model.vision_tower(images)
        return self.model.mm_projector(feats)

    def prepare_inputs_embeds(self, input_ids, images, question_ids):
        embeds = self.model.embed_tokens(input_ids)
        if images is None:
            return embeds
        b, t = images.shape[:2]
        chunks = images.reshape(b * t, 1, *images.shape[2:])
        feats = self.encode_images(chunks)
        if self.config.enable_u2tokenizer:
            v_tokens = feats.reshape(b, t, feats.shape[-2], feats.shape[-1])
            t_tokens = self.model.embed_tokens(question_ids)
            img = self.model.u2tokenizer(v_tokens, t_tokens)
        else:
            img = feats.reshape(b, t * feats.shape[-2], feats.shape[-1])
        img = img.to(embeds.dtype)
        n = img.shape[1]
        return torch.cat([embeds[:, :1], img, embeds[:, 1 + n:]], dim=1)

    def forward(self, input_ids=None, images=None, question_ids=None,
                attention_mask=None, inputs_embeds=None, labels=None,
                **kwargs):
        if inputs_embeds is None and images is not None:
            inputs_embeds = self.prepare_inputs_embeds(input_ids, images,
                                                       question_ids)
            input_ids = None
        return super().forward(input_ids=input_ids,
                               attention_mask=attention_mask,
                               inputs_embeds=inputs_embeds, labels=labels,
                               **kwargs)

    @torch.no_grad()
    def generate(self, images=None, inputs=None, question_ids=None, **kwargs):
        if images is not None:
            inputs_embeds = self.prepare_inputs_embeds(inputs, images,
                                                       question_ids)
            return super().generate(inputs_embeds=inputs_embeds, **kwargs)
        return super().generate(inputs=inputs, **kwargs)
'''


_FAMILIES = {
    "qwen3": dict(base_config="Qwen3Config", base_model="Qwen3ForCausalLM",
                  base_inner="Qwen3Model"),
    "llama": dict(base_config="LlamaConfig", base_model="LlamaForCausalLM",
                  base_inner="LlamaModel"),
    "phi3": dict(base_config="Phi3Config", base_model="Phi3ForCausalLM",
                 base_inner="Phi3Model"),
}


def save_trust_remote_code_package(path: str, params: Mapping,
                                   cfg: U2ModelConfig,
                                   extra_config: Optional[dict] = None) -> None:
    """Write a self-contained remote-code checkpoint directory."""
    family = cfg.llm.model_type
    if family not in _FAMILIES:
        raise ValueError(f"no remote-code template for family {family!r}")
    names = _FAMILIES[family]
    model_type = f"u2{family}"

    extra = {
        "u2t_max_seq_len": cfg.u2t.max_seq_len,
        "vision_num_layers": cfg.vision.num_layers,
        "vision_mlp_dim": cfg.vision.mlp_dim,
        "vision_num_heads": cfg.vision.num_heads,
        "vision_qkv_bias": cfg.vision.qkv_bias,
        "auto_map": {
            "AutoConfig": "configuration_u2.u2Config",
            "AutoModelForCausalLM": "modeling_u2.u2ForCausalLM",
        },
        "architectures": ["u2ForCausalLM"],
        "model_type": model_type,
    }
    if extra_config:
        extra.update(extra_config)
    save_hf_checkpoint(path, params, cfg, extra_config=extra)

    def render(template, mapping):
        out = template
        for key, val in mapping.items():  # plain replace: the templates
            out = out.replace("{" + key + "}", val)  # contain literal braces
        return out

    with open(os.path.join(path, "configuration_u2.py"), "w") as f:
        f.write(render(CONFIGURATION_TEMPLATE, {
            "base_config": names["base_config"], "model_type": model_type}))
    with open(os.path.join(path, "modeling_u2.py"), "w") as f:
        f.write(render(MODELING_TEMPLATE, {
            "family": family, "base_model": names["base_model"],
            "base_inner": names["base_inner"]}))
