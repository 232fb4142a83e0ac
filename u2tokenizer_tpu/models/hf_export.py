"""Export flax params to HF/torch-layout checkpoints (the inverse of
hf_weights.py).

Gives reference users a migration path in both directions: a μ² model
trained in this framework exports to the same state-dict naming scheme the
reference's u2Trainer writes (src/train/sft_u2Trainer.py:11-31) and its
remote-code packages load (base_model_tokenizers/*/modeling_u2Llama.py), so
the weights drop into either stack.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Mapping, Optional

import numpy as np

from ..config import U2ModelConfig


def _np(x) -> np.ndarray:
    # ascontiguousarray: transposed views must be materialized before
    # safetensors serializes the raw buffer
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _lin(sd: Dict[str, np.ndarray], name: str, p: Mapping):
    sd[name + ".weight"] = np.ascontiguousarray(_np(p["kernel"]).T)
    if "bias" in p:
        sd[name + ".bias"] = _np(p["bias"])


def _ln(sd: Dict[str, np.ndarray], name: str, p: Mapping):
    sd[name + ".weight"] = _np(p["scale"])
    sd[name + ".bias"] = _np(p["bias"])


def export_decoder(params: Mapping, cfg, sd: Dict[str, np.ndarray]) -> None:
    """CausalLM params {'model': ..., ['lm_head']} -> HF decoder names."""
    model = params["model"]
    sd["model.embed_tokens.weight"] = _np(model["embed_tokens"])
    sd["model.norm.weight"] = _np(model["norm"]["weight"])
    for i in range(cfg.num_layers):
        layer = model[f"layers_{i}"]
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = _np(layer["input_layernorm"]["weight"])
        sd[p + "post_attention_layernorm.weight"] = _np(
            layer["post_attention_layernorm"]["weight"])
        attn = layer["self_attn"]
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            _lin(sd, p + "self_attn." + nm, attn[nm])
        if cfg.qk_norm:
            sd[p + "self_attn.q_norm.weight"] = _np(attn["q_norm"]["weight"])
            sd[p + "self_attn.k_norm.weight"] = _np(attn["k_norm"]["weight"])
        for nm in ("gate_proj", "up_proj", "down_proj"):
            _lin(sd, p + "mlp." + nm, layer["mlp"][nm])
    if not cfg.tie_word_embeddings and "lm_head" in params:
        _lin(sd, "lm_head", params["lm_head"])


def export_vit(params: Mapping, cfg, sd: Dict[str, np.ndarray],
               prefix: str) -> None:
    _lin(sd, prefix + "patch_embedding.patch_embeddings.1",
         params["patch_embedding"]["proj"])
    sd[prefix + "patch_embedding.position_embeddings"] = _np(
        params["patch_embedding"]["position_embeddings"])
    if "cls_token" in params:
        sd[prefix + "cls_token"] = _np(params["cls_token"])
    _ln(sd, prefix + "norm", params["norm"])
    for i in range(cfg.num_layers):
        blk = params[f"blocks_{i}"]
        b = f"{prefix}blocks.{i}."
        _ln(sd, b + "norm1", blk["norm1"])
        _ln(sd, b + "norm2", blk["norm2"])
        sd[b + "attn.qkv.weight"] = np.ascontiguousarray(_np(blk["attn"]["qkv"]["kernel"]).T)
        if "bias" in blk["attn"]["qkv"]:
            sd[b + "attn.qkv.bias"] = _np(blk["attn"]["qkv"]["bias"])
        _lin(sd, b + "attn.out_proj", blk["attn"]["out_proj"])
        _lin(sd, b + "mlp.linear1", blk["mlp_fc1"])
        _lin(sd, b + "mlp.linear2", blk["mlp_fc2"])


def _export_attn(sd, prefix, p):
    for nm in ("wq", "wk", "wv", "dense"):
        if nm in p:
            _lin(sd, prefix + nm, p[nm])
    if "relative_bias" in p:
        sd[prefix + "relative_bias"] = _np(p["relative_bias"])


def export_u2tokenizer(params: Mapping, cfg: U2ModelConfig,
                       sd: Dict[str, np.ndarray]) -> None:
    u2t = cfg.u2t
    pre = "model.u2tokenizer."
    sd[pre + "query_tokens"] = _np(params["query_tokens"])
    svt = params["svt_module"]
    for i in range(u2t.num_layers):
        p = f"{pre}svt_module.attention_network.layers.{i}."
        _export_attn(sd, p + "spatial_attention.", svt[f"layers_{i}"]["spatial_attention"])
        _export_attn(sd, p + "temporal_attention.", svt[f"layers_{i}"]["temporal_attention"])
    _lin(sd, pre + "svt_module.token_selection.score_net",
         svt["token_selection"]["score_net"])
    if "dynamic_pool" in svt:
        sd[pre + "svt_module.dynamic_pool.gate_fc.weight"] = np.ascontiguousarray(
            _np(svt["dynamic_pool"]["gate_kernel"]).T)
        sd[pre + "svt_module.dynamic_pool.gate_fc.bias"] = _np(
            svt["dynamic_pool"]["gate_bias"])
    tta = params["tta_module"]
    for i in range(u2t.num_layers):
        p = f"{pre}tta_module.layers_vt.{i}."
        layer = tta[f"layers_vt_{i}"]
        _export_attn(sd, p + "self_attention.", layer["self_attention"])
        _export_attn(sd, p + "visual_cross_attention.", layer["visual_cross_attention"])
        _export_attn(sd, p + "text_cross_attention.", layer["text_cross_attention"])
        _ln(sd, p + "norm_self", layer["norm_self"])
        _ln(sd, p + "norm_cross_v", layer["norm_cross_v"])
        _ln(sd, p + "norm_cross_t", layer["norm_cross_t"])
    _export_attn(sd, pre + "tta_module.layer_linagg.linear_aggregator.",
                 tta["layer_linagg"]["linear_aggregator"])


def export_u2_state_dict(params: Mapping,
                         cfg: U2ModelConfig) -> Dict[str, np.ndarray]:
    """Full U2CausalLM params -> flat HF-layout state dict."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}
    export_decoder(p["llm"], cfg.llm, sd)
    if "vision_tower" in p:
        export_vit(p["vision_tower"]["vision_tower"], cfg.vision, sd,
                   "model.vision_tower.vision_tower.")
    if "mm_projector" in p:
        proj = p["mm_projector"]
        if cfg.projector.projector_type == "spp":
            torch_idx = 0
            for i in range(cfg.projector.layer_num):
                _lin(sd, f"model.mm_projector.projector.{torch_idx}",
                     proj[f"projector_{i}"])
                torch_idx += 2 if cfg.projector.layer_type == "mlp" else 1
        elif cfg.projector.projector_type == "linear":
            _lin(sd, "model.mm_projector.linear", proj["linear"])
    if "u2tokenizer" in p:
        export_u2tokenizer(p["u2tokenizer"], cfg, sd)
    return sd


def save_hf_checkpoint(path: str, params: Mapping, cfg: U2ModelConfig,
                       extra_config: Optional[dict] = None) -> None:
    """Write model.safetensors + config.json in the u2 checkpoint layout."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    sd = export_u2_state_dict(params, cfg)
    save_file(sd, os.path.join(path, "model.safetensors"))

    config = {
        "model_type": f"u2{cfg.llm.model_type.capitalize()}",
        "architectures": [f"u2{cfg.llm.model_type.capitalize()}ForCausalLM"],
        "vocab_size": cfg.llm.vocab_size,
        "hidden_size": cfg.llm.hidden_size,
        "intermediate_size": cfg.llm.intermediate_size,
        "num_hidden_layers": cfg.llm.num_layers,
        "num_attention_heads": cfg.llm.num_heads,
        "num_key_value_heads": cfg.llm.num_kv_heads,
        "head_dim": cfg.llm.head_dim,
        "rope_theta": cfg.llm.rope_theta,
        "rms_norm_eps": cfg.llm.rms_norm_eps,
        "tie_word_embeddings": cfg.llm.tie_word_embeddings,
        "max_position_embeddings": cfg.llm.max_position_embeddings,
        # u2 attributes (u2_arch.py:29-53)
        "image_channel": cfg.vision.in_channels,
        "image_size": list(cfg.vision.image_size),
        "patch_size": list(cfg.vision.patch_size),
        "vision_tower": "vit3d",
        "vision_select_layer": cfg.vision.select_layer,
        "vision_select_feature": cfg.vision.select_feature,
        "mm_projector_type": cfg.projector.projector_type,
        "proj_layer_type": cfg.projector.layer_type,
        "proj_layer_num": cfg.projector.layer_num,
        "proj_pooling_type": cfg.projector.pooling_type,
        "proj_pooling_size": cfg.projector.pooling_size,
        "mm_hidden_size": cfg.vision.hidden_size,
        "enable_u2tokenizer": cfg.u2t.enable,
        "u2t_num_heads": cfg.u2t.num_heads,
        "u2t_num_layers": cfg.u2t.num_layers,
        "u2t_top_k": cfg.u2t.top_k,
        "use_multi_scale": cfg.u2t.use_multi_scale,
        "num_3d_query_token": cfg.u2t.num_query_tokens,
        "attn_type": cfg.u2t.attn_type,
        "enable_diffts": cfg.u2t.enable_diffts,
        "enable_dmtp": cfg.u2t.enable_dmtp,
    }
    if extra_config:
        config.update(extra_config)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    with open(os.path.join(path, "u2_tpu_config.json"), "w") as f:
        f.write(cfg.to_json())

