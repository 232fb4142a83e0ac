"""Decoder export round-trips for every family convert_decoder imports.

The export side must mirror hf_weights.convert_decoder per family
(reference naming: base_model_tokenizers/*/modeling_u2*.py): phi3
re-fuses qkv_proj/gate_up_proj (torch Phi3 only loads fused names), phi2
uses layernorm scale+bias, fc1/fc2 gelu MLP, self_attn.dense and
model.final_layernorm with no post-attention norm, and Llama-3.2 exports
must carry rope_scaling in config.json or a torch consumer computes
unscaled rotary frequencies.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import LLMConfig, U2ModelConfig
from u2tokenizer_tpu.models.hf_export import export_decoder, save_hf_checkpoint
from u2tokenizer_tpu.models.hf_weights import convert_decoder
from u2tokenizer_tpu.models.llm.decoder import CausalLM


def _family_cfg(family: str) -> LLMConfig:
    tiny = LLMConfig.tiny()
    if family == "phi3":
        return dataclasses.replace(tiny, model_type="phi3", qk_norm=False)
    if family == "phi2":
        return dataclasses.replace(
            tiny, model_type="phi2", qk_norm=False, parallel_block=True,
            norm_type="layernorm", mlp_type="gelu", mlp_bias=True,
            attention_bias=True, lm_head_bias=True,
            partial_rotary_factor=0.4, tie_word_embeddings=False)
    if family == "llama":
        return dataclasses.replace(
            tiny, model_type="llama", qk_norm=False,
            rope_scaling_type="llama3", rope_scaling_factor=32.0)
    return tiny  # qwen3


def _roundtrip(cfg: LLMConfig):
    model = CausalLM(cfg, dtype=jnp.float32)
    s = 8
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (1, s))
    mask = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, s, cfg.hidden_size)), positions,
                        mask)["params"]
    sd = {}
    export_decoder(params, cfg, sd)
    back = convert_decoder(sd, cfg)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {"/".join(str(getattr(k, "key", k)) for k in path): v
              for path, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    for path, leaf in flat_a:
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        assert pstr in flat_b, f"{cfg.model_type}: {pstr} lost in round-trip"
        np.testing.assert_allclose(np.asarray(leaf), flat_b[pstr],
                                   atol=1e-6, err_msg=pstr)
    return sd


@pytest.mark.parametrize("family", ["qwen3", "llama", "phi3", "phi2"])
def test_decoder_export_roundtrip(family):
    cfg = _family_cfg(family)
    sd = _roundtrip(cfg)
    if family == "phi3":
        assert "model.layers.0.self_attn.qkv_proj.weight" in sd
        assert "model.layers.0.mlp.gate_up_proj.weight" in sd
        assert "model.layers.0.self_attn.q_proj.weight" not in sd
    if family == "phi2":
        assert "model.final_layernorm.weight" in sd
        assert "model.final_layernorm.bias" in sd
        assert "model.layers.0.self_attn.dense.weight" in sd
        assert "model.layers.0.mlp.fc1.weight" in sd
        assert "model.layers.0.mlp.fc1.bias" in sd
        assert "model.layers.0.post_attention_layernorm.weight" not in sd


def test_rope_scaling_survives_config_json(tmp_path):
    cfg = dataclasses.replace(U2ModelConfig.tiny(),
                              llm=_family_cfg("llama"))
    model_cls = __import__("u2tokenizer_tpu.models.u2_model",
                           fromlist=["U2CausalLM"]).U2CausalLM
    model = model_cls(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    params = model.init(rng, jnp.zeros((1, 16), jnp.int32),
                        jax.random.normal(rng, (1, cfg.num_chunks, d, h, w)),
                        jnp.ones((1, 4), jnp.int32))
    save_hf_checkpoint(str(tmp_path / "c"), params, cfg)
    conf = json.load(open(tmp_path / "c" / "config.json"))
    rs = conf["rope_scaling"]
    assert rs["rope_type"] == "llama3" and rs["factor"] == 32.0
    assert "low_freq_factor" in rs and "original_max_position_embeddings" in rs

    # the import side reads the same fields back
    from u2tokenizer_tpu.models.hf_weights import llm_config_from_hf
    conf["model_type"] = "llama"
    back = llm_config_from_hf(conf)
    assert back.rope_scaling_type == "llama3"
    assert back.rope_scaling_factor == 32.0
