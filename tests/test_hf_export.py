"""HF export roundtrip: flax params -> safetensors -> converted back."""

import jax
import jax.numpy as jnp
import numpy as np

from u2tokenizer_tpu.config import U2ModelConfig
from u2tokenizer_tpu.models.hf_export import export_u2_state_dict, save_hf_checkpoint
from u2tokenizer_tpu.models.hf_weights import (
    convert_u2_checkpoint,
    load_safetensors_dir,
)
from u2tokenizer_tpu.models.u2_model import U2CausalLM


def test_export_roundtrip(tmp_path):
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    images = jax.random.normal(rng, (1, cfg.num_chunks, d, h, w))
    ids = jnp.zeros((1, 16), jnp.int32)
    qids = jnp.ones((1, 4), jnp.int32)
    params = model.init(rng, ids, images, qids)

    save_hf_checkpoint(str(tmp_path / "ckpt"), params, cfg)
    sd = load_safetensors_dir(str(tmp_path / "ckpt"))
    assert "model.embed_tokens.weight" in sd
    assert "model.u2tokenizer.query_tokens" in sd
    assert "model.vision_tower.vision_tower.cls_token" in sd

    back = convert_u2_checkpoint(sd, cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    flat_b = { "/".join(str(getattr(k, "key", k)) for k in path): v
               for path, v in flat_b.items() }
    missing = []
    for path, leaf in flat_a:
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        if pstr not in flat_b:
            missing.append(pstr)
            continue
        np.testing.assert_allclose(np.asarray(leaf), flat_b[pstr], atol=1e-6,
                                   err_msg=pstr)
    assert not missing, missing

    # forward parity through the model
    l0, _, _ = model.apply(params, ids, images, qids)
    l1, _, _ = model.apply(back, ids, images, qids)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-5)


def test_config_json_carries_u2_attributes(tmp_path):
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    params = model.init(rng, jnp.zeros((1, 16), jnp.int32),
                        jax.random.normal(rng, (1, cfg.num_chunks, d, h, w)),
                        jnp.ones((1, 4), jnp.int32))
    save_hf_checkpoint(str(tmp_path / "c"), params, cfg)
    import json
    conf = json.load(open(tmp_path / "c" / "config.json"))
    for key in ("enable_u2tokenizer", "u2t_top_k", "num_3d_query_token",
                "mm_projector_type", "attn_type"):
        assert key in conf
    from u2tokenizer_tpu.config import U2ModelConfig as C
    c2 = C.from_json(open(tmp_path / "c" / "u2_tpu_config.json").read())
    assert c2.u2t.top_k == cfg.u2t.top_k
