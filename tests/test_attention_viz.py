"""Attention-map capture + rendering (eval/attention_viz.py): the
demo_show.ipynb-equivalent artifact on the tiny model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import U2ModelConfig
from u2tokenizer_tpu.eval.attention_viz import (
    capture_attention_maps,
    render_attention_png,
    spatial_salience,
)
from u2tokenizer_tpu.models.u2_model import U2CausalLM


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    images = jax.random.normal(rng, (1, cfg.num_chunks, d, h, w))
    qids = jnp.ones((1, 6), jnp.int32)
    params = model.init(rng, jnp.ones((1, 16), jnp.int32), images, qids)
    return cfg, model, params, images, qids


def test_capture_shapes_and_normalization(tiny_setup):
    cfg, model, params, images, qids = tiny_setup
    maps = capture_attention_maps(model, params, images, qids)
    t = cfg.num_chunks
    n = cfg.proj_out_num
    heads = cfg.u2t.num_heads
    q = cfg.u2t.num_query_tokens
    assert maps["svr_spatial"].shape == (1, t, heads, n, n)
    assert maps["svr_temporal"].shape == (1, n, heads, t, t)
    assert maps["tta_self"].shape == (1, heads, q, q)
    assert maps["tta_cross_text"].shape[-1] == 6
    # softmax rows sum to 1
    for key in maps:
        np.testing.assert_allclose(maps[key].sum(-1), 1.0, atol=1e-4)
    # salience reshapes to the projector token grid
    gp = cfg.projector.grid_post(cfg.vision.image_size, cfg.vision.patch_size)
    sal = spatial_salience(maps, (gp[0], gp[1] * gp[2]))
    assert sal.shape == (1, t, gp[0], gp[1] * gp[2])


def test_render_png(tiny_setup, tmp_path):
    cfg, model, params, images, qids = tiny_setup
    maps = capture_attention_maps(model, params, images, qids)
    out = str(tmp_path / "attn.png")
    gp = cfg.projector.grid_post(cfg.vision.image_size, cfg.vision.patch_size)
    render_attention_png(maps, np.asarray(images)[0], out,
                         question_tokens=["what", "organ"],
                         grid_hw=(gp[0], gp[1] * gp[2]))
    assert os.path.exists(out) and os.path.getsize(out) > 10_000
