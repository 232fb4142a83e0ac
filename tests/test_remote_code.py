"""trust_remote_code package emission: the emitted torch modeling code loads
through AutoModelForCausalLM and reproduces the flax model's logits — the
portability property of the reference's released checkpoints (SURVEY §2.8)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # emits + runs the torch remote-code package
import torch

from u2tokenizer_tpu.config import U2ModelConfig, U2TokenizerConfig
from u2tokenizer_tpu.models.remote_code import save_trust_remote_code_package
from u2tokenizer_tpu.models.u2_model import U2CausalLM


def assert_close_scaled(out, ref, tol=5e-4):
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=tol * scale)


@pytest.mark.parametrize("attn_type,diffts,dmtp", [
    ("rma", False, False),
    ("rma", True, True),
])
def test_remote_code_package_logits_parity(tmp_path, attn_type, diffts, dmtp):
    cfg = U2ModelConfig.tiny()
    cfg = dataclasses.replace(cfg, u2t=dataclasses.replace(
        cfg.u2t, attn_type=attn_type, enable_diffts=diffts, enable_dmtp=dmtp))
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    b, s = 2, 20
    images = jax.random.normal(rng, (b, cfg.num_chunks, d, h, w)) * 0.5
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                             cfg.llm.vocab_size)
    qids = jax.random.randint(jax.random.PRNGKey(2), (b, 5), 0,
                              cfg.llm.vocab_size)
    params = model.init(rng, ids, images, qids)
    flax_logits, _, _ = model.apply(params, ids, images, qids)

    pkg = str(tmp_path / "pkg")
    save_trust_remote_code_package(pkg, params, cfg)
    for fname in ("model.safetensors", "config.json", "configuration_u2.py",
                  "modeling_u2.py"):
        assert os.path.exists(os.path.join(pkg, fname)), fname

    from transformers import AutoModelForCausalLM

    tm = AutoModelForCausalLM.from_pretrained(
        pkg, trust_remote_code=True, torch_dtype=torch.float32).eval()
    with torch.no_grad():
        out = tm(input_ids=torch.tensor(np.asarray(ids)),
                 images=torch.tensor(np.asarray(images)),
                 question_ids=torch.tensor(np.asarray(qids)))
    assert_close_scaled(out.logits.numpy(), np.asarray(flax_logits))

    # text-only path too
    flax_text, _, _ = model.apply(params, ids, None, None)
    with torch.no_grad():
        out_t = tm(input_ids=torch.tensor(np.asarray(ids)))
    assert_close_scaled(out_t.logits.numpy(), np.asarray(flax_text))
