"""Weight-only int8 quantization: accuracy + serving-path smoke tests.

The serving transform (models/quantize.py) must preserve model behavior:
quantized logits stay within per-channel-int8 error of the exact path, and
greedy decode agrees except at near-ties. Mirrors the reference's serving
precision options (src/demo/online_demo.py 4/8-bit load flags)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import GenerationConfig, LLMConfig, U2ModelConfig
from u2tokenizer_tpu.models.generate import (make_generate_fn,
                                             make_multimodal_generate_fn)
from u2tokenizer_tpu.models.llm.decoder import CausalLM
from u2tokenizer_tpu.models.quantize import (cast_for_inference,
                                             quantize_llm_weights,
                                             quantized_llm_config)
from u2tokenizer_tpu.models.u2_model import U2CausalLM


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    emb_init = jnp.zeros((2, 16, cfg.hidden_size), jnp.float32)
    params = model.init(rng, emb_init, jnp.zeros((2, 16), jnp.int32),
                        jnp.ones((1, 1, 16, 16), bool))
    return cfg, model, params, ids


def _logits(model, params, ids):
    emb = model.apply(params, ids, method="embed_tokens")
    logits, _, _ = model.apply(params, emb, method="forward_embeds")
    return logits


def test_quantized_tree_structure(tiny_lm):
    cfg, model, params, ids = tiny_lm
    qparams = quantize_llm_weights(params)
    inner = qparams["params"]["model"]
    assert inner["embed_tokens"].dtype == jnp.int8
    assert inner["embed_scale"].shape == (cfg.vocab_size, 1)
    attn = inner["layers_0"]["self_attn"]
    assert attn["q_proj"]["kernel"].dtype == jnp.int8
    assert attn["q_proj"]["scale"].shape == (cfg.num_heads * cfg.head_dim,)
    # norms untouched
    assert inner["layers_0"]["input_layernorm"]["weight"].dtype == jnp.float32


def test_quantized_logits_close(tiny_lm):
    cfg, model, params, ids = tiny_lm
    exact = np.asarray(_logits(model, params, ids))
    qmodel = CausalLM(quantized_llm_config(cfg), dtype=jnp.float32)
    qparams = quantize_llm_weights(params)
    quant = np.asarray(_logits(qmodel, qparams, ids))
    scale = np.abs(exact).max()
    err = np.abs(quant - exact).max() / scale
    assert err < 0.05, f"relative logits error {err:.4f}"
    # greedy agreement except near-ties
    match = (exact.argmax(-1) == quant.argmax(-1)).mean()
    assert match >= 0.9, f"greedy agreement {match:.3f}"


def test_quantized_generate_matches(tiny_lm):
    cfg, model, params, ids = tiny_lm
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    prompt_len = jnp.array([16, 12], jnp.int32)
    att = jnp.arange(16)[None, :] < prompt_len[:, None]
    emb = model.apply(params, ids * att, method="embed_tokens")

    exact_fn = make_generate_fn(model, gen, cache_dtype=jnp.float32)
    exact = np.asarray(exact_fn(params, emb, prompt_len, jax.random.PRNGKey(3)))

    qmodel = CausalLM(quantized_llm_config(cfg), dtype=jnp.float32)
    qparams = quantize_llm_weights(params)
    qemb = qmodel.apply(qparams, ids * att, method="embed_tokens")
    q_fn = make_generate_fn(qmodel, gen, cache_dtype=jnp.float32)
    quant = np.asarray(q_fn(qparams, qemb, prompt_len, jax.random.PRNGKey(3)))
    # Random-weight logits are near-uniform, so greedy trajectories diverge
    # at the first near-tie and compound; the meaningful quantization check
    # is single-step fidelity: the quantized first token must be within
    # quantization error of the exact argmax under the EXACT logits.
    exact_logits, _, _ = model.apply(
        params, emb, attention_mask=att.astype(jnp.int32),
        method="forward_embeds")
    last = np.asarray(jnp.take_along_axis(
        exact_logits, (prompt_len - 1)[:, None, None], axis=1))[:, 0]
    spread = last.max() - last.min()
    for row in range(last.shape[0]):
        got = last[row, quant[row, 0]]
        best = last[row].max()
        assert got >= best - 0.05 * spread, (row, got, best)
    assert quant.shape == exact.shape


def test_cast_for_inference_dtypes(tiny_lm):
    _, _, params, _ = tiny_lm
    cast = cast_for_inference(params)
    flat = jax.tree_util.tree_flatten_with_path(cast)[0]
    for path, leaf in flat:
        name = str(path)
        if leaf.ndim >= 2:
            assert leaf.dtype == jnp.bfloat16, name
        elif jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, name


def test_u2_quantized_multimodal_generate():
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    images = jax.random.normal(rng, (1, cfg.num_chunks, d, h, w))
    ids = jnp.zeros((1, 24), jnp.int32)
    qids = jnp.ones((1, 6), jnp.int32)
    params = model.init(rng, ids, images, qids)
    params = quantize_llm_weights(cast_for_inference(params))
    qmodel = U2CausalLM(quantized_llm_config(cfg), dtype=jnp.bfloat16)
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-2)
    gen_fn = make_multimodal_generate_fn(qmodel, gen, cache_dtype="int8",
                                         jit=False)
    toks = gen_fn(params, ids, images, qids, jnp.array([24], jnp.int32),
                  jax.random.PRNGKey(1))
    assert toks.shape == (1, 4)
    assert np.all(np.asarray(toks) >= 0)


# --- int4 (group-wise) --------------------------------------------------


def test_int4_tree_structure(tiny_lm):
    cfg, model, params, ids = tiny_lm
    qparams = quantize_llm_weights(params, mode="int4")
    inner = qparams["params"]["model"]
    # embeddings stay int8 in int4 mode (see quantize._quantize_tree)
    assert inner["embed_tokens"].dtype == jnp.int8
    attn = inner["layers_0"]["self_attn"]
    out_f = cfg.num_heads * cfg.head_dim
    # int4 kernels are stored PACKED as int8 nibble pairs along the group
    # axis (decoder.pack_int4) — transportable across the axon relay
    assert attn["q_proj"]["kernel"].dtype == jnp.int8
    assert attn["q_proj"]["kernel"].shape == (1, cfg.hidden_size // 2, out_f)
    assert attn["q_proj"]["scale"].shape == (1, out_f)
    # intermediate=256 divides into two 128-groups (64 packed bytes each)
    mlp = inner["layers_0"]["mlp"]
    assert mlp["down_proj"]["kernel"].shape == (2, 64, cfg.hidden_size)
    assert mlp["down_proj"]["scale"].shape == (2, cfg.hidden_size)


def test_int4_quantization_exact_on_grid():
    """A kernel whose weights are already scale*{-7..7} per group must
    round-trip exactly through the int4 path (the quantization math check,
    independent of how well int4 fits any particular weight distribution)."""
    from u2tokenizer_tpu.models.llm.decoder import QDense
    from u2tokenizer_tpu.models.quantize import _quantize_kernel_int4

    rng = np.random.default_rng(0)
    in_f, out = 256, 96
    grid = rng.integers(-7, 8, (in_f, out)).astype(np.float32)
    gscale = rng.uniform(0.5, 2.0, (2, 1, out)).astype(np.float32)
    kernel = jnp.asarray(grid.reshape(2, 128, out) * gscale) \
        .reshape(in_f, out)
    q, s = _quantize_kernel_int4(kernel)
    from u2tokenizer_tpu.models.llm.decoder import unpack_int4

    assert q.dtype == jnp.int8 and q.shape == (2, 64, out)  # packed
    np.testing.assert_allclose(
        np.asarray(unpack_int4(q).astype(jnp.float32))
        * np.asarray(s)[:, None, :],
        np.asarray(kernel).reshape(2, 128, out), rtol=1e-5)

    x = jnp.asarray(rng.normal(size=(3, in_f)).astype(np.float32))
    exact = x @ kernel
    layer = QDense(out, use_bias=False, dtype=jnp.float32, quantized="int4")
    out_q = layer.apply({"params": {"kernel": q, "scale": s}}, x)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(exact),
                               rtol=2e-4, atol=2e-4)


def test_int4_logits_close(tiny_lm):
    """Sanity error bound on the tiny random model. iid-normal weights are
    int4's worst case (~12% per-weight noise at 15 levels over ±max); real
    checkpoints quantize far better. The logits must stay correlated and
    boundedly wrong, proving the wiring — exactness is covered by
    test_int4_quantization_exact_on_grid."""
    cfg, model, params, ids = tiny_lm
    exact = np.asarray(_logits(model, params, ids))
    qmodel = CausalLM(quantized_llm_config(cfg, "int4"), dtype=jnp.float32)
    qparams = quantize_llm_weights(params, mode="int4")
    quant = np.asarray(_logits(qmodel, qparams, ids))
    scale = np.abs(exact).max()
    err = np.abs(quant - exact).max() / scale
    assert err < 0.5, f"relative logits error {err:.4f}"
    corr = np.corrcoef(exact.ravel(), quant.ravel())[0, 1]
    assert corr > 0.9, f"logits correlation {corr:.4f}"


def test_int4_generate_runs(tiny_lm):
    cfg, model, params, ids = tiny_lm
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    qmodel = CausalLM(quantized_llm_config(cfg, "int4"), dtype=jnp.float32)
    qparams = quantize_llm_weights(params, mode="int4")
    prompt_len = jnp.array([16, 12], jnp.int32)
    att = jnp.arange(16)[None, :] < prompt_len[:, None]
    emb = qmodel.apply(qparams, ids * att, method="embed_tokens")
    toks = np.asarray(make_generate_fn(qmodel, gen, cache_dtype="int8")(
        qparams, emb, prompt_len, jax.random.PRNGKey(3)))
    assert toks.shape == (2, 6)
    assert (toks >= 0).all() and (toks < cfg.vocab_size).all()


def test_quantize_kv_int4_accuracy():
    """int4 KV rows: exact on grid values, bounded error on random rows."""
    from u2tokenizer_tpu.ops.attention import quantize_kv

    rng = np.random.default_rng(0)
    grid = rng.integers(-7, 8, (2, 5, 3, 16)).astype(np.float32)
    grid[..., 0] = 7  # pin each row's max so the derived scale is exact
    sc = rng.uniform(0.5, 2.0, (2, 5, 3, 1)).astype(np.float32)
    x = jnp.asarray(grid * sc)
    q, s = quantize_kv(x, dtype=jnp.int4)
    assert q.dtype == jnp.int4
    back = np.asarray(q.astype(jnp.float32)) * np.asarray(
        s.astype(jnp.float32))
    np.testing.assert_allclose(back, np.asarray(x), rtol=2e-2, atol=2e-2)

    y = jnp.asarray(rng.normal(size=(2, 5, 3, 16)).astype(np.float32))
    q, s = quantize_kv(y, dtype=jnp.int4)
    back = np.asarray(q.astype(jnp.float32)) * np.asarray(
        s.astype(jnp.float32))
    err = np.abs(back - np.asarray(y)).max() / np.abs(y).max()
    assert err < 0.15, err  # half an int4 step of the per-row max


def test_int4_kv_cache_generate(tiny_lm):
    """Generate with the int4 KV cache: prefill is exact (attends fresh
    k/v), so the first token must match the fp32-cache path; later tokens
    run under int4 quantization noise (shape/validity checked)."""
    cfg, model, params, ids = tiny_lm
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    prompt_len = jnp.array([16, 12], jnp.int32)
    att = jnp.arange(16)[None, :] < prompt_len[:, None]
    emb = model.apply(params, ids * att, method="embed_tokens")
    exact = np.asarray(make_generate_fn(model, gen, jnp.float32)(
        params, emb, prompt_len, jax.random.PRNGKey(3)))
    q4 = np.asarray(make_generate_fn(model, gen, "int4")(
        params, emb, prompt_len, jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(exact[:, 0], q4[:, 0])
    assert q4.shape == (2, 6) and (q4 >= 0).all()


def test_chunked_prefill_matches_one_shot(tiny_lm):
    """prefill_chunk: identical tokens to the one-shot prefill on a float
    cache (exact path), including short (right-padded) rows."""
    from u2tokenizer_tpu.models.generate import make_generate_fn as mgf

    cfg, model, params, ids = tiny_lm
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    prompt_len = jnp.array([16, 12], jnp.int32)
    att = jnp.arange(16)[None, :] < prompt_len[:, None]
    emb = model.apply(params, ids * att, method="embed_tokens")
    one = np.asarray(mgf(model, gen, jnp.float32)(
        params, emb, prompt_len, jax.random.PRNGKey(3)))
    for cs in (4, 8):
        chunked = np.asarray(mgf(model, gen, jnp.float32, prefill_chunk=cs)(
            params, emb, prompt_len, jax.random.PRNGKey(3)))
        np.testing.assert_array_equal(chunked, one)


def test_chunked_prefill_int8_cache_runs(tiny_lm):
    from u2tokenizer_tpu.models.generate import make_generate_fn as mgf

    cfg, model, params, ids = tiny_lm
    gen = GenerationConfig(max_new_tokens=5, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    prompt_len = jnp.array([16, 12], jnp.int32)
    att = jnp.arange(16)[None, :] < prompt_len[:, None]
    emb = model.apply(params, ids * att, method="embed_tokens")
    toks = np.asarray(mgf(model, gen, "int8", prefill_chunk=8)(
        params, emb, prompt_len, jax.random.PRNGKey(3)))
    assert toks.shape == (2, 5) and (toks >= 0).all()


def test_int8_out_tiled_matches_plain():
    """out_tiles (the 8B lm_head memory fix) must be a pure evaluation-
    order change: forward outputs and grads wrt x identical to the plain
    single-dot int8 path (same per-column scale, same contraction)."""
    from u2tokenizer_tpu.models.llm.decoder import QDense

    rng = np.random.default_rng(1)
    in_f, out = 64, 96
    kernel = jnp.asarray(rng.integers(-127, 128, (in_f, out)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, (out,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 130, in_f)).astype(np.float32))
    variables = {"params": {"kernel": kernel, "scale": scale}}
    plain = QDense(out, use_bias=False, dtype=jnp.float32, quantized="int8")
    tiled = QDense(out, use_bias=False, dtype=jnp.float32, quantized="int8",
                   out_tiles=4)

    ct = jnp.asarray(rng.normal(size=(2, 130, out)).astype(np.float32))
    yp, vjp_p = jax.vjp(lambda xx: plain.apply(variables, xx), x)
    yt, vjp_t = jax.vjp(lambda xx: tiled.apply(variables, xx), x)
    (gp,), (gt,) = vjp_p(ct), vjp_t(ct)
    # tolerance covers gemm-vs-mapped-tile fp32 reduction reassociation
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yp),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gp),
                               rtol=1e-5, atol=1e-4)
    # below the 128-token gate (decode regime) the tiled module must take
    # the plain path bit-for-bit
    x_small = x[:, :3]
    ys = tiled.apply(variables, x_small)
    np.testing.assert_array_equal(np.asarray(ys),
                                  np.asarray(plain.apply(variables, x_small)))


def test_int4_dequant_never_saved_for_backward():
    """The r4g 8B OOM (508 MB over): the backward's dx needs the
    dequantized int4 kernel, and XLA hoisted the param-only dequant out
    of the layer remat — every decoder matmul's bf16 wk (up to 96 MB at
    8B) stayed live as a jvp residual across fwd→bwd. The checkpointed
    _dq_dot body must leave only its INPUTS (activations + packed int8
    kernel + scales) as residuals; assert no float residual reaches the
    dequantized-kernel size."""
    try:  # public location through jax 0.4.x
        from jax.ad_checkpoint import saved_residuals
    except ImportError:  # moved in jax 0.9 (only print_saved_residuals stayed)
        from jax._src.ad_checkpoint import saved_residuals

    from u2tokenizer_tpu.models.llm.decoder import QDense, int4_group

    in_f, out, tokens = 512, 512, 128
    assert tokens >= int4_group(in_f)  # dequant-first (training) regime
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(in_f, out)), jnp.float32)
    from u2tokenizer_tpu.models.quantize import _quantize_kernel_int4

    packed, scale = _quantize_kernel_int4(w)
    variables = {"params": {"kernel": packed, "scale": scale}}
    m = QDense(out, use_bias=False, dtype=jnp.bfloat16, quantized="int4")

    def loss(xx):
        return m.apply(variables, xx).astype(jnp.float32).sum()

    x = jnp.asarray(rng.normal(size=(tokens, in_f)), jnp.bfloat16)
    dequant_size = in_f * out  # tokens*in and tokens*out are 4x smaller
    offenders = [
        (aval.shape, str(aval.dtype), why)
        for aval, why in saved_residuals(loss, x)
        if hasattr(aval, "dtype") and jnp.issubdtype(aval.dtype, jnp.floating)
        and aval.size >= dequant_size]
    assert not offenders, (
        f"dequantized-kernel-sized float residuals saved for backward: "
        f"{offenders}")


def test_int8_out_tiled_backward_never_stacks_dequant():
    """The r4e on-chip re-OOM: lax.map's scan transpose saved each
    iteration's dequantized kernel tile as a STACKED (nt, in, out/nt)
    residual — the very in×out bf16 buffer out_tiles exists to avoid.
    jax.checkpoint on the tile body makes the backward re-slice +
    re-convert per tile. Guard at the jaxpr level: no float intermediate
    anywhere in the VJP may reach the full dequantized-kernel size."""
    from u2tokenizer_tpu.models.llm.decoder import QDense

    in_f, out, nt, tokens = 256, 512, 4, 128
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.integers(-127, 128, (in_f, out)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, (out,)).astype(np.float32))
    variables = {"params": {"kernel": kernel, "scale": scale}}
    tiled = QDense(out, use_bias=False, dtype=jnp.bfloat16,
                   quantized="int8", out_tiles=nt)

    def loss(xx):
        return tiled.apply(variables, xx).astype(jnp.float32).sum()

    x = jnp.asarray(rng.normal(size=(tokens, in_f)), jnp.bfloat16)
    jaxpr = jax.make_jaxpr(jax.grad(loss))(x)

    def _avals(jx):
        for eqn in jx.eqns:
            for v in eqn.outvars:
                if hasattr(v, "aval"):
                    yield v.aval
            for p in eqn.params.values():
                for sub in (p if isinstance(p, (list, tuple)) else (p,)):
                    inner = getattr(sub, "jaxpr", sub)
                    if hasattr(inner, "eqns"):
                        yield from _avals(inner)

    # tokens*in (xt), tokens*out (y/ct), in*(out/nt) (one live tile) are
    # all < in_f*out at this geometry; only the full dequant (or the
    # stacked residual, same total size) can reach it.
    dequant_size = in_f * out
    offenders = [a for a in _avals(jaxpr.jaxpr)
                 if jnp.issubdtype(a.dtype, jnp.floating)
                 and a.size >= dequant_size]
    assert not offenders, (
        f"full-size float dequant buffers in the VJP jaxpr: "
        f"{[(a.shape, str(a.dtype)) for a in offenders]}")
