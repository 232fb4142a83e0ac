"""Numerical parity vs. the reference PyTorch μ²tokenizer (golden oracle).

Every module family is compared with identical weights and inputs:
RMA / RoPE attention, cross attention (both modes), SVR (all selection and
pooling variants), TTA, and the full μ²Tokenizer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # golden-parity vs the torch reference oracle
import torch

from golden_utils import (
    randomize_torch_module,
    rma_params,
    svr_params,
    t2n,
    tta_params,
    u2tokenizer_params,
)

from u2tokenizer_tpu.config import U2TokenizerConfig
from u2tokenizer_tpu.models.u2tok.attention import (
    MultiHeadCrossAttention,
    RelativeMultiheadAttention,
    RotaryMultiheadAttention,
)
from u2tokenizer_tpu.models.u2tok.svr import SpatioTemporalVisualTokenRefiner
from u2tokenizer_tpu.models.u2tok.tta import TextConditionTokenAggregator
from u2tokenizer_tpu.models.u2tok.u2tokenizer import U2Tokenizer

D_MODEL, HEADS, MAX_SEQ = 64, 4, 64
TOL = dict(rtol=2e-5, atol=2e-5)


def assert_close_scaled(out, ref, tol=2e-5):
    """Compare with tolerance scaled to the reference magnitude — the SVR
    stack has no layer norms (svr.py:23-40), so randomized-weight activations
    grow large and raw fp32 ulp drift scales with them."""
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=tol * scale)


def rand(shape, seed):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


def test_rma_parity():
    from src.model.u2tokenizer.rma import RelativeMultiheadAttention as TorchRMA

    tm = randomize_torch_module(TorchRMA(D_MODEL, HEADS, max_seq_len=MAX_SEQ), 1)
    x = rand((2, 16, D_MODEL), 2)
    with torch.no_grad():
        ref, _ = tm(x, x, x)

    fm = RelativeMultiheadAttention(D_MODEL, HEADS, max_seq_len=MAX_SEQ)
    params = {"params": rma_params(tm)}
    out = fm.apply(params, jnp.asarray(t2n(x)), jnp.asarray(t2n(x)),
                   jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(out), t2n(ref), **TOL)


def test_rope_parity():
    from src.model.u2tokenizer.rope import RotaryMultiheadAttention as TorchRope

    tm = randomize_torch_module(TorchRope(D_MODEL, HEADS, max_seq_len=MAX_SEQ), 3)
    x = rand((2, 16, D_MODEL), 4)
    with torch.no_grad():
        ref, _ = tm(x, x, x)

    fm = RotaryMultiheadAttention(D_MODEL, HEADS, max_seq_len=MAX_SEQ)
    params = {"params": rma_params(tm)}
    out = fm.apply(params, jnp.asarray(t2n(x)), jnp.asarray(t2n(x)),
                   jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(out), t2n(ref), **TOL)


@pytest.mark.parametrize("compress", [False, True])
def test_cross_attention_parity(compress):
    from src.model.u2tokenizer.tta import MultiHeadCrossAttention as TorchMHCA

    tm = randomize_torch_module(TorchMHCA(D_MODEL, HEADS), 5)
    q = rand((2, 8, D_MODEL), 6)
    v = rand((2, 24, D_MODEL), 7)
    with torch.no_grad():
        ref = tm(q, v, is_compress=compress)

    fm = MultiHeadCrossAttention(D_MODEL, HEADS)
    params = {"params": rma_params(tm, compress_used=compress)}
    out = fm.apply(params, jnp.asarray(t2n(q)), jnp.asarray(t2n(v)),
                   is_compress=compress)
    np.testing.assert_allclose(np.asarray(out), t2n(ref), **TOL)


@pytest.mark.parametrize("attn_type", ["rma", "rope"])
@pytest.mark.parametrize("selection,pooling", [
    ("hard", "fixed"), ("diffts", "fixed"), ("hard", "dmtp"), ("hard", "none"),
])
def test_svr_parity(attn_type, selection, pooling):
    from src.model.u2tokenizer.svr import (
        SpatioTemporalVisualTokenRefinerModel as TorchSVR,
    )

    top_k = 32
    tm = TorchSVR(
        embed_size=D_MODEL, num_heads=HEADS, num_layers=2, top_k=top_k,
        use_multi_scale=(pooling != "none"), attn_type=attn_type,
        enable_diffts=(selection == "diffts"), enable_dmtp=(pooling == "dmtp"))
    # reference RMA has max_seq_len=512 fixed; our module must match it
    randomize_torch_module(tm, 8, std=0.05)
    x = rand((2, 4, 16, D_MODEL), 9)
    with torch.no_grad():
        ref = tm(x)

    fm = SpatioTemporalVisualTokenRefiner(
        embed_size=D_MODEL, num_heads=HEADS, num_layers=2, top_k=top_k,
        use_multi_scale=(pooling != "none"), attn_type=attn_type,
        enable_diffts=(selection == "diffts"), enable_dmtp=(pooling == "dmtp"),
        max_seq_len=512)
    params = {"params": svr_params(tm)}
    out = fm.apply(params, jnp.asarray(t2n(x)))
    assert_close_scaled(out, t2n(ref))


@pytest.mark.parametrize("attn_type", ["rma", "rope"])
def test_tta_parity(attn_type):
    from src.model.u2tokenizer.tta import (
        TextConditionTokenAggregatorModel as TorchTTA,
    )

    tm = randomize_torch_module(TorchTTA(D_MODEL, 2, HEADS, attn_type=attn_type), 10, std=0.05)
    q = rand((2, 8, D_MODEL), 11)
    vis = rand((2, 56, D_MODEL), 12)
    txt = rand((2, 13, D_MODEL), 13)
    with torch.no_grad():
        ref = tm(q, vis, txt)

    fm = TextConditionTokenAggregator(D_MODEL, 2, HEADS, attn_type=attn_type,
                                      max_seq_len=512)
    params = {"params": tta_params(tm)}
    out = fm.apply(params, jnp.asarray(t2n(q)), jnp.asarray(t2n(vis)),
                   jnp.asarray(t2n(txt)))
    np.testing.assert_allclose(np.asarray(out), t2n(ref), rtol=5e-5, atol=5e-5)


def test_u2tokenizer_full_parity():
    from src.model.u2tokenizer.u2Tokenizer import u2Tokenizer as TorchU2

    tm = TorchU2(
        embed_size=D_MODEL, num_heads=HEADS, num_layers=2, top_k=32,
        use_multi_scale=True, num_3d_query_token=8, hidden_size=D_MODEL,
        attn_type="rma")
    randomize_torch_module(tm, 14, std=0.05)
    v = rand((2, 4, 16, D_MODEL), 15)
    t = rand((2, 13, D_MODEL), 16)
    with torch.no_grad():
        ref = tm(v, t)

    cfg = U2TokenizerConfig(num_heads=HEADS, num_layers=2, top_k=32,
                            use_multi_scale=True, num_query_tokens=8,
                            attn_type="rma", max_seq_len=512)
    fm = U2Tokenizer(D_MODEL, cfg)
    params = {"params": u2tokenizer_params(tm)}
    out = fm.apply(params, jnp.asarray(t2n(v)), jnp.asarray(t2n(t)))
    assert out.shape == (2, 8, D_MODEL)
    assert_close_scaled(out, t2n(ref))


def test_attention_capture():
    """capture_attention sows softmax maps into 'intermediates' — the demo
    notebook's return_attn introspection (svr.py:50-62, tta.py:126-140)."""
    cfg = U2TokenizerConfig(num_heads=HEADS, num_layers=2, top_k=16,
                            use_multi_scale=True, num_query_tokens=8,
                            attn_type="rma", max_seq_len=512)
    fm = U2Tokenizer(D_MODEL, cfg)
    v = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 16, D_MODEL)),
                    jnp.float32)
    t = jnp.asarray(np.random.default_rng(1).normal(size=(1, 7, D_MODEL)),
                    jnp.float32)
    params = fm.init(jax.random.PRNGKey(0), v, t)
    out, state = fm.apply(params, v, t, capture_attention=True,
                          mutable=["intermediates"])
    inter = state["intermediates"]
    leaves = jax.tree_util.tree_leaves(inter)
    assert leaves, "no attention maps captured"
    # spatial map: (b*t=4, heads, n=16, n=16); all rows sum to 1
    spatial = inter["svt_module"]["layers_0"]["spatial_attention"]["attn"][0]
    assert spatial.shape == (4, HEADS, 16, 16)
    np.testing.assert_allclose(np.asarray(spatial.sum(-1)), 1.0, atol=1e-5)
    # TTA first-layer maps present (self + visual cross + text cross)
    tta0 = inter["tta_module"]["layers_vt_0"]
    assert set(tta0) >= {"self_attention", "visual_cross_attention",
                         "text_cross_attention"}
    # and the plain forward (no capture) returns identical outputs
    out2 = fm.apply(params, v, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


@pytest.mark.parametrize("selection", ["hard", "diffts"])
def test_u2tokenizer_gradient_parity(selection):
    """Training-path parity: d(loss)/d(inputs) through the FULL μ²tokenizer
    must match torch autograd on identical weights (loss = sum(out * W) for
    a fixed random probe W). Forward parity alone would not catch a
    detach/stop-gradient discrepancy — SFT trains through this module
    (reference: src/train/train_stage1.py freezes the vision tower but
    trains the μ²tokenizer, so its backward is load-bearing)."""
    from src.model.u2tokenizer.u2Tokenizer import u2Tokenizer as TorchU2

    tm = TorchU2(
        embed_size=D_MODEL, num_heads=HEADS, num_layers=2, top_k=32,
        use_multi_scale=True, num_3d_query_token=8, hidden_size=D_MODEL,
        attn_type="rma", enable_diffts=(selection == "diffts"))
    randomize_torch_module(tm, 30, std=0.02)
    v = (rand((2, 4, 16, D_MODEL), 31) * 0.5).requires_grad_(True)
    t = (rand((2, 13, D_MODEL), 32) * 0.5).requires_grad_(True)
    w = rand((2, 8, D_MODEL), 33)
    (tm(v, t) * w).sum().backward()
    ref_dv, ref_dt = t2n(v.grad), t2n(t.grad)

    cfg = U2TokenizerConfig(num_heads=HEADS, num_layers=2, top_k=32,
                            use_multi_scale=True, num_query_tokens=8,
                            attn_type="rma", max_seq_len=512,
                            enable_diffts=(selection == "diffts"))
    fm = U2Tokenizer(D_MODEL, cfg)
    params = {"params": u2tokenizer_params(tm)}
    wj = jnp.asarray(t2n(w))

    def loss(vj, tj):
        return (fm.apply(params, vj, tj) * wj).sum()

    dv, dt = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(t2n(v.detach())), jnp.asarray(t2n(t.detach())))
    scale_v = max(1.0, float(np.abs(ref_dv).max()))
    scale_t = max(1.0, float(np.abs(ref_dt).max()))
    np.testing.assert_allclose(np.asarray(dv), ref_dv, rtol=0,
                               atol=2e-4 * scale_v)
    np.testing.assert_allclose(np.asarray(dt), ref_dt, rtol=0,
                               atol=2e-4 * scale_t)


def test_u2tokenizer_param_gradient_parity():
    """Parameter gradients (what the optimizer actually consumes) match
    torch autograd: after backward, each torch param's .grad is pushed
    through the SAME torch->flax converter used for weights — every
    converter op (transpose/split/stack) is linear and index-preserving,
    so it maps gradients exactly."""
    from src.model.u2tokenizer.u2Tokenizer import u2Tokenizer as TorchU2

    tm = TorchU2(
        embed_size=D_MODEL, num_heads=HEADS, num_layers=2, top_k=32,
        use_multi_scale=True, num_3d_query_token=8, hidden_size=D_MODEL,
        attn_type="rma")
    randomize_torch_module(tm, 34, std=0.02)
    v = rand((2, 4, 16, D_MODEL), 35) * 0.5
    t = rand((2, 13, D_MODEL), 36) * 0.5
    w = rand((2, 8, D_MODEL), 37)
    params = {"params": u2tokenizer_params(tm)}
    (tm(v, t) * w).sum().backward()
    # push grads through the converter via a DEEP COPY: the converter's
    # numpy leaves share memory with the source tensors (and jax CPU may
    # zero-copy them), so mutating tm in place would corrupt `params`
    import copy

    gm = copy.deepcopy(tm)
    with torch.no_grad():
        for p, src in zip(gm.parameters(), tm.parameters()):
            p.copy_(src.grad if src.grad is not None
                    else torch.zeros_like(src))
    ref_grads = u2tokenizer_params(gm)

    cfg = U2TokenizerConfig(num_heads=HEADS, num_layers=2, top_k=32,
                            use_multi_scale=True, num_query_tokens=8,
                            attn_type="rma", max_seq_len=512)
    fm = U2Tokenizer(D_MODEL, cfg)
    wj = jnp.asarray(t2n(w))
    vj, tj = jnp.asarray(t2n(v)), jnp.asarray(t2n(t))

    grads = jax.grad(
        lambda p: (fm.apply(p, vj, tj) * wj).sum())(params)["params"]
    flat_g = jax.tree_util.tree_leaves_with_path(grads)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(ref_grads))
    assert flat_g and len(flat_g) == len(flat_r)
    for path, g in flat_g:
        r = np.asarray(flat_r[path])
        scale = max(1.0, float(np.abs(r).max()))
        np.testing.assert_allclose(
            np.asarray(g), r, rtol=0, atol=3e-4 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_svr_parity_strict_atol():
    """Fixed-seed, small-std case with STRICT absolute tolerance (no
    magnitude scaling): hardens the parity claim against the norm-free SVR
    stack's activation growth (r1 weak item 9) — with std=0.02 weights the
    activations stay O(1) and fp32 ulp drift must stay below 1e-5."""
    from src.model.u2tokenizer.svr import (
        SpatioTemporalVisualTokenRefinerModel as TorchSVR,
    )

    tm = TorchSVR(embed_size=D_MODEL, num_heads=HEADS, num_layers=2,
                  top_k=32, use_multi_scale=True, attn_type="rma")
    randomize_torch_module(tm, 21, std=0.02)
    x = rand((2, 4, 16, D_MODEL), 22) * 0.5
    with torch.no_grad():
        ref = t2n(tm(x))
    assert np.abs(ref).max() < 10.0  # small-std keeps activations O(1)

    fm = SpatioTemporalVisualTokenRefiner(
        embed_size=D_MODEL, num_heads=HEADS, num_layers=2, top_k=32,
        use_multi_scale=True, attn_type="rma", max_seq_len=512)
    params = {"params": svr_params(tm)}
    out = fm.apply(params, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-5)
