"""Golden-parity utilities: transfer weights from the reference PyTorch
μ²tokenizer modules (imported read-only from /root/reference as a test
oracle) into our flax modules, so outputs can be compared numerically.

The reference code is never vendored — it is imported at test time only,
exactly like comparing against any third-party library.
"""

import sys

import numpy as np

REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)


def t2n(t):
    return np.asarray(t.detach().cpu().numpy())


def linear_params(torch_linear):
    """torch nn.Linear -> flax Dense param dict."""
    p = {"kernel": t2n(torch_linear.weight).T}
    if torch_linear.bias is not None:
        p["bias"] = t2n(torch_linear.bias)
    return p


def layernorm_params(torch_ln):
    return {"scale": t2n(torch_ln.weight), "bias": t2n(torch_ln.bias)}


def rma_params(m, compress_used=False):
    """Reference RelativeMultiheadAttention / RotaryMultiheadAttention /
    MultiHeadCrossAttention -> our attention param dict.

    compress_used: the module is only ever called with is_compress=True, so
    our flax module never created wv/dense params — skip them.
    """
    p = {"wq": linear_params(m.wq), "wk": linear_params(m.wk)}
    if not compress_used:
        p["wv"] = linear_params(m.wv)
        p["dense"] = linear_params(m.dense)
    if hasattr(m, "relative_bias"):
        p["relative_bias"] = t2n(m.relative_bias)
    return p


def svr_layer_params(layer):
    return {
        "spatial_attention": rma_params(layer.spatial_attention),
        "temporal_attention": rma_params(layer.temporal_attention),
    }


def svr_params(m):
    """Reference SpatioTemporalVisualTokenRefinerModel -> our SVR params."""
    p = {}
    for i, layer in enumerate(m.attention_network.layers):
        p[f"layers_{i}"] = svr_layer_params(layer)
    ts = m.token_selection
    p["token_selection"] = {"score_net": linear_params(ts.score_net)}
    if getattr(m, "enable_dmtp", False):
        p["dynamic_pool"] = {
            "gate_kernel": t2n(m.dynamic_pool.gate_fc.weight).T,
            "gate_bias": t2n(m.dynamic_pool.gate_fc.bias),
        }
    return p


def tta_layer_params(layer):
    return {
        "self_attention": rma_params(layer.self_attention),
        "visual_cross_attention": rma_params(layer.visual_cross_attention),
        "text_cross_attention": rma_params(layer.text_cross_attention),
        "norm_self": layernorm_params(layer.norm_self),
        "norm_cross_v": layernorm_params(layer.norm_cross_v),
        "norm_cross_t": layernorm_params(layer.norm_cross_t),
    }


def tta_params(m):
    p = {}
    for i, layer in enumerate(m.layers_vt):
        p[f"layers_vt_{i}"] = tta_layer_params(layer)
    p["layer_linagg"] = {
        "linear_aggregator": rma_params(
            m.layer_linagg.linear_aggregator, compress_used=True)
    }
    return p


def u2tokenizer_params(m):
    return {
        "query_tokens": t2n(m.query_tokens),
        "svt_module": svr_params(m.svt_module),
        "tta_module": tta_params(m.tta_module),
    }


def randomize_torch_module(m, seed=0, std=0.2):
    """Fill every parameter with reproducible random values (zero-init params
    like relative_bias would otherwise hide indexing bugs)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * std)
    return m
