"""Attention-map visualization — the demo-notebook deliverable.

The reference ships attention introspection as ``return_attn`` paths consumed
by ``src/demo/demo_show.ipynb`` (SVR first-layer spatial/temporal maps,
svr.py:50-62; TTA first-layer self/visual-cross/text-cross maps,
tta.py:126-140). This module is the equivalent artifact as a library + CLI
(``cli.py demo --attention out.png``): capture the sown softmax maps from one
forward and render them over the CT volume.

Outputs, per figure row:
  * CT middle slice per depth-chunk with the SVR spatial-attention salience
    (mean attention received per token, reshaped to the projector's (H', W')
    token grid and upsampled) overlaid as a heatmap.
  * SVR temporal T×T attention matrix (chunk-to-chunk).
  * TTA query→visual salience over the refined tokens and query→text weights
    per question token.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def capture_attention_maps(model, params, images, question_ids) -> Dict[str, np.ndarray]:
    """One vision forward with attention capture; returns named maps.

    Keys: ``svr_spatial`` (B, T, H, N, N), ``svr_temporal`` (B, N, H, T, T),
    ``tta_self`` (B, H, Q, Q), ``tta_cross_visual`` (B, H, Q, Nv),
    ``tta_cross_text`` (B, H, Q, St). All first-layer maps (the reference
    captures layer 0 only).
    """
    import jax.numpy as jnp

    b, t = images.shape[:2]
    _, state = model.apply(
        params, jnp.asarray(images), jnp.asarray(question_ids),
        mutable=["intermediates"], method="encode_vision_with_attention")
    inter = state["intermediates"]

    def find(tree, path):
        node = tree
        for key in path:
            node = node[key]
        return np.asarray(node["attn"][0], np.float32)

    u2 = inter["u2tokenizer"]
    spatial = find(u2, ["svt_module", "layers_0", "spatial_attention"])
    temporal = find(u2, ["svt_module", "layers_0", "temporal_attention"])
    n = spatial.shape[-1]
    maps = {
        "svr_spatial": spatial.reshape(b, t, *spatial.shape[1:]),
        "svr_temporal": temporal.reshape(b, n, *temporal.shape[1:]),
        "tta_self": find(u2, ["tta_module", "layers_vt_0", "self_attention"]),
        "tta_cross_visual": find(
            u2, ["tta_module", "layers_vt_0", "visual_cross_attention"]),
        "tta_cross_text": find(
            u2, ["tta_module", "layers_vt_0", "text_cross_attention"]),
    }
    return maps


def spatial_salience(maps: Dict[str, np.ndarray],
                     grid_hw: Optional[tuple] = None) -> np.ndarray:
    """Per-token received attention from the SVR spatial map: mean over
    heads and query positions -> (B, T, N), optionally reshaped to
    (B, T, H', W') when ``grid_hw`` (the projector token grid) is given."""
    sal = maps["svr_spatial"].mean(axis=(2, 3))  # (B, T, N)
    if grid_hw is not None:
        b, t, n = sal.shape
        h, w = grid_hw
        if h * w == n:
            sal = sal.reshape(b, t, h, w)
    return sal


def _upsample2d(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor upsample for heatmap overlay (display only)."""
    h, w = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def render_attention_png(maps: Dict[str, np.ndarray], volume: np.ndarray,
                         out_path: str, question_tokens=None,
                         grid_hw: Optional[tuple] = None) -> str:
    """Render the captured maps for batch row 0 into one PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = volume.shape[0]
    n_cols = max(t, 4)
    fig, axes = plt.subplots(3, n_cols, figsize=(3 * n_cols, 9))
    for ax in axes.ravel():
        ax.axis("off")

    sal = spatial_salience(maps, grid_hw)[0]  # (T, N) or (T, H', W')
    for ci in range(t):
        ax = axes[0][ci]
        mid = volume[ci, volume.shape[1] // 2]
        ax.imshow(mid, cmap="gray")
        s = sal[ci]
        if s.ndim == 1:  # no grid: square-ish fallback
            side = int(np.sqrt(s.shape[0]))
            s = s[: side * side].reshape(side, side)
        ax.imshow(_upsample2d(s, *mid.shape), cmap="inferno", alpha=0.45)
        ax.set_title(f"chunk {ci} spatial", fontsize=8)

    ax = axes[1][0]
    ax.imshow(maps["svr_temporal"][0].mean(axis=(0, 1)), cmap="viridis")
    ax.set_title("temporal T×T", fontsize=8)
    ax.axis("on")

    ax = axes[1][1]
    ax.imshow(maps["tta_self"][0].mean(axis=0), cmap="viridis")
    ax.set_title("TTA query self-attn", fontsize=8)
    ax.axis("on")

    ax = axes[1][2]
    ax.imshow(maps["tta_cross_visual"][0].mean(axis=0), cmap="viridis",
              aspect="auto")
    ax.set_title("TTA query→visual", fontsize=8)
    ax.axis("on")

    ax = axes[1][3]
    ax.imshow(maps["tta_cross_text"][0].mean(axis=0), cmap="viridis",
              aspect="auto")
    ax.set_title("TTA query→text", fontsize=8)
    ax.axis("on")

    # text-token weights: mean attention each question token receives
    ax = axes[2][0]
    tw = maps["tta_cross_text"][0].mean(axis=(0, 1))
    ax.bar(np.arange(len(tw)), tw)
    ax.set_title("per-question-token weight", fontsize=8)
    ax.axis("on")
    if question_tokens is not None:
        k = min(len(question_tokens), len(tw))
        ax.set_xticks(np.arange(k))
        ax.set_xticklabels(question_tokens[:k], rotation=90, fontsize=5)

    # visual-token salience from the aggregator's perspective
    ax = axes[2][1]
    vw = maps["tta_cross_visual"][0].mean(axis=(0, 1))
    ax.plot(vw)
    ax.set_title("refined-token salience", fontsize=8)
    ax.axis("on")

    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
