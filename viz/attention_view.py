"""Notebook-facing attention views (bertviz-equivalent Python API).

The reference vendors a bertviz fork whose two entry points are
``model_view`` (all layers x heads small multiples; ref
viz/bertviz/model_view.py:30, model_view.js) and a per-layer "head view"
that draws weighted token->token attention lines (ref
viz/bertviz/attention.py:5-184, driven from the
viz/model_view_vl-bert_coco.ipynb notebook). This module provides the same
browsing workflow over vlbert_tpu dumps (engine/vis.py:
``{i}_attention_probs.npy`` ``[layers, heads, L, L]`` + ``{i}_tokens.json``)
with matplotlib only — no JS/notebook-widget stack — so it renders inline
in any notebook and in CI. The standalone browser equivalent (including an
interactive head view) is viz/attention_viewer.html.

Usage (mirrors the reference notebook):

    import numpy as np, json
    from viz.attention_view import load_dump, model_view, head_view
    probs, tokens = load_dump("OUTPUT_DIR", 0)
    model_view(probs, tokens)              # layers x heads grid
    head_view(probs, tokens, layer=11)     # token->token lines, one layer
"""

from __future__ import annotations

import json
import os

import numpy as np


def load_dump(dump_dir, index=0):
    """Load one example's dump: (probs [layers, heads, L, L], tokens)."""
    probs = np.load(os.path.join(dump_dir, f"{index}_attention_probs.npy"))
    with open(os.path.join(dump_dir, f"{index}_tokens.json")) as f:
        tokens = json.load(f)
    if isinstance(tokens, dict):        # tolerate {"tokens": [...]} sidecars
        tokens = tokens.get("tokens", tokens)
    return probs, list(tokens)


def model_view(probs, tokens=None, *, cmap="viridis", log_scale=True,
               max_cols=None, figsize_per_cell=0.9):
    """All layers x heads small-multiples grid (bertviz model view).

    probs: [layers, heads, L, L]; returns the matplotlib Figure.
    """
    import matplotlib.pyplot as plt

    probs = np.asarray(probs)
    n_layers, n_heads = probs.shape[:2]
    cols = n_heads if max_cols is None else min(n_heads, max_cols)
    fig, axes = plt.subplots(
        n_layers, cols, squeeze=False,
        figsize=(cols * figsize_per_cell, n_layers * figsize_per_cell))
    show = np.log10(np.maximum(probs, 1e-6)) if log_scale else probs
    vmin, vmax = show.min(), show.max()
    for li in range(n_layers):
        for hi in range(cols):
            ax = axes[li][hi]
            ax.imshow(show[li, hi], cmap=cmap, vmin=vmin, vmax=vmax,
                      interpolation="nearest")
            ax.set_xticks([])
            ax.set_yticks([])
            if li == 0:
                ax.set_title(f"h{hi}", fontsize=7)
            if hi == 0:
                ax.set_ylabel(f"L{li}", fontsize=7, rotation=0,
                              labelpad=12, va="center")
    fig.suptitle("attention probs (rows: layers, cols: heads"
                 + (", log scale)" if log_scale else ")"), fontsize=9)
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    return fig


def head_view(probs, tokens, layer, *, heads=None, min_weight=0.05,
              query=None, cmap="tab10", figsize=None):
    """Weighted token->token attention lines for one layer (bertviz head
    view): query tokens on the left column, key tokens on the right, one
    color per head, line alpha/width proportional to the attention weight.

    heads: iterable of head indices (default: all); min_weight: hide lines
    below this probability; query: show only lines from this query position.
    Returns the matplotlib Figure.
    """
    import matplotlib.pyplot as plt
    from matplotlib import colormaps

    probs = np.asarray(probs)
    layer_p = probs[layer]                       # [heads, L, L]
    n_heads, L, _ = layer_p.shape
    tokens = list(tokens)[:L]
    heads = list(range(n_heads)) if heads is None else list(heads)
    colors = colormaps[cmap].resampled(max(n_heads, 1))

    if figsize is None:
        figsize = (6, max(4.0, 0.22 * L))
    fig, ax = plt.subplots(figsize=figsize)
    ys = np.linspace(1, 0, L)
    for i, tok in enumerate(tokens):
        ax.text(0.02, ys[i], tok, ha="right", va="center", fontsize=8,
                color="#222")
        ax.text(0.98, ys[i], tok, ha="left", va="center", fontsize=8,
                color="#222")
    for h in heads:
        for qi in ([query] if query is not None else range(L)):
            row = layer_p[h, qi]
            for ki in np.nonzero(row >= min_weight)[0]:
                w = float(row[ki])
                ax.plot([0.02, 0.98], [ys[qi], ys[ki]],
                        color=colors(h), alpha=min(1.0, w),
                        linewidth=0.5 + 2.5 * w, solid_capstyle="round")
    ax.set_xlim(-0.18, 1.18)
    ax.set_ylim(-0.03, 1.03)
    ax.axis("off")
    shown = ", ".join(f"h{h}" for h in heads)
    ax.set_title(f"layer {layer} ({shown}); lines >= {min_weight}",
                 fontsize=9)
    fig.tight_layout()
    return fig


def head_view_html(probs, tokens, layer, *, heads=None, min_weight=0.05):
    """Self-contained SVG/HTML string of the head view — for notebook
    environments without matplotlib display (``IPython.display.HTML``)."""
    probs = np.asarray(probs)
    layer_p = probs[layer]
    n_heads, L, _ = layer_p.shape
    tokens = list(tokens)[:L]
    heads = list(range(n_heads)) if heads is None else list(heads)
    palette = ["#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951",
               "#ff8ab7", "#a463f2", "#97bbf5", "#9c6b4e", "#9498a0",
               "#e45756", "#59a14f"]
    row_h, pad, width = 18, 90, 460
    height = pad // 3 + row_h * L
    y = lambda i: pad // 3 + row_h * i + row_h // 2  # noqa: E731
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
             f'height="{height}" font-family="sans-serif" font-size="11">']
    for h in heads:
        col = palette[h % len(palette)]
        for qi in range(L):
            row = layer_p[h, qi]
            for ki in np.nonzero(row >= min_weight)[0]:
                w = float(row[ki])
                parts.append(
                    f'<line x1="{pad}" y1="{y(qi)}" x2="{width - pad}" '
                    f'y2="{y(ki)}" stroke="{col}" '
                    f'stroke-opacity="{min(1.0, w):.3f}" '
                    f'stroke-width="{0.5 + 2.5 * w:.2f}"/>')
    for i, tok in enumerate(tokens):
        t = (tok.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;"))
        parts.append(f'<text x="{pad - 6}" y="{y(i) + 4}" '
                     f'text-anchor="end">{t}</text>')
        parts.append(f'<text x="{width - pad + 6}" y="{y(i) + 4}" '
                     f'text-anchor="start">{t}</text>')
    parts.append("</svg>")
    return "".join(parts)
