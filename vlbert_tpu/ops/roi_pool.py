"""ROIPool (max-pooling variant) — API-parity op.

ref: common/lib/roi_pooling/cuda/ROIPool_cuda.cu — max pool over each bin's
integer sub-window with rounded ROI coords. The reference exports it
alongside ROIAlign but FastRCNN only instantiates ROIAlign
(common/fast_rcnn.py:10-11,66); provided here for API completeness.

Implementation: one-hot bin-membership matmuls per axis with max-reduction —
static shapes, no gathers. Bin rule (CUDA kernel): roi coords are ROUNDED
after scaling, width/height forced >= 1, bin boundaries floor/ceil of
linear interpolation, clamped to the map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("pooled_h", "pooled_w",
                                             "spatial_scale"))
def roi_pool(features, boxes, box_mask, *, pooled_h=7, pooled_w=7,
             spatial_scale=1.0 / 16):
    """features [B,H,W,C] -> [B,O,ph,pw,C] max-pooled ROIs."""
    B, H, W, C = features.shape
    O = boxes.shape[1]
    f = features.astype(jnp.float32)

    b = boxes.astype(jnp.float32) * spatial_scale
    # CUDA round() is half-away-from-zero; jnp.round is half-to-even, which
    # shifts every x.5 coordinate (box coords at multiples of 8px land on
    # .5 at stride 16) one cell off the reference kernel. Coords are
    # non-negative, so floor(x + 0.5) reproduces the C round().
    x1 = jnp.floor(b[..., 0] + 0.5)
    y1 = jnp.floor(b[..., 1] + 0.5)
    x2 = jnp.floor(b[..., 2] + 0.5)
    y2 = jnp.floor(b[..., 3] + 0.5)
    roi_w = jnp.maximum(x2 - x1 + 1, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1, 1.0)

    def axis_membership(start, size, pooled, n):
        """[B,O,pooled,n] boolean: grid index in bin p's [floor, ceil)."""
        p = jnp.arange(pooled, dtype=jnp.float32)
        lo = jnp.floor(p[None, None, :] * size[..., None] / pooled
                       + start[..., None])
        hi = jnp.ceil((p[None, None, :] + 1) * size[..., None] / pooled
                      + start[..., None])
        lo = jnp.clip(lo, 0, n)
        hi = jnp.clip(hi, 0, n)
        idx = jnp.arange(n, dtype=jnp.float32)
        return ((idx >= lo[..., None]) & (idx < hi[..., None]))

    my = axis_membership(y1, roi_h, pooled_h, H)   # [B,O,ph,H]
    mx = axis_membership(x1, roi_w, pooled_w, W)   # [B,O,pw,W]

    NEG = jnp.float32(-1e30)

    # static loops over the (small) pooled grid keep intermediates at
    # [B, O, H, W, C] instead of a 6-D blowup
    def row_max(p):
        m = my[:, :, p][:, :, :, None, None]                # [B,O,H,1,1]
        return jnp.max(jnp.where(m, f[:, None], NEG), axis=2)  # [B,O,W,C]

    rows = jnp.stack([row_max(p) for p in range(pooled_h)], axis=2)

    def col_max(q):
        m = mx[:, :, q][:, :, None, :, None]                # [B,O,1,W,1]
        return jnp.max(jnp.where(m, rows, NEG), axis=3)     # [B,O,ph,C]

    out = jnp.stack([col_max(q) for q in range(pooled_w)], axis=3)
    # empty bins -> 0 (CUDA kernel init maxval=0 when bin empty)
    empty = (jnp.sum(my, 3) == 0)[:, :, :, None, None] | \
            (jnp.sum(mx, 3) == 0)[:, :, None, :, None]
    out = jnp.where(empty | (out <= NEG / 2), 0.0, out)
    return out * box_mask[..., None, None, None].astype(out.dtype)
