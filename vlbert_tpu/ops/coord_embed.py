"""Sin/cos coordinate embeddings of bounding boxes.

ref: common/utils/bbox.py:33-65 — boxes [..., 6] = (x1, y1, x2, y2, w_img,
h_img) are converted to (x_c, y_c, w, h), normalized to percent of image
size, and expanded to sin/cos features with frequency base 1000.
Returns [..., 4, 2*dim].
"""

from __future__ import annotations

import jax.numpy as jnp


def coordinate_embeddings(boxes, dim):
    boxes = boxes.astype(jnp.float32)
    w_img = boxes[..., 4]
    h_img = boxes[..., 5]

    xc = (boxes[..., 0] + boxes[..., 2]) / 2
    yc = (boxes[..., 1] + boxes[..., 3]) / 2
    bw = boxes[..., 2] - boxes[..., 0]
    bh = boxes[..., 3] - boxes[..., 1]

    pos = jnp.stack([
        xc / w_img * 100,
        yc / h_img * 100,
        bw / w_img * 100,
        bh / h_img * 100,
    ], axis=-1)                                              # [..., 4]

    dim_mat = 1000.0 ** (jnp.arange(dim, dtype=jnp.float32) / dim)
    arg = pos[..., None] / dim_mat                           # [..., 4, dim]
    return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)
