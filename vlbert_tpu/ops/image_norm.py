"""On-device image normalization for the uint8 input path.

TPU-first input design: the host ships uint8 RGB images (4x less host
memory traffic, pickle/IPC, and H2D transfer than float32), and the
BGR255-minus-caffe-mean normalization (ref common/.../transforms.py:82-97:
ToTensor -> Normalize(to_bgr255)) runs inside the jitted step, where XLA
fuses it into the first convolution's input — effectively free.

Semantics preserved exactly vs the host float path:
  * value = (uint8_pixel_BGR - mean) / std in fp32;
  * the FixPadding canvas region (x >= w or y >= h from im_info) is 0.0
    AFTER normalization (the reference pads the already-normalized tensor
    with zeros, ref transforms.py:100-120), reproduced here with an
    iota-based validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_uint8_image(images, im_info, pixel_means, pixel_stds,
                          to_bgr255=True):
    """[B, H, W, 3] uint8 RGB -> [B, H, W, 3] fp32 normalized, zero-padded.

    Args:
      images: [B, H, W, 3] uint8 (RGB order, as decoded).
      im_info: [B, >=2] (w, h, ...) of the valid (resized, pre-padding)
        region per image.
      pixel_means / pixel_stds: static 3-tuples in BGR order (caffe means),
        matching cfg.NETWORK.PIXEL_MEANS / PIXEL_STDS.
    """
    B, H, W, _ = images.shape
    if to_bgr255:
        x = images[..., ::-1].astype(jnp.float32)
    else:
        # reference to_bgr255=False operates on ToTensor's 0-1 RGB scale
        # (its means are 0-1-scale); keeping 0-255 here would make
        # activations ~255x too large
        x = images.astype(jnp.float32) / 255.0
    x = x - jnp.asarray(pixel_means, jnp.float32)
    stds = tuple(float(s) for s in pixel_stds)
    if any(s != 1.0 for s in stds):
        x = x / jnp.asarray(stds, jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (1, H, W, 1), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (1, H, W, 1), 1)
    w = im_info[:, 0].reshape(B, 1, 1, 1).astype(jnp.float32)
    h = im_info[:, 1].reshape(B, 1, 1, 1).astype(jnp.float32)
    valid = (xs < w) & (ys < h)
    return jnp.where(valid, x, 0.0)
