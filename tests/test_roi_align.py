"""ROIAlign golden-value tests.

The numpy implementation below follows the CUDA kernel algorithm literally
(per-sample scalar loop, ref: common/lib/roi_pooling/cuda/ROIAlign_cuda.cu:
15-122) and is the golden reference; the framework's separable-matmul
formulation must match it to float precision.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from vlbert_tpu.ops.roi_align import roi_align, MAX_GRID


def bilinear_interpolate_np(data, height, width, y, x):
    # ref ROIAlign_cuda.cu:15-62
    if y < -1.0 or y > height or x < -1.0 or x > width:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= height - 1:
        y_high = y_low = height - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= width - 1:
        x_high = x_low = width - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    v1 = data[y_low, x_low]
    v2 = data[y_low, x_high]
    v3 = data[y_high, x_low]
    v4 = data[y_high, x_high]
    return hy * hx * v1 + hy * lx * v2 + ly * hx * v3 + ly * lx * v4


def roi_align_np(features, rois, pooled_h, pooled_w, spatial_scale,
                 sampling_ratio=0):
    """features [B,H,W,C]; rois [K,5] = (batch_idx, x1, y1, x2, y2)."""
    B, H, W, C = features.shape
    K = rois.shape[0]
    out = np.zeros((K, pooled_h, pooled_w, C), np.float64)
    for k in range(K):
        b = int(rois[k, 0])
        x1, y1, x2, y2 = rois[k, 1:] * spatial_scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_h = roi_h / pooled_h
        bin_w = roi_w / pooled_w
        gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h / pooled_h))
        gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w / pooled_w))
        count = gh * gw
        for ph in range(pooled_h):
            for pw in range(pooled_w):
                for c in range(C):
                    acc = 0.0
                    for iy in range(gh):
                        yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                        for ix in range(gw):
                            xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                            acc += bilinear_interpolate_np(
                                features[b, :, :, c], H, W, yy, xx)
                    out[k, ph, pw, c] = acc / count
    return out.astype(np.float32)


def _random_case(rng, B=2, O=5, H=12, W=10, C=3, img_scale=16.0):
    features = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # boxes in image coords; include tiny (malformed -> 1x1), huge, and
    # out-of-bounds boxes
    boxes = np.zeros((B, O, 4), np.float32)
    for b in range(B):
        for o in range(O):
            x1 = rng.uniform(-5, W * img_scale * 0.8)
            y1 = rng.uniform(-5, H * img_scale * 0.8)
            x2 = x1 + rng.uniform(0.1, W * img_scale * 0.5)
            y2 = y1 + rng.uniform(0.1, H * img_scale * 0.5)
            boxes[b, o] = (x1, y1, x2, y2)
    boxes[0, 1] = (30.0, 40.0, 30.5, 40.2)      # malformed (sub-pixel)
    mask = np.ones((B, O), bool)
    if B > 1 and O > 3:
        mask[1, 3:] = False
    return features, boxes, mask


@pytest.mark.parametrize("sampling_ratio", [0, 2])
@pytest.mark.parametrize("pooled", [(14, 14), (7, 7)])
def test_roi_align_matches_cuda_algorithm(rng, sampling_ratio, pooled):
    features, boxes, mask = _random_case(rng)
    ph, pw = pooled
    ours = np.asarray(roi_align(
        jnp.asarray(features), jnp.asarray(boxes), jnp.asarray(mask),
        pooled_h=ph, pooled_w=pw, spatial_scale=1 / 16,
        sampling_ratio=sampling_ratio))

    rois = []
    for b in range(boxes.shape[0]):
        for o in range(boxes.shape[1]):
            rois.append([b, *boxes[b, o]])
    golden = roi_align_np(features, np.asarray(rois, np.float32),
                          ph, pw, 1 / 16, sampling_ratio)
    golden = golden.reshape(boxes.shape[0], boxes.shape[1], ph, pw, -1)

    live = mask
    np.testing.assert_allclose(ours[live], golden[live], rtol=1e-5, atol=1e-5)
    # padded slots zeroed
    assert np.all(ours[~live] == 0)


def test_roi_align_chunked_equals_unchunked(rng):
    features, boxes, mask = _random_case(rng, O=7)
    a = np.asarray(roi_align(jnp.asarray(features), jnp.asarray(boxes),
                             jnp.asarray(mask), pooled_h=7, pooled_w=7))
    b = np.asarray(roi_align(jnp.asarray(features), jnp.asarray(boxes),
                             jnp.asarray(mask), pooled_h=7, pooled_w=7,
                             chunk=3))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_roi_align_differentiable(rng):
    import jax
    features, boxes, mask = _random_case(rng, B=1, O=2, H=8, W=8, C=2)

    def loss(f):
        out = roi_align(f, jnp.asarray(boxes), jnp.asarray(mask),
                        pooled_h=4, pooled_w=4)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(jnp.asarray(features))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_pallas_impl_matches_xla(rng):
    features, boxes, mask = _random_case(rng, B=2, O=5, H=12, W=10, C=128)
    a = np.asarray(roi_align(jnp.asarray(features), jnp.asarray(boxes),
                             jnp.asarray(mask), pooled_h=7, pooled_w=7,
                             impl="xla"))
    b = np.asarray(roi_align(jnp.asarray(features), jnp.asarray(boxes),
                             jnp.asarray(mask), pooled_h=7, pooled_w=7,
                             impl="pallas"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_pallas_impl_differentiable(rng):
    import jax

    features, boxes, mask = _random_case(rng, B=1, O=2, H=8, W=8, C=128)

    def loss(f, impl):
        out = roi_align(f, jnp.asarray(boxes), jnp.asarray(mask),
                        pooled_h=4, pooled_w=4, impl=impl)
        return jnp.sum(out ** 2)

    g_x = jax.grad(lambda f: loss(f, "xla"))(jnp.asarray(features))
    g_p = jax.grad(lambda f: loss(f, "pallas"))(jnp.asarray(features))
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_p),
                               rtol=1e-4, atol=1e-5)
