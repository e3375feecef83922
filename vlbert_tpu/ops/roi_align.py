"""ROIAlign for TPU — exact reference semantics, MXU-friendly formulation.

Reference semantics (ref: common/lib/roi_pooling/cuda/ROIAlign_cuda.cu:15-122):
  * rois are (x1, y1, x2, y2) in image coords, scaled by ``spatial_scale``
    with NO rounding (":81-89 'this implementation detail is critical'"),
  * malformed rois are forced to >= 1x1 in feature coords (:92-93),
  * each of the P x P output bins averages a gh x gw grid of bilinear samples,
    where gh = ceil(roi_h / P) when sampling_ratio == 0 (adaptive, :100-101),
  * bilinear taps: points with y < -1 or y > H contribute 0 (:22-25); y is
    clamped to 0 from below (:27-28); at the top edge y_low = y_high = H-1
    (:35-47),
  * computed in fp32 even under half-precision training
    (ref: common/lib/roi_pooling/roi_align.py:69).

TPU-native key idea — **separability**: the sample grid is a tensor product
(y depends only on iy, x only on ix), and bilinear interpolation is separable,
so the bin average factorizes EXACTLY:

    avg_{iy,ix} w_y(iy) (x) w_x(ix)  =  [avg_iy w_y(iy)] (x) [avg_ix w_x(ix)]

Hence ROIAlign reduces to two small dense contractions per ROI with
row-interp weights Ry[K,P,H] and column-interp weights Cx[K,P,W]:

    out[k,p,q,c] = sum_{h,w} Ry[k,p,h] * Cx[k,q,w] * F[b_k,h,w,c]

which XLA maps onto the MXU instead of K*P*P*gh*gw*4 scalar gathers. The
backward pass is the transposed pair of contractions, so jax autodiff of this
formulation is both exact and efficient — no custom VJP needed.

Layout: features are NHWC (TPU-native); rois are [B, O, 4] padded per image
with a validity mask (static shapes — the reference's flat [K,5] roi list
with dynamic K becomes a fixed O-slot per-image layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Static cap on the sampling grid. Adaptive grids are ceil(roi_size/P):
# inputs <= ~1400px at stride 16 with P=14 give grids <= 7, so the clamp is
# never hit by any shipped config. If an ROI ever exceeds MAX_GRID*P feature
# pixels the clamped grid averages FEWER samples than the CUDA reference
# (values differ, not just speed); raise MAX_GRID for such workloads.
# Explicit sampling_ratio > MAX_GRID is rejected outright — silently
# clamping it would mis-normalize the bin average.
MAX_GRID = 8


def _interp_weights(start, roi_size, grid_n, pooled_size, fm_size):
    """1-D separable interpolation weights for one axis.

    Args:
      start:     [*B] roi start in feature coords (fp32)
      roi_size:  [*B] roi extent in feature coords (>= 1)
      grid_n:    [*B] int32 adaptive sample count per bin (<= MAX_GRID)
      pooled_size: static P
      fm_size:   static H (or W)
    Returns:
      weights [*B, P, fm_size] such that
      out_row[p] = sum_h weights[p, h] * feature_row[h] equals the average of
      grid_n bilinear samples in bin p (ref RoIAlignForward :104-118).
    """
    bin_size = roi_size / pooled_size                       # [*B]
    p = jnp.arange(pooled_size, dtype=jnp.float32)          # [P]
    g = jnp.arange(MAX_GRID, dtype=jnp.float32)             # [G]
    grid_f = grid_n.astype(jnp.float32)

    # sample coordinate y = start + p*bin + (g+0.5)*bin/grid_n  (ref :109,112)
    y = (start[..., None, None]
         + p[:, None] * bin_size[..., None, None]
         + (g[None, :] + 0.5) * bin_size[..., None, None]
         / grid_f[..., None, None])                         # [*B, P, G]

    valid = (g[None, :] < grid_f[..., None, None])          # sample exists
    in_range = (y >= -1.0) & (y <= fm_size)                 # ref :22-25
    yc = jnp.maximum(y, 0.0)                                # ref :27-28
    y_low = jnp.floor(yc)
    top = y_low >= fm_size - 1                              # ref :35-47
    y_low = jnp.where(top, fm_size - 1.0, y_low)
    y_high = jnp.where(top, fm_size - 1.0, y_low + 1.0)
    ly = jnp.where(top, 0.0, yc - y_low)

    contrib = jnp.where(valid & in_range, 1.0 / grid_f[..., None, None], 0.0)
    low_w = contrib * (1.0 - ly)                            # [*B, P, G]
    high_w = contrib * ly

    hh = jnp.arange(fm_size, dtype=jnp.int32)
    low_oh = (y_low.astype(jnp.int32)[..., None] == hh)     # [*B, P, G, H]
    high_oh = (y_high.astype(jnp.int32)[..., None] == hh)
    w = (low_w[..., None] * low_oh + high_w[..., None] * high_oh)
    return jnp.sum(w, axis=-2)                              # [*B, P, H]


def roi_align_weights(boxes, fm_h, fm_w, pooled_h, pooled_w,
                      spatial_scale, sampling_ratio=0):
    """Compute (Ry, Cx) separable weights for padded boxes [..., 4]."""
    boxes = boxes.astype(jnp.float32)
    x1 = boxes[..., 0] * spatial_scale                      # ref :82-85
    y1 = boxes[..., 1] * spatial_scale
    x2 = boxes[..., 2] * spatial_scale
    y2 = boxes[..., 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)                       # ref :92-93
    roi_h = jnp.maximum(y2 - y1, 1.0)

    if sampling_ratio > MAX_GRID:
        raise ValueError(
            f"sampling_ratio {sampling_ratio} exceeds the static grid cap "
            f"MAX_GRID={MAX_GRID} (weights would sum to "
            f"{MAX_GRID}/{sampling_ratio}); raise MAX_GRID to support it")
    if sampling_ratio > 0:                                  # ref :100-101
        gh = jnp.full(roi_h.shape, sampling_ratio, jnp.int32)
        gw = gh
    else:
        gh = jnp.minimum(jnp.ceil(roi_h / pooled_h), MAX_GRID).astype(jnp.int32)
        gw = jnp.minimum(jnp.ceil(roi_w / pooled_w), MAX_GRID).astype(jnp.int32)

    ry = _interp_weights(y1, roi_h, gh, pooled_h, fm_h)     # [..., P, H]
    cx = _interp_weights(x1, roi_w, gw, pooled_w, fm_w)     # [..., Q, W]
    return ry, cx


def _roi_align_pallas_fwd(features, ry, cx):
    """Pallas kernel: per-(image, roi) separable contraction, feature map
    resident in VMEM.

    features [B, H, W, C] (any float; fp32 compute), ry [B, O, P, H],
    cx [B, O, Q, W] -> [B, O, P, Q, C] fp32.

    Grid is (B, O): each step DMAs one image's stride-16 feature map
    (~3-6 MB) into VMEM once per O-row and runs P+1 small MXU matmuls —
    no [B,O,P,W,C] HBM intermediate like the XLA einsum path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = features.shape
    O, P = ry.shape[1], ry.shape[2]
    Q = cx.shape[2]

    def kernel(f_ref, ry_ref, cx_ref, o_ref):
        f = f_ref[0].astype(jnp.float32)              # [H, W, C]
        w_row = ry_ref[0, 0]                          # [P, H]
        w_col = cx_ref[0, 0]                          # [Q, W]
        # rows: [P, H] x [H, W*C] -> [P, W, C]
        tmp = jax.lax.dot_general(
            w_row, f.reshape(H, W * C), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(P, W, C)
        # cols: per output row p, [Q, W] x [W, C]
        for p in range(P):
            o_ref[0, 0, p] = jax.lax.dot_general(
                w_col, tmp[p], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    return pl.pallas_call(
        kernel,
        grid=(B, O),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, o: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, H), lambda b, o: (b, o, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Q, W), lambda b, o: (b, o, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, P, Q, C),
                               lambda b, o: (b, o, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, O, P, Q, C), jnp.float32),
        interpret=interpret,
    )(features, ry, cx)


@jax.custom_vjp
def _roi_align_separable(features, ry, cx):
    return _roi_align_pallas_fwd(features, ry, cx)


def _sep_fwd(features, ry, cx):
    return _roi_align_pallas_fwd(features, ry, cx), (features, ry, cx)


def _sep_bwd(res, g):
    features, ry, cx = res
    g = g.astype(jnp.float32)
    f32 = features.astype(jnp.float32)
    # d f[b,h,w,c] = sum_{o,p,q} ry[boph] cx[boqw] g[bopqc]
    gy = jnp.einsum("boqw,bopqc->bopwc", cx, g,
                    preferred_element_type=jnp.float32)
    df = jnp.einsum("boph,bopwc->bhwc", ry, gy,
                    preferred_element_type=jnp.float32)
    tmp = jnp.einsum("boph,bhwc->bopwc", ry, f32,
                     preferred_element_type=jnp.float32)
    dcx = jnp.einsum("bopqc,bopwc->boqw", g, tmp,
                     preferred_element_type=jnp.float32)
    fc = jnp.einsum("boqw,bhwc->boqhc", cx, f32,
                    preferred_element_type=jnp.float32)
    dry = jnp.einsum("bopqc,boqhc->boph", g, fc,
                     preferred_element_type=jnp.float32)
    return df.astype(features.dtype), dry, dcx


_roi_align_separable.defvjp(_sep_fwd, _sep_bwd)


@functools.partial(
    jax.jit, static_argnames=("pooled_h", "pooled_w", "spatial_scale",
                              "sampling_ratio", "chunk", "impl"))
def roi_align(features, boxes, box_mask, *, pooled_h=14, pooled_w=14,
              spatial_scale=1.0 / 16, sampling_ratio=0, chunk=None,
              impl="xla"):
    """Batched ROIAlign.

    Args:
      features: [B, H, W, C] feature map (any float dtype; compute is fp32)
      boxes:    [B, O, 4] (x1, y1, x2, y2) image coords, padded
      box_mask: [B, O] validity (padded slots produce zeros)
      chunk:    optional static chunk size over O to bound the [.., P, W, C]
                intermediate; None = single shot.
    Returns:
      [B, O, pooled_h, pooled_w, C] fp32
    """
    B, H, W, C = features.shape
    O = boxes.shape[1]
    f32 = features.astype(jnp.float32)   # fp32 compute (ref roi_align.py:69)

    ry, cx = roi_align_weights(boxes, H, W, pooled_h, pooled_w,
                               spatial_scale, sampling_ratio)
    mask = box_mask.astype(jnp.float32)[..., None, None]
    ry = ry * mask                                          # zero padded rois
    cx = cx * mask

    if impl == "pallas":
        return _roi_align_separable(features, ry, cx)

    def apply_chunk(ry_c, cx_c):
        # rows: [B, o, P, H] x [B, H, W, C] -> [B, o, P, W, C]
        tmp = jnp.einsum("boph,bhwc->bopwc", ry_c, f32,
                         preferred_element_type=jnp.float32)
        # cols: [B, o, Q, W] x [B, o, P, W, C] -> [B, o, P, Q, C]
        return jnp.einsum("boqw,bopwc->bopqc", cx_c, tmp,
                          preferred_element_type=jnp.float32)

    if chunk is None or chunk >= O:
        return apply_chunk(ry, cx)

    n = -(-O // chunk)
    pad = n * chunk - O
    ry_p = jnp.pad(ry, ((0, 0), (0, pad), (0, 0), (0, 0)))
    cx_p = jnp.pad(cx, ((0, 0), (0, pad), (0, 0), (0, 0)))
    ry_s = ry_p.reshape(B, n, chunk, pooled_h, H).transpose(1, 0, 2, 3, 4)
    cx_s = cx_p.reshape(B, n, chunk, pooled_w, W).transpose(1, 0, 2, 3, 4)
    out = jax.lax.map(lambda rc: apply_chunk(*rc), (ry_s, cx_s))
    out = out.transpose(1, 0, 2, 3, 4, 5).reshape(
        B, n * chunk, pooled_h, pooled_w, C)
    return out[:, :O]
