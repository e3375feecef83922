"""FastRCNN visual-feature extractor (ref: common/fast_rcnn.py:17-203).

Two modes, selected by ``image_feat_precomputed``:
  (a) precomputed: each box row is [x1, y1, x2, y2, feat_0..feat_2047]; the
      2048-d feature is sliced off (ref :140-142).
  (b) end-to-end: ResNet stages 1-4 -> stride-16 'body4' map, ROIAlign to
      14x14, conv5 ROI head + global average pool -> 2048-d (ref :144-158),
      optional per-box instance-mask multiply before pooling (VCR segms,
      ref :151-156), optional 81-way CNN regularization classifier
      (ref :102-103, :160-163).
Then for both modes: optional 128-d class embedding (ref :165-166), MVRC
visual-feature masking (ref :167-169), 2x4x256 sin/cos coordinate embeddings
prepended (ref :170-174), and the obj_downsample MLP
Dropout(0.1)+Linear+ReLU (ref :105-109).

TPU-native deltas: everything stays in the padded [B, O, ...] layout with a
box validity mask — the reference's dynamic nonzero/pad_sequence round-trip
(ref :136-138, :177-187) disappears; masked slots are zeroed at the end to
match the reference's zero padding.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlbert_tpu.models.resnet import ResNetC4Backbone, ResNetRoIHead
from vlbert_tpu.ops.coord_embed import coordinate_embeddings
from vlbert_tpu.ops.dropout import Dropout
from vlbert_tpu.ops.image_norm import normalize_uint8_image
from vlbert_tpu.ops.roi_align import roi_align


class FastRCNN(nn.Module):
    image_feat_precomputed: bool = False
    num_layers: int = 101
    stride_in_1x1: bool = False
    c5_dilated: bool = False
    frozen_stages: Sequence[int] = (1, 2)
    average_pool: bool = True
    final_dim: int = 768
    enable_cnn_reg_loss: bool = False
    image_semantic: bool = False  # 81-way class embedding (ref :31-34,68-71)
    roi_chunk: Optional[int] = None  # chunk ROIAlign intermediates
    roi_align_impl: str = "xla"      # 'xla' (einsum) | 'pallas' (kernel)
    # 1 = one bilinear sample per bin, the reference's effective value (its
    # FastRCNN builds ROIAlign without sampling_ratio, common/fast_rcnn.py:66,
    # whose ctor default is 1, common/lib/roi_pooling/roi_align.py:55);
    # 0 = adaptive ceil(roi/bin) grid. Parity with converted checkpoints
    # requires 1; adaptive was used through round 2 and diverges numerically.
    roi_sampling_ratio: int = 1
    # BGR caffe pixel stats for the on-device uint8 normalization path
    # (host ships uint8; see ops/image_norm.py)
    pixel_means: Sequence[float] = (102.9801, 115.9465, 122.7717)
    pixel_stds: Sequence[float] = (1.0, 1.0, 1.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, boxes, box_mask, im_info, classes=None,
                 segms=None, mvrc_ops=None, mask_visual_embed=None,
                 deterministic=True):
        """
        Args:
          images: [B, H, W, 3] NHWC (None in precomputed mode)
          boxes: [B, O, 4] or [B, O, 4+2048] (precomputed)
          box_mask: [B, O] validity
          im_info: [B, >=2] = (w_img, h_img, ...) per image
          classes: [B, O] int labels (optional, for object_embed / reg loss)
          segms: [B, O, mh, mw] instance masks (optional)
          mvrc_ops: [B, O] 1 = mask this region (optional)
          mask_visual_embed: [D] learned replacement feature (optional)
        Returns dict with obj_reps [B, O, final_dim], obj_reps_raw [B, O,
        2048], and optionally obj_logits/obj_labels/cnn_regularization_loss.
        """
        B, O = box_mask.shape
        maskf = box_mask.astype(jnp.float32)

        if images is not None and images.dtype == jnp.uint8:
            # uint8-on-the-wire input path: normalize on device (fused into
            # the first conv by XLA); dtype is the dispatch signal, so the
            # float path (and every parity test feeding pre-normalized
            # images) is untouched
            images = normalize_uint8_image(
                images, im_info, self.pixel_means, self.pixel_stds)

        if self.image_feat_precomputed:
            post_roialign = boxes[:, :, 4:]          # ref :141
            boxes = boxes[:, :, :4]
        else:
            backbone = ResNetC4Backbone(
                num_layers=self.num_layers, stride_in_1x1=self.stride_in_1x1,
                frozen_stages=tuple(s for s in self.frozen_stages if s <= 4),
                dtype=self.dtype, name="backbone")
            body4 = backbone(images)
            rois = roi_align(
                body4, boxes, box_mask, pooled_h=14, pooled_w=14,
                spatial_scale=1.0 / 16,
                sampling_ratio=self.roi_sampling_ratio,
                chunk=self.roi_chunk,
                impl=self.roi_align_impl)            # fp32, ref roi_align.py:69
            rois = rois.astype(self.dtype)

            head = ResNetRoIHead(
                num_layers=self.num_layers, c5_dilated=self.c5_dilated,
                stride_in_1x1=self.stride_in_1x1, average_pool=False,
                dtype=self.dtype, name="roi_head")
            feat = head(rois.reshape(B * O, 14, 14, rois.shape[-1]))
            fh = feat.shape[1]
            feat = feat.reshape(B, O, fh, fh, -1)
            if segms is not None:
                # instance-mask multiply before pooling (ref :151-156)
                feat = feat * segms[..., None].astype(feat.dtype)
            if self.average_pool:
                post_roialign = jnp.mean(
                    feat.astype(jnp.float32), axis=(2, 3))  # [B, O, 2048]
            else:
                post_roialign = feat
            # stage-5 freezing = requires_grad=False on HEAD params only
            # (ref :95-98); handled by the optimizer mask (optim.py
            # trainable_mask) so gradients still FLOW THROUGH the head to
            # stages 3-4. stop_gradient here is only a backward-DCE
            # optimization — valid only when EVERY upstream stage (1-4, not
            # just 3-4) is frozen, else it would zero trainable stages'
            # grads while weight decay keeps shrinking them.
            if {1, 2, 3, 4, 5} <= set(self.frozen_stages):
                post_roialign = jax.lax.stop_gradient(post_roialign)

        obj_labels = classes.astype(jnp.int32) if classes is not None else None

        outputs = {}
        if (not self.image_feat_precomputed) and self.enable_cnn_reg_loss:
            if obj_labels is None:
                # the reference crashes here (F.cross_entropy(None));
                # training against fabricated zeros would silently push
                # every ROI toward class 0
                raise ValueError(
                    "enable_cnn_reg_loss requires per-box `classes`")
            # ref :102-103,160-163: 81-way classifier on pooled roi features
            obj_logits = nn.Dense(
                81, dtype=self.dtype, param_dtype=jnp.float32,
                name="regularizing_predictor")(post_roialign.astype(self.dtype))
            obj_logits = obj_logits.astype(jnp.float32)
            logp = jax.nn.log_softmax(obj_logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, obj_labels[..., None], axis=-1)[..., 0]
            cnn_reg = jnp.sum(nll * maskf) / jnp.maximum(jnp.sum(maskf), 1.0)
            outputs.update(obj_logits=obj_logits, obj_labels=obj_labels,
                           cnn_regularization_loss=cnn_reg)

        feats = post_roialign
        if mvrc_ops is not None and mask_visual_embed is not None:
            # replace masked regions' visual features (ref :167-169) BEFORE
            # the class-embedding concat: mask_visual_embed has the bare
            # visual dim and cannot broadcast into the concat'd features
            feats = jnp.where((mvrc_ops == 1)[..., None],
                              mask_visual_embed.astype(feats.dtype), feats)

        if self.image_semantic and obj_labels is not None:
            class_emb = nn.Embed(
                81, 128, param_dtype=jnp.float32, dtype=self.dtype,
                embedding_init=nn.initializers.normal(0.02),
                name="object_embed")(jnp.clip(obj_labels, 0, 80))
            feats = jnp.concatenate(
                [feats.astype(self.dtype), class_emb], axis=-1)  # ref :165-166

        # coordinate embeddings: boxes + (w_img, h_img) -> [B,O,4,512] -> 2048
        coord_in = jnp.concatenate(
            [boxes[..., :4], jnp.broadcast_to(im_info[:, None, :2], (B, O, 2))],
            axis=-1)
        coord = coordinate_embeddings(coord_in, 256).reshape(B, O, -1)

        down_in = jnp.concatenate(
            [coord.astype(self.dtype), feats.astype(self.dtype)], axis=-1)
        down_in = Dropout(rate=0.1)(down_in, deterministic=deterministic)
        obj_reps = nn.Dense(
            self.final_dim, dtype=self.dtype, param_dtype=jnp.float32,
            name="obj_downsample")(down_in)
        obj_reps = nn.relu(obj_reps)

        # zero masked slots (reference pads with zeros, ref :177-187)
        outputs["obj_reps_raw"] = post_roialign * maskf[..., None].astype(post_roialign.dtype)
        outputs["obj_reps"] = obj_reps * maskf[..., None].astype(obj_reps.dtype)
        return outputs
