"""Task modules: ResNet-VLBERT heads for VCR / VQA / RefCOCO+ / pretraining.

These mirror the reference task modules' semantics:
  * VCR:     vcr/modules/resnet_vlbert_for_vcr.py
  * VQA:     vqa/modules/resnet_vlbert_for_vqa.py
  * RefCOCO: refcoco/modules/resnet_vlbert_for_refcoco.py
  * Pretrain (multitask): pretrain/modules/resnet_vlbert_for_pretraining_multitask.py

TPU-native deltas:
  * text assembly ([CLS] Q [SEP] A [SEP] scatter, ref vcr:135-224) moves to
    the HOST collator (pure data rearrangement, no params) — modules receive
    pre-assembled, statically shaped text tensors;
  * the reference's per-forward trim-to-batch-max of boxes (ref vcr:243-251)
    is dropped: static [B, O] layout with masks throughout;
  * the reference's "pad back for DataParallel" contortions disappear;
  * ``train_forward``/``inference_forward`` dispatch (ref common/module.py:
    19-51) becomes an explicit ``train`` argument on __call__ — two jitted
    apply functions sharing one param tree.

Every module returns (outputs_dict, loss) in train mode and outputs_dict in
inference mode, matching the reference Module contract.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlbert_tpu.models.bert import ACT2FN, BertLayerNorm, bert_dense
from vlbert_tpu.models.fast_rcnn import FastRCNN
from vlbert_tpu.ops.dropout import Dropout
from vlbert_tpu.models.vlbert import (
    VisualLinguisticBert,
    VisualLinguisticBertForPretraining,
    VLBertConfig,
)
from vlbert_tpu.utils import losses


def collect_obj_reps(span_tags, object_reps):
    """Gather per-token grounded object features by text tags
    (ref: vcr/modules/resnet_vlbert_for_vcr.py:116-133). Masked/negative tags
    fall back to object 0 (the whole-image box)."""
    tags = jnp.clip(span_tags, 0, object_reps.shape[1] - 1).astype(jnp.int32)
    flat_tags = tags.reshape(tags.shape[0], -1)                # [B, prod]
    out = jnp.take_along_axis(object_reps, flat_tags[..., None], axis=1)
    return out.reshape(*tags.shape, object_reps.shape[-1])


def generic_obj_vl_embeddings(embed_table, obj_reps, mask_fn=None):
    """cat(visual feature, GENERIC object linguistic embedding) — the
    mode-2 object VL assembly shared by VQA/RefCOCO/pretraining/vis
    (ref e.g. vqa module :137-142); ``mask_fn`` lets pretraining swap the
    masked regions' linguistic embedding first (ref :140-141)."""
    B, O = obj_reps.shape[:2]
    obj_ling = embed_table(jnp.zeros((B, O), jnp.int32))
    if mask_fn is not None:
        obj_ling = mask_fn(obj_ling)
    return jnp.concatenate([obj_reps, obj_ling.astype(obj_reps.dtype)], -1)


class MVRCHeadTransform(nn.Module):
    """dense+act transform (ref: common/visual_linguistic_bert.py:473-486)."""

    hidden_size: int
    hidden_act: str
    initializer_range: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = bert_dense(self.hidden_size, self.initializer_range, self.dtype,
                       "dense")(x)
        return ACT2FN[self.hidden_act](x)


class Classifier(nn.Module):
    """final_mlp variants (ref: vcr:68-84, vqa:55-78).

    kind: '2fc' (drop-lin-relu-drop-lin), '1fc' (drop-lin),
          'mlm' (BertPredictionHeadTransform + drop + lin).
    """

    kind: str
    out_dim: int
    hidden_size: int
    classifier_hidden: int
    dropout: float
    hidden_act: str = "gelu"
    initializer_range: float = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        xavier = nn.initializers.xavier_uniform()
        if self.kind == "2fc":
            x = Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.Dense(self.classifier_hidden, kernel_init=xavier,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="dense_0")(x)
            x = nn.relu(x)
            x = Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.Dense(self.out_dim, kernel_init=xavier, dtype=self.dtype,
                         param_dtype=jnp.float32, name="dense_1")(x)
        elif self.kind == "1fc":
            x = Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.Dense(self.out_dim, kernel_init=xavier, dtype=self.dtype,
                         param_dtype=jnp.float32, name="dense_0")(x)
        elif self.kind == "mlm":
            x = bert_dense(self.hidden_size, self.initializer_range,
                           self.dtype, "transform_dense")(x)
            x = ACT2FN[self.hidden_act](x)
            x = BertLayerNorm(name="transform_LayerNorm")(x)
            x = Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.Dense(self.out_dim, kernel_init=xavier, dtype=self.dtype,
                         param_dtype=jnp.float32, name="dense_0")(x)
        else:
            raise ValueError(f"unsupported classifier type {self.kind!r}")
        return x.astype(jnp.float32)


def _fast_rcnn_from_cfg(cfg, vl_cfg, enable_cnn_reg_loss=False, name="image_feature_extractor"):
    n = cfg.NETWORK
    tpu = cfg.TPU if "TPU" in cfg else None
    return FastRCNN(
        image_feat_precomputed=n.IMAGE_FEAT_PRECOMPUTED,
        num_layers=n.IMAGE_NUM_LAYERS,
        stride_in_1x1=n.IMAGE_STRIDE_IN_1x1,
        c5_dilated=n.IMAGE_C5_DILATED,
        frozen_stages=tuple(n.IMAGE_FROZEN_BACKBONE_STAGES),
        final_dim=n.IMAGE_FINAL_DIM,
        enable_cnn_reg_loss=enable_cnn_reg_loss,
        image_semantic=n.IMAGE_SEMANTIC,
        roi_align_impl=(tpu.get("ROI_ALIGN_IMPL", "xla") if tpu else "xla"),
        # bound the [B,O,P,W,C] ROIAlign intermediate on memory-tight runs
        roi_chunk=(tpu.get("ROI_CHUNK", None) if tpu else None),
        # 1 = reference parity (its ROIAlign ctor default); 0 = adaptive grid
        roi_sampling_ratio=(tpu.get("ROI_SAMPLING_RATIO", 1) if tpu else 1),
        pixel_means=tuple(n.PIXEL_MEANS or (102.9801, 115.9465, 122.7717)),
        pixel_stds=tuple(n.PIXEL_STDS or (1.0, 1.0, 1.0)),
        dtype=vl_cfg.dtype,
        name=name,
    )


class ResNetVLBERTForVCR(nn.Module):
    """VCR Q2A / QA2R model (ref: vcr/modules/resnet_vlbert_for_vcr.py).

    Text arrives pre-assembled per choice: [B, C, T] input ids / type ids /
    tags / mask (built by the host collator with the reference's
    prepare_text_from_qa semantics, incl. ANSWER_FIRST / QA_ONE_SENT).
    """

    config: Any           # full task AttrDict
    vl_config: VLBertConfig

    def setup(self):
        cfg, vl = self.config, self.vl_config
        net = cfg.NETWORK
        self.enable_cnn_reg_loss = net.ENABLE_CNN_REG_LOSS
        self.cnn_loss_top = net.CNN_LOSS_TOP
        if not net.BLIND:
            self.image_feature_extractor = _fast_rcnn_from_cfg(
                cfg, vl, enable_cnn_reg_loss=(
                    self.enable_cnn_reg_loss and not self.cnn_loss_top))
            self.object_word_embed_mode = net.VLBERT.object_word_embed_mode
            if self.object_word_embed_mode in (1, 2):
                n_emb = 81 if self.object_word_embed_mode == 1 else 1
                self.object_linguistic_embeddings = nn.Embed(
                    n_emb, vl.hidden_size,
                    embedding_init=nn.initializers.normal(0.02),
                    param_dtype=jnp.float32, dtype=vl.dtype,
                    name="object_linguistic_embeddings")
            elif self.object_word_embed_mode != 3:
                # the reference raises too (ref vcr module :33-34); a typo'd
                # mode would otherwise silently take the mode-3 branch
                raise NotImplementedError(
                    f"object_word_embed_mode "
                    f"{self.object_word_embed_mode!r} (supported: 1, 2, 3)")
            if self.enable_cnn_reg_loss and self.cnn_loss_top:
                self.cnn_loss_transform = MVRCHeadTransform(
                    vl.hidden_size, vl.hidden_act, vl.initializer_range,
                    vl.dtype, name="cnn_loss_reg_transform")
                self.cnn_loss_dropout = Dropout(net.CNN_REG_DROPOUT)
                self.cnn_loss_fc = nn.Dense(
                    81, dtype=vl.dtype, param_dtype=jnp.float32,
                    name="cnn_loss_reg_fc")
        self.vlbert = VisualLinguisticBert(vl, name="vlbert")
        self.final_mlp = Classifier(
            net.CLASSIFIER_TYPE, 1, vl.hidden_size,
            net.CLASSIFIER_HIDDEN_SIZE, net.CLASSIFIER_DROPOUT,
            vl.hidden_act, vl.initializer_range, vl.dtype, name="final_mlp")

    def extract_obj_reps(self, image, boxes, objects, segms, box_mask,
                         im_info, deterministic):
        """Visual feature extraction, shared by the answer and rationale
        passes of Q2AR (text-independent)."""
        net, vl = self.config.NETWORK, self.vl_config
        B, O = box_mask.shape
        if net.BLIND:
            return {"obj_reps": jnp.zeros(
                (B, O, net.IMAGE_FINAL_DIM), vl.dtype)}
        return self.image_feature_extractor(
            image, boxes, box_mask, im_info, classes=objects, segms=segms,
            deterministic=deterministic)

    def choice_logits(self, obj_reps, objects, box_mask,
                      text_input_ids, text_token_type_ids, text_tags,
                      text_mask, classifier, deterministic):
        """Per-choice logits [B, C] for one (query, choices) text block
        (ref vcr/modules/resnet_vlbert_for_vcr.py:306-346)."""
        cfg, vl = self.config, self.vl_config
        net = cfg.NETWORK
        B, C, T = text_input_ids.shape
        O = box_mask.shape[1]

        if net.NO_GROUNDING:
            text_tags = jnp.zeros_like(text_tags)
        text_visual = collect_obj_reps(text_tags, obj_reps["obj_reps"])

        if net.BLIND:
            obj_ling = jnp.zeros((B, O, vl.hidden_size), vl.dtype)
        elif self.object_word_embed_mode in (1, 2):
            n_emb = 81 if self.object_word_embed_mode == 1 else 1
            ids = jnp.clip(objects.astype(jnp.int32), 0, n_emb - 1)
            obj_ling = self.object_linguistic_embeddings(ids)
        else:  # mode 3: mean of non-special word embeddings (ref :316-322)
            cls_id, sep_id = 101, 102
            ctx = (text_mask.astype(bool)
                   & (text_input_ids != cls_id) & (text_input_ids != sep_id))
            we = self.vlbert.word_embeddings(text_input_ids)
            we = we * ctx[..., None].astype(we.dtype)
            mean_we = jnp.sum(we, axis=2) / jnp.maximum(
                jnp.sum(ctx, axis=2)[..., None], 1).astype(we.dtype)
            obj_ling = jnp.broadcast_to(
                mean_we[:, :, None, :], (B, C, O, vl.hidden_size))

        # object VL embeddings, repeated per choice (ref :323-324)
        if obj_ling.ndim == 3:   # modes 1/2/BLIND: [B, O, H]
            obj_vl = jnp.concatenate(
                [obj_reps["obj_reps"],
                 obj_ling.astype(obj_reps["obj_reps"].dtype)], -1)
            obj_vl = jnp.broadcast_to(
                obj_vl[:, None], (B, C, O, obj_vl.shape[-1]))
        else:                    # mode 3: per-choice [B, C, O, H]
            reps = jnp.broadcast_to(
                obj_reps["obj_reps"][:, None],
                (B, C, O, obj_reps["obj_reps"].shape[-1]))
            obj_vl = jnp.concatenate([reps, obj_ling.astype(reps.dtype)], -1)

        eff_box_mask = box_mask
        if net.NO_OBJ_ATTENTION or net.BLIND:
            eff_box_mask = jnp.zeros_like(box_mask)
        box_mask_c = jnp.broadcast_to(eff_box_mask[:, None], (B, C, O))

        # TimeDistributed fold [B, C, ...] -> [B*C, ...] (ref :333-340,
        # common/nlp/time_distributed.py:23-51)
        def fold(x):
            return x.reshape(B * C, *x.shape[2:])

        h_text, h_obj, pooled = self.vlbert(
            fold(text_input_ids), fold(text_token_type_ids),
            fold(text_visual), fold(text_mask), fold(obj_vl),
            fold(box_mask_c), deterministic=deterministic,
            output_text_and_object_separately=True)

        logits = classifier(pooled, deterministic=deterministic)
        logits = logits.reshape(B, C)                        # squeeze per-choice
        return logits, h_obj, box_mask_c

    def __call__(self, image, boxes, objects, segms, box_mask,
                 text_input_ids, text_token_type_ids, text_tags, text_mask,
                 im_info, answer_label=None, train=True):
        cfg, vl = self.config, self.vl_config
        net = cfg.NETWORK
        B, C, T = text_input_ids.shape
        O = box_mask.shape[1]
        deterministic = not train

        obj_reps = self.extract_obj_reps(
            image, boxes, objects, segms, box_mask, im_info, deterministic)
        logits, h_obj, box_mask_c = self.choice_logits(
            obj_reps, objects, box_mask, text_input_ids,
            text_token_type_ids, text_tags, text_mask, self.final_mlp,
            deterministic)

        outputs = {"label_logits": logits}
        if not train:
            return outputs

        ans_loss, pos_frac = self._choice_loss(logits, answer_label, C)
        if pos_frac is not None:
            outputs["positive_fraction"] = pos_frac
        outputs.update(label=answer_label, ans_loss=ans_loss)
        loss = ans_loss * net.ANS_LOSS_WEIGHT

        cnn_reg, loss = self._cnn_reg_loss(
            loss, obj_reps, h_obj, box_mask_c, objects, B, C, O,
            deterministic)
        if cnn_reg is not None:
            outputs["cnn_regularization_loss"] = cnn_reg
        return outputs, loss

    def _choice_loss(self, logits, answer_label, C):
        """Per-choice loss: sigmoid BCE with positive weight
        (CLASSIFIER_SIGMOID, ref :349-361) or softmax CE over choices."""
        net = self.config.NETWORK
        if net.CLASSIFIER_SIGMOID:
            label_binary = (jnp.arange(C)[None, :] ==
                            answer_label[:, None].astype(jnp.int32))
            pw = net.CLASSIFIER_SIGMOID_LOSS_POSITIVE_WEIGHT
            weight = jnp.where(label_binary, pw, 1.0)
            rescale = (pw + 1.0) / (2.0 * pw)
            loss = rescale * losses.bce_with_logits(
                logits, label_binary.astype(jnp.float32), weight)
            return loss, jnp.mean(label_binary.astype(jnp.float32))
        return losses.cross_entropy(logits, answer_label), None

    def _cnn_reg_loss(self, loss, obj_reps, h_obj, box_mask_c, objects,
                      B, C, O, deterministic):
        """Add the CNN regularization loss (ref :387-397) to ``loss``."""
        net = self.config.NETWORK
        if not (self.enable_cnn_reg_loss and not net.BLIND):
            return None, loss
        if not self.cnn_loss_top:
            if "cnn_regularization_loss" not in obj_reps:
                raise ValueError(
                    "ENABLE_CNN_REG_LOSS with CNN_LOSS_TOP=false needs the "
                    "end-to-end visual path (IMAGE_FEAT_PRECOMPUTED=true "
                    "computes no FastRCNN reg loss — set CNN_LOSS_TOP=true "
                    "or disable the reg loss)")
            cnn_reg = obj_reps["cnn_regularization_loss"]
        else:
            # classifier on object hidden states (ref :391-397)
            h = self.cnn_loss_transform(h_obj.reshape(B, C, O, -1))
            h = self.cnn_loss_dropout(h, deterministic=deterministic)
            reg_logits = self.cnn_loss_fc(h).astype(jnp.float32)
            labels = jnp.broadcast_to(
                objects.astype(jnp.int32)[:, None], (B, C, O))
            m = box_mask_c.astype(jnp.float32)
            logp = jax.nn.log_softmax(reg_logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, labels[..., None], axis=-1)[..., 0]
            cnn_reg = jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
        return cnn_reg, loss + cnn_reg * net.CNN_LOSS_WEIGHT


class ResNetVLBERTForVCRQ2AR(ResNetVLBERTForVCR):
    """Single-model Q2AR: one visual backbone + VL-BERT scores answer
    choices AND rationale choices (rationale query conditioned on the gt
    answer at train/val time).

    The reference has no single-model Q2AR — its dataset emits both streams
    (ref vcr/data/datasets/vcr.py:385-397 Q2AR outputs) but the module never
    consumes them and vcr/val.py pairs two separate models. Here the visual
    path (ResNet + ROIAlign, the dominant FLOPs) is computed ONCE and shared
    by both text passes; rationales get their own classifier head.
    """

    def setup(self):
        super().setup()
        net, vl = self.config.NETWORK, self.vl_config
        self.final_mlp_rationale = Classifier(
            net.CLASSIFIER_TYPE, 1, vl.hidden_size,
            net.CLASSIFIER_HIDDEN_SIZE, net.CLASSIFIER_DROPOUT,
            vl.hidden_act, vl.initializer_range, vl.dtype,
            name="final_mlp_rationale")

    def __call__(self, image, boxes, objects, segms, box_mask,
                 text_input_ids, text_token_type_ids, text_tags, text_mask,
                 rationale_input_ids, rationale_token_type_ids,
                 rationale_tags, rationale_mask, im_info,
                 answer_label=None, rationale_label=None, train=True):
        net = self.config.NETWORK
        B, C, T = text_input_ids.shape
        O = box_mask.shape[1]
        deterministic = not train

        obj_reps = self.extract_obj_reps(
            image, boxes, objects, segms, box_mask, im_info, deterministic)
        a_logits, h_obj, box_mask_c = self.choice_logits(
            obj_reps, objects, box_mask, text_input_ids,
            text_token_type_ids, text_tags, text_mask, self.final_mlp,
            deterministic)
        r_logits, _, _ = self.choice_logits(
            obj_reps, objects, box_mask, rationale_input_ids,
            rationale_token_type_ids, rationale_tags, rationale_mask,
            self.final_mlp_rationale, deterministic)

        outputs = {"label_logits": a_logits, "rationale_logits": r_logits}
        if not train:
            return outputs

        # each stream uses the configured per-choice loss with its own
        # ANS_LOSS_WEIGHT, exactly as the two separate reference models
        # (Q2A + QA2R) would apply to their answer streams
        ans_loss, pos_frac = self._choice_loss(a_logits, answer_label, C)
        rationale_loss, _ = self._choice_loss(r_logits, rationale_label, C)
        if pos_frac is not None:
            outputs["positive_fraction"] = pos_frac
        outputs.update(label=answer_label, rationale_label=rationale_label,
                       ans_loss=ans_loss, rationale_loss=rationale_loss)
        loss = (ans_loss + rationale_loss) * net.ANS_LOSS_WEIGHT

        # CNN reg over the shared visual path, applied once (the answer
        # pass's object hidden states stand in for cnn_loss_top)
        cnn_reg, loss = self._cnn_reg_loss(
            loss, obj_reps, h_obj, box_mask_c, objects, B, C, O,
            deterministic)
        if cnn_reg is not None:
            outputs["cnn_regularization_loss"] = cnn_reg
        return outputs, loss


class ResNetVLBERTForVQA(nn.Module):
    """VQA model (ref: vqa/modules/resnet_vlbert_for_vqa.py).

    Text arrives pre-assembled: [CLS] Q [SEP] [MASK] [SEP] with ``ans_pos``
    the index of the [MASK] slot (ref :196-209 builds this on device).
    """

    config: Any
    vl_config: VLBertConfig

    def setup(self):
        cfg, vl = self.config, self.vl_config
        net = cfg.NETWORK
        self.image_feature_extractor = _fast_rcnn_from_cfg(cfg, vl)
        # ref :217 asserts mode == 2
        self.object_linguistic_embeddings = nn.Embed(
            1, vl.hidden_size, embedding_init=nn.initializers.normal(0.02),
            param_dtype=jnp.float32, dtype=vl.dtype,
            name="object_linguistic_embeddings")
        self.vlbert = VisualLinguisticBert(vl, name="vlbert")
        self.final_mlp = Classifier(
            net.CLASSIFIER_TYPE, cfg.DATASET.ANSWER_VOCAB_SIZE,
            vl.hidden_size, net.CLASSIFIER_HIDDEN_SIZE,
            net.CLASSIFIER_DROPOUT, vl.hidden_act, vl.initializer_range,
            vl.dtype, name="final_mlp")

    def __call__(self, image, boxes, box_mask, im_info,
                 text_input_ids, text_token_type_ids, text_mask, ans_pos,
                 label=None, train=True):
        cfg, vl = self.config, self.vl_config
        net = cfg.NETWORK
        B, O = box_mask.shape
        deterministic = not train

        obj_reps = self.image_feature_extractor(
            image, boxes, box_mask, im_info, deterministic=deterministic)

        # text visual embedding = whole-image box feature (tags all 0)
        text_tags = jnp.zeros_like(text_input_ids)
        reps = (jnp.zeros_like(obj_reps["obj_reps"])
                if net.NO_GROUNDING else obj_reps["obj_reps"])
        text_visual = collect_obj_reps(text_tags, reps)

        obj_vl = generic_obj_vl_embeddings(
            self.object_linguistic_embeddings, obj_reps["obj_reps"])

        hidden, _pooled = self.vlbert(
            text_input_ids, text_token_type_ids, text_visual, text_mask,
            obj_vl, box_mask, deterministic=deterministic)

        # answer predicted at the [MASK] position (ref :234-246)
        hm = jnp.take_along_axis(
            hidden, ans_pos.astype(jnp.int32)[:, None, None], axis=1)[:, 0]
        logits = self.final_mlp(hm, deterministic=deterministic)

        outputs = {"label_logits": logits}
        if not train:
            return outputs
        # BCE x num_answers on soft targets (ref :249)
        ans_loss = losses.bce_with_logits(logits, label) * label.shape[1]
        outputs.update(label=label, ans_loss=ans_loss)
        return outputs, ans_loss


class ResNetVLBERTForRefCOCO(nn.Module):
    """RefCOCO+ grounding model (ref: refcoco/modules/resnet_vlbert_for_refcoco.py).

    Text arrives pre-assembled: [CLS] expr [SEP] (ref :100-108 host-side now).
    """

    config: Any
    vl_config: VLBertConfig

    def setup(self):
        cfg, vl = self.config, self.vl_config
        self.image_feature_extractor = _fast_rcnn_from_cfg(cfg, vl)
        self.object_linguistic_embeddings = nn.Embed(
            1, vl.hidden_size,
            embedding_init=nn.initializers.normal(vl.initializer_range),
            param_dtype=jnp.float32, dtype=vl.dtype,
            name="object_linguistic_embeddings")
        self.vlbert = VisualLinguisticBert(vl, name="vlbert")
        self.final_transform = MVRCHeadTransform(
            vl.hidden_size, vl.hidden_act, vl.initializer_range, vl.dtype,
            name="final_mlp_transform")
        self.final_dropout = Dropout(cfg.NETWORK.CLASSIFIER_DROPOUT)
        self.final_fc = nn.Dense(
            1, kernel_init=nn.initializers.xavier_uniform(),
            dtype=vl.dtype, param_dtype=jnp.float32, name="final_mlp_fc")

    def __call__(self, image, boxes, box_mask, im_info,
                 text_input_ids, text_mask, label=None, train=True):
        vl = self.vl_config
        B, O = box_mask.shape
        deterministic = not train

        obj_reps = self.image_feature_extractor(
            image, boxes, box_mask, im_info, deterministic=deterministic)

        # text visual embedding = whole-image box broadcast (ref :109)
        text_visual = jnp.broadcast_to(
            obj_reps["obj_reps"][:, :1],
            (B, text_input_ids.shape[1], obj_reps["obj_reps"].shape[-1]))
        text_token_type_ids = jnp.zeros_like(text_input_ids)

        obj_vl = generic_obj_vl_embeddings(
            self.object_linguistic_embeddings, obj_reps["obj_reps"])

        _h_text, h_regions, _ = self.vlbert(
            text_input_ids, text_token_type_ids, text_visual, text_mask,
            obj_vl, box_mask, deterministic=deterministic,
            output_text_and_object_separately=True)

        h = self.final_transform(h_regions)
        h = self.final_dropout(h, deterministic=deterministic)
        logits = self.final_fc(h).astype(jnp.float32)[..., 0]   # [B, O]
        # invalid slots pushed to -10000 (ref :139-141)
        logits = jnp.where(box_mask.astype(bool), logits, -10000.0)

        outputs = {"label_logits": logits}
        if not train:
            # argmax box, rescaled to original image coords (ref :219-223)
            best = jnp.argmax(logits, axis=1)
            pred = jnp.take_along_axis(
                boxes[..., :4], best[:, None, None], axis=1)[:, 0]
            w_ratio = im_info[:, 2:3]
            h_ratio = im_info[:, 3:4]
            pred = jnp.stack([pred[:, 0] / w_ratio[:, 0],
                              pred[:, 1] / h_ratio[:, 0],
                              pred[:, 2] / w_ratio[:, 0],
                              pred[:, 3] / h_ratio[:, 0]], axis=1)
            outputs["pred_boxes"] = pred
            return outputs

        cls_loss = losses.bce_with_logits_masked(logits, label, box_mask)
        outputs.update(label=jnp.where(box_mask.astype(bool), label, -1.0),
                       cls_loss=cls_loss)
        return outputs, cls_loss


class ResNetVLBERTForPretrainingMultitask(nn.Module):
    """Multitask pretraining model (ref: pretrain/modules/
    resnet_vlbert_for_pretraining_multitask.py).

    The image-text batch and the text-only auxiliary batch are concatenated
    along the batch dim with a learned ``aux_text_visual_embedding`` standing
    in for visual features on aux rows and zeroed box masks (ref :165-182).
    Static shapes: the collator pads both text streams to a common length.
    """

    config: Any
    vl_config: VLBertConfig
    with_aux: bool = True
    # dim of the learned replacement for masked precomputed region features;
    # the reference hardcodes 2048 (ref :25, bottom-up features)
    mask_visual_feat_dim: int = 2048

    def setup(self):
        cfg, vl = self.config, self.vl_config
        net = cfg.NETWORK
        self.image_feature_extractor = _fast_rcnn_from_cfg(cfg, vl)
        self.object_linguistic_embeddings = nn.Embed(
            1, vl.hidden_size,
            embedding_init=nn.initializers.normal(vl.initializer_range),
            param_dtype=jnp.float32, dtype=vl.dtype,
            name="object_linguistic_embeddings")
        if net.IMAGE_FEAT_PRECOMPUTED or (not net.MASK_RAW_PIXELS):
            self.object_mask_visual_embedding = self.param(
                "object_mask_visual_embedding", nn.initializers.zeros,
                (self.mask_visual_feat_dim,), jnp.float32)
        if net.WITH_MVRC_LOSS:
            self.object_mask_word_embedding = self.param(
                "object_mask_word_embedding",
                nn.initializers.normal(vl.initializer_range),
                (vl.hidden_size,), jnp.float32)
        if self.with_aux and net.IMAGE_FINAL_DIM != vl.hidden_size:
            # the (hidden_size,) aux embedding stands in for the visual
            # feature rows (ref :28,:177), which are IMAGE_FINAL_DIM wide —
            # the reference carries the same assumption; fail with a clear
            # message instead of a bare broadcast error at trace time
            raise ValueError(
                f"multitask pretraining requires IMAGE_FINAL_DIM "
                f"({net.IMAGE_FINAL_DIM}) == VLBERT.hidden_size "
                f"({vl.hidden_size}) for the aux text-visual embedding")
        self.aux_text_visual_embedding = self.param(
            "aux_text_visual_embedding",
            nn.initializers.normal(vl.initializer_range),
            (vl.hidden_size,), jnp.float32)
        self.vlbert = VisualLinguisticBertForPretraining(
            vl, with_rel_head=net.WITH_REL_LOSS,
            with_mlm_head=net.WITH_MLM_LOSS,
            with_mvrc_head=net.WITH_MVRC_LOSS, name="vlbert")

    def __call__(self, image, boxes, im_info, text, relationship_label,
                 mlm_labels, mvrc_ops, mvrc_labels,
                 aux_text=None, aux_mlm_labels=None, train=True):
        cfg, vl = self.config, self.vl_config
        net = cfg.NETWORK
        B, O = boxes.shape[0], boxes.shape[1]
        deterministic = not train

        box_mask = boxes[:, :, 0] > -1.5                      # ref :126
        if net.IMAGE_FEAT_PRECOMPUTED:
            # masked regions' precomputed features replaced (ref :134-137)
            feats = boxes[:, :, 4:]
            feats = jnp.where((mvrc_ops == 1)[..., None],
                              self.object_mask_visual_embedding.astype(feats.dtype),
                              feats)
            boxes = jnp.concatenate([boxes[:, :, :4], feats], axis=-1)

        mask_visual_embed = None
        if (not net.IMAGE_FEAT_PRECOMPUTED) and (not net.MASK_RAW_PIXELS):
            mask_visual_embed = self.object_mask_visual_embedding

        obj_reps = self.image_feature_extractor(
            image, boxes, box_mask, im_info, mvrc_ops=mvrc_ops,
            mask_visual_embed=mask_visual_embed, deterministic=deterministic)

        # text visual embeddings: whole-image box (tags zero, ref :154-156)
        text_tags = jnp.zeros_like(text)
        text_visual = collect_obj_reps(text_tags, obj_reps["obj_reps"])

        def mask_ling(obj_ling):                              # ref :161-162
            if not net.WITH_MVRC_LOSS:
                return obj_ling
            return jnp.where(
                (mvrc_ops == 1)[..., None],
                self.object_mask_word_embedding.astype(obj_ling.dtype),
                obj_ling)

        obj_vl = generic_obj_vl_embeddings(
            self.object_linguistic_embeddings, obj_reps["obj_reps"],
            mask_fn=mask_ling)

        if self.with_aux and aux_text is not None:
            # batch-concat with aux text-only rows (ref :165-182)
            B2, T2 = aux_text.shape
            T = max(text.shape[1], T2)

            def padT(x, t):
                return jnp.pad(x, ((0, 0), (0, t - x.shape[1])) +
                               ((0, 0),) * (x.ndim - 2))

            text_multi = jnp.concatenate([padT(text, T), padT(aux_text, T)], 0)
            tv_aux = jnp.broadcast_to(
                self.aux_text_visual_embedding.astype(text_visual.dtype),
                (B2, T, text_visual.shape[-1]))
            text_visual_multi = jnp.concatenate(
                [padT(text_visual, T), tv_aux], 0)
            obj_vl_multi = jnp.concatenate(
                [obj_vl, jnp.zeros((B2, *obj_vl.shape[1:]), obj_vl.dtype)], 0)
            box_mask_multi = jnp.concatenate(
                [box_mask, jnp.zeros((B2, O), bool)], 0)
        else:
            B2 = 0
            T = text.shape[1]
            text_multi = text
            text_visual_multi = text_visual
            obj_vl_multi = obj_vl
            box_mask_multi = box_mask

        text_mask_multi = text_multi > 0                      # ref :171
        text_type_multi = jnp.zeros_like(text_multi)

        rel_logits, mlm_logits, mvrc_logits = self.vlbert(
            text_multi, text_type_multi, text_visual_multi, text_mask_multi,
            obj_vl_multi, box_mask_multi, deterministic=deterministic)

        outputs = {}
        relationship_loss = jnp.zeros((), jnp.float32)
        mlm_loss_wvc = jnp.zeros((), jnp.float32)
        mlm_loss_aux = jnp.zeros((), jnp.float32)
        mvrc_loss = jnp.zeros((), jnp.float32)

        if net.WITH_REL_LOSS:
            rel_wvc = rel_logits[:B]
            relationship_loss = losses.cross_entropy(rel_wvc, relationship_label)
            outputs.update(relationship_logits=rel_wvc,
                           relationship_label=relationship_label)
        if net.WITH_MLM_LOSS:
            mlm_wvc = mlm_logits[:B]
            labels_wvc = jnp.pad(mlm_labels, ((0, 0), (0, T - mlm_labels.shape[1])),
                                 constant_values=-1)
            # NORM_IN_BATCH_FIRST: per-example token mean then example mean
            # (ref pretrain module :168-178) vs the default global token mean
            mlm_ce = (losses.cross_entropy_ignore_index_batch_first
                      if net.MLM_LOSS_NORM_IN_BATCH_FIRST
                      else losses.cross_entropy_ignore_index)
            mlm_loss_wvc = mlm_ce(mlm_wvc, labels_wvc, -1)
            outputs.update(mlm_logits_wvc=mlm_wvc, mlm_label_wvc=labels_wvc)
            if B2:
                mlm_aux = mlm_logits[B:]
                labels_aux = jnp.pad(
                    aux_mlm_labels, ((0, 0), (0, T - aux_mlm_labels.shape[1])),
                    constant_values=-1)
                mlm_loss_aux = mlm_ce(mlm_aux, labels_aux, -1)
                outputs.update(mlm_logits_aux=mlm_aux, mlm_label_aux=labels_aux)
        if net.WITH_MVRC_LOSS:
            mvrc_wvc = mvrc_logits[:B]
            if net.MVRC_LOSS_NORM_IN_BATCH_FIRST:   # ref :183-190
                mvrc_loss = losses.soft_cross_entropy_batch_first(
                    mvrc_wvc, mvrc_labels)
            else:
                mvrc_loss = losses.soft_cross_entropy(
                    mvrc_wvc.reshape(-1, mvrc_wvc.shape[-1]),
                    mvrc_labels.reshape(-1, mvrc_labels.shape[-1]))
            outputs.update(mvrc_logits=mvrc_wvc, mvrc_label=mvrc_labels)

        outputs.update(relationship_loss=relationship_loss,
                       mlm_loss=mlm_loss_wvc,
                       mlm_loss_wvc=mlm_loss_wvc,
                       mlm_loss_aux=mlm_loss_aux,
                       mvrc_loss=mvrc_loss)
        loss = relationship_loss + mlm_loss_wvc + mlm_loss_aux + mvrc_loss
        if not train:
            return outputs
        return outputs, loss

    def attention_vis(self, image, boxes, im_info, text):
        """Forward-only pass returning per-layer attention probabilities
        (ref: pretrain/modules/resnet_vlbert_for_attention_vis.py:14-60,
        driven by pretrain/function/vis.py:110-142)."""
        B, O = boxes.shape[0], boxes.shape[1]
        box_mask = boxes[:, :, 0] > -1.5

        obj_reps = self.image_feature_extractor(
            image, boxes, box_mask, im_info, deterministic=True)
        text_tags = jnp.zeros_like(text)
        text_visual = collect_obj_reps(text_tags, obj_reps["obj_reps"])
        obj_vl = generic_obj_vl_embeddings(
            self.object_linguistic_embeddings, obj_reps["obj_reps"])
        text_mask = text > 0
        text_types = jnp.zeros_like(text)

        _seq, _pooled, probs = self.vlbert.vlbert(
            text, text_types, text_visual, text_mask, obj_vl, box_mask,
            deterministic=True, output_attention_probs=True)
        return jnp.stack(probs, axis=1)       # [B, layers, heads, L, L]


# MODULE-name registry (reference selects by eval(config.MODULE),
# ref vcr/function/train.py:64 — replaced by an explicit registry)
MODULES = {
    "ResNetVLBERT:vcr": ResNetVLBERTForVCR,
    "ResNetVLBERT:vqa": ResNetVLBERTForVQA,
    "ResNetVLBERT:refcoco": ResNetVLBERTForRefCOCO,
    "ResNetVLBERTForPretraining:pretrain": ResNetVLBERTForPretrainingMultitask,
    "ResNetVLBERTForPretrainingMultitask:pretrain": ResNetVLBERTForPretrainingMultitask,
}


def build_module(config, task, dtype=jnp.bfloat16, remat=False, **kwargs):
    from vlbert_tpu.utils.config import FrozenConfig

    key = f"{config.MODULE}:{task}"
    if key not in MODULES:
        raise ValueError(f"unknown module {config.MODULE!r} for task {task!r}")
    if config.NETWORK.get("FOR_MASK_VL_MODELING_PRETRAIN", False):
        # the reference rejects it too: `assert not self.for_pretrain, "Not
        # implement pretrain mode now!"` (vcr/modules/resnet_vlbert_for_vcr.py:66)
        raise NotImplementedError(
            "NETWORK.FOR_MASK_VL_MODELING_PRETRAIN is not implemented, "
            "matching the reference's own assert")
    fused = False
    fused_qkv = False
    scan_layers = False
    attn_remat = False
    if "TPU" in config:
        fused = bool(config.TPU.get("FUSED_ATTENTION", False))
        fused_qkv = bool(config.TPU.get("FUSED_QKV", False))
        scan_layers = bool(config.TPU.get("SCAN_LAYERS", False))
        attn_remat = bool(config.TPU.get("ATTN_REMAT", False))
        # process-global dropout mask implementation (ops/dropout.py);
        # per-module `impl=` attributes still override
        import vlbert_tpu.ops.dropout as dropout_lib

        dropout_lib.DEFAULT_IMPL = config.TPU.get("DROPOUT_IMPL", "bits16")
    vl_cfg = VLBertConfig.from_attrdict(
        config.NETWORK.VLBERT, dtype=dtype, remat=remat,
        fused_attention=kwargs.get("fused_attention", fused),
        fused_qkv=kwargs.get("fused_qkv", fused_qkv),
        scan_layers=kwargs.get("scan_layers", scan_layers),
        attn_remat=kwargs.get("attn_remat", attn_remat))
    if not isinstance(config, FrozenConfig):
        config = FrozenConfig(config)
    cls = MODULES[key]
    if cls is ResNetVLBERTForVCR and task == "vcr" \
            and config.DATASET.get("TASK") == "Q2AR":
        cls = ResNetVLBERTForVCRQ2AR
    if cls is ResNetVLBERTForPretrainingMultitask:
        with_aux = config.MODULE.endswith("Multitask")
        # masked-feature embedding dim follows the precomputed feature dim
        # (DATASET.PRECOMPUTED_FEAT_DIM; master entry for list-DATASET)
        d = config.DATASET
        master = d[0] if isinstance(d, (list, tuple)) else d
        feat_dim = kwargs.get("mask_visual_feat_dim",
                              master.get("PRECOMPUTED_FEAT_DIM", 2048))
        return cls(config=config, vl_config=vl_cfg, with_aux=with_aux,
                   mask_visual_feat_dim=feat_dim)
    return cls(config=config, vl_config=vl_cfg)
