"""VisualLinguisticBert — the single-stream VL transformer, TPU-native.

Reference semantics: common/visual_linguistic_bert.py. The reference builds a
*packed* sequence per example with a boolean-mask scatter ("seamless concat",
ref :200-241): text tokens, then object tokens, then a learned [END] token,
with dynamic max_length per batch. That is dynamic-shaped and hostile to XLA.

TPU-native reformulation (mathematically identical for all unmasked
positions): a FIXED layout ``[text slots (T) | object slots (O) | END]`` of
static length T+O+1, where

  * text slot i keeps position id ``i + ppi`` (text is left-packed, so the
    packed index of a live text token equals its slot index),
  * every object slot gets position id ``text_len + ppi`` — exactly the
    reference's ``obj_pos_id_relative`` rule (ref :222-227) where ALL objects
    share position ``text_end``,
  * the END slot gets position id ``text_len + 1 + ppi`` (ref :227),
  * token types: text keeps its ids, objects and END get type 2 (ref :216-218),
  * the attention mask is ``[text_mask | object_mask | 1]``; masked slots are
    hidden by the additive -10000 bias (ref :119-127), so their (garbage)
    embeddings never influence live positions. Attention is permutation-
    invariant given position ids + mask, hence the fixed layout reproduces the
    packed layout's outputs at every live position, including the pooled [CLS]
    at slot 0.

The re-split of outputs into text/object streams (ref :146-166, a scatter) is
a free static slice here.

``ppi`` is ``position_padding_idx + 1`` (RoBERTa compatibility, ref :46,222).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlbert_tpu.ops.dropout import Dropout
from vlbert_tpu.models.bert import (
    ACT2FN,
    BertEncoder,
    BertLayerNorm,
    BertLMPredictionHead,
    BertPooler,
    bert_dense,
)

# ref: common/visual_linguistic_bert.py:6
NUM_SPECIAL_WORDS = 1000


@dataclasses.dataclass(frozen=True)
class VLBertConfig:
    """Static, hashable mirror of cfg.NETWORK.VLBERT (ref: vcr/function/config.py:89-114)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    visual_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 3
    initializer_range: float = 0.02
    visual_scale_text_init: float = 0.0
    visual_scale_object_init: float = 0.0
    visual_ln: bool = False
    word_embedding_frozen: bool = False
    obj_pos_id_relative: bool = True
    with_pooler: bool = False
    position_padding_idx: int = -1
    visual_region_classes: int = 1601
    # TPU-native knobs
    dtype: Any = jnp.float32
    remat: bool = False
    fused_attention: bool = False
    fused_qkv: bool = False
    scan_layers: bool = False
    attn_remat: bool = False

    @classmethod
    def from_attrdict(cls, d, dtype=jnp.float32, remat=False,
                      fused_attention=False, fused_qkv=False,
                      scan_layers=False, attn_remat=False):
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in fields}
        kwargs["dtype"] = dtype
        kwargs["remat"] = remat
        kwargs["fused_attention"] = fused_attention
        kwargs["fused_qkv"] = fused_qkv
        kwargs["scan_layers"] = scan_layers
        kwargs["attn_remat"] = attn_remat
        return cls(**kwargs)


class VisualLinguisticBert(nn.Module):
    """ref: common/visual_linguistic_bert.py:31-241."""

    config: VLBertConfig

    def setup(self):
        c = self.config
        init = nn.initializers.normal(stddev=c.initializer_range)
        self.word_embeddings = nn.Embed(
            c.vocab_size, c.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, dtype=c.dtype, name="word_embeddings")
        self.end_embedding = nn.Embed(
            1, c.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, dtype=c.dtype, name="end_embedding")
        self.position_embeddings = nn.Embed(
            c.max_position_embeddings, c.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, dtype=c.dtype, name="position_embeddings")
        self.token_type_embeddings = nn.Embed(
            c.type_vocab_size, c.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, dtype=c.dtype, name="token_type_embeddings")
        self.embedding_LayerNorm = BertLayerNorm(name="embedding_LayerNorm")
        self.embedding_dropout = Dropout(rate=c.hidden_dropout_prob)

        if c.visual_size != c.hidden_size:
            self.visual_1x1_text = bert_dense(
                c.hidden_size, c.initializer_range, c.dtype, "visual_1x1_text")
            self.visual_1x1_object = bert_dense(
                c.hidden_size, c.initializer_range, c.dtype, "visual_1x1_object")
        else:
            self.visual_1x1_text = None
            self.visual_1x1_object = None

        if c.visual_ln:
            # LN scale initialized to visual_scale_*_init (ref :72-74)
            self.visual_ln_text = BertLayerNorm(
                scale_init_value=c.visual_scale_text_init,
                name="visual_ln_text")
            self.visual_ln_object = BertLayerNorm(
                scale_init_value=c.visual_scale_object_init,
                name="visual_ln_object")
        else:
            self.visual_scale_text = self.param(
                "visual_scale_text",
                lambda rng: jnp.asarray(c.visual_scale_text_init, jnp.float32))
            self.visual_scale_object = self.param(
                "visual_scale_object",
                lambda rng: jnp.asarray(c.visual_scale_object_init, jnp.float32))

        if c.word_embedding_frozen:
            # trainable table for the first NUM_SPECIAL_WORDS ids (ref :80-93)
            self.special_word_embeddings = nn.Embed(
                NUM_SPECIAL_WORDS, c.hidden_size, embedding_init=init,
                param_dtype=jnp.float32, dtype=c.dtype,
                name="special_word_embeddings")

        self.encoder = BertEncoder(
            num_layers=c.num_hidden_layers,
            num_heads=c.num_attention_heads,
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            hidden_act=c.hidden_act,
            attention_dropout=c.attention_probs_dropout_prob,
            hidden_dropout=c.hidden_dropout_prob,
            initializer_range=c.initializer_range,
            dtype=c.dtype,
            remat=c.remat,
            fused=c.fused_attention,
            fused_qkv=c.fused_qkv,
            scan_layers=c.scan_layers,
            attn_remat=c.attn_remat,
            name="encoder")
        if c.with_pooler:
            self.pooler = BertPooler(
                c.hidden_size, c.initializer_range, c.dtype, name="pooler")

    def word_embeddings_wrapper(self, input_ids):
        """ref: common/visual_linguistic_bert.py:86-93."""
        c = self.config
        if c.word_embedding_frozen:
            frozen = jax.lax.stop_gradient(self.word_embeddings(input_ids))
            special = self.special_word_embeddings(
                jnp.clip(input_ids, 0, NUM_SPECIAL_WORDS - 1))
            return jnp.where((input_ids < NUM_SPECIAL_WORDS)[..., None],
                             special, frozen)
        return self.word_embeddings(input_ids)

    def embedding(self, text_input_ids, text_token_type_ids,
                  text_visual_embeddings, text_mask,
                  object_vl_embeddings, object_mask,
                  deterministic=True):
        """Static-shape seamless concat (see module docstring).

        Returns (embeddings [B,L,H], mask [B,L]) with L = T + O + 1.
        """
        c = self.config
        B, T = text_input_ids.shape
        O = object_vl_embeddings.shape[1]
        text_mask = text_mask.astype(jnp.bool_)
        object_mask = object_mask.astype(jnp.bool_)

        # --- per-modality fusion (ref :181-198) ---
        text_ling = self.word_embeddings_wrapper(text_input_ids)
        tve = text_visual_embeddings
        if self.visual_1x1_text is not None:
            tve = self.visual_1x1_text(tve)
        if c.visual_ln:
            tve = self.visual_ln_text(tve)
        else:
            tve = tve * self.visual_scale_text.astype(tve.dtype)
        text_vl = text_ling + tve

        obj_vis = object_vl_embeddings[:, :, : c.visual_size]
        if self.visual_1x1_object is not None:
            obj_vis = self.visual_1x1_object(obj_vis)
        if c.visual_ln:
            obj_vis = self.visual_ln_object(obj_vis)
        else:
            obj_vis = obj_vis * self.visual_scale_object.astype(obj_vis.dtype)
        obj_ling = object_vl_embeddings[:, :, c.visual_size:]
        obj_vl = obj_ling.astype(obj_vis.dtype) + obj_vis

        end_tok = self.end_embedding(jnp.zeros((B, 1), jnp.int32))
        vl = jnp.concatenate([text_vl, obj_vl, end_tok], axis=1)  # [B,L,H]

        # --- token types: text ids | 2 for objects and END (ref :216-218) ---
        obj_type = jnp.full((B, O + 1), 2, dtype=jnp.int32)
        token_type_ids = jnp.concatenate(
            [text_token_type_ids.astype(jnp.int32), obj_type], axis=1)
        tt_emb = self.token_type_embeddings(token_type_ids)

        # --- position ids (ref :222-231) ---
        ppi = c.position_padding_idx + 1
        text_len = jnp.sum(text_mask.astype(jnp.int32), axis=1, keepdims=True)
        text_pos = jnp.arange(T, dtype=jnp.int32)[None, :] + ppi
        text_pos = jnp.broadcast_to(text_pos, (B, T))
        if c.obj_pos_id_relative:
            obj_pos = jnp.broadcast_to(text_len + ppi, (B, O))
            end_pos = text_len + 1 + ppi
        else:
            # ref :229 asserts False on this branch; kept for completeness
            obj_pos = jnp.full((B, O), c.max_position_embeddings - 2, jnp.int32)
            end_pos = jnp.full((B, 1), c.max_position_embeddings - 1, jnp.int32)
        position_ids = jnp.concatenate([text_pos, obj_pos, end_pos], axis=1)
        pos_emb = self.position_embeddings(position_ids)

        # --- mask: live text | live objects | END (ref :234-235) ---
        mask = jnp.concatenate(
            [text_mask, object_mask, jnp.ones((B, 1), jnp.bool_)], axis=1)

        emb = vl + pos_emb + tt_emb
        emb = self.embedding_LayerNorm(emb)
        emb = self.embedding_dropout(emb, deterministic=deterministic)
        return emb, mask

    def __call__(self, text_input_ids, text_token_type_ids,
                 text_visual_embeddings, text_mask,
                 object_vl_embeddings, object_mask,
                 deterministic=True,
                 output_text_and_object_separately=False,
                 output_all_encoded_layers=False,
                 output_attention_probs=False):
        c = self.config
        emb, mask = self.embedding(
            text_input_ids, text_token_type_ids, text_visual_embeddings,
            text_mask, object_vl_embeddings, object_mask, deterministic)

        # additive -10000 mask (ref :119-127)
        bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * -10000.0

        enc = self.encoder(
            emb, bias, deterministic=deterministic,
            output_all_encoded_layers=output_all_encoded_layers,
            output_attention_probs=output_attention_probs)
        probs = None
        if output_attention_probs:
            enc, probs = enc
        seq = enc[-1] if output_all_encoded_layers else enc
        pooled = self.pooler(seq) if c.with_pooler else None

        if output_text_and_object_separately:
            T = text_input_ids.shape[1]
            O = object_vl_embeddings.shape[1]

            def split(layer):
                # free static slices replace the scatter re-split (ref :146-166);
                # masked TEXT and object slots are both zeroed to match the
                # reference's new_zeros buffers (ref :147-157) — consumers
                # that pool/sum over the stream must not see padding
                text_out = layer[:, :T] \
                    * text_mask[..., None].astype(layer.dtype)
                obj_out = layer[:, T:T + O] \
                    * object_mask[..., None].astype(layer.dtype)
                return text_out, obj_out

            if output_all_encoded_layers:
                parts = [split(l) for l in enc]
                text_out = [p[0] for p in parts]
                obj_out = [p[1] for p in parts]
            else:
                text_out, obj_out = split(seq)
            if output_attention_probs:
                return text_out, obj_out, pooled, probs
            return text_out, obj_out, pooled

        out = enc if output_all_encoded_layers else seq
        if output_attention_probs:
            return out, pooled, probs
        return out, pooled




class VisualLinguisticBertMVRCHead(nn.Module):
    """Masked visual-region-classification head (ref :473-502)."""

    hidden_size: int
    visual_region_classes: int
    hidden_act: str
    initializer_range: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        h = bert_dense(self.hidden_size, self.initializer_range, self.dtype,
                       "transform_dense")(hidden)
        h = ACT2FN[self.hidden_act](h)
        return bert_dense(self.visual_region_classes, self.initializer_range,
                          self.dtype, "region_cls_pred")(h).astype(jnp.float32)


class VisualLinguisticBertRelationshipPredictionHead(nn.Module):
    """Caption-image relationship (NSP-style) head (ref :505-516)."""

    initializer_range: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        return bert_dense(2, self.initializer_range, self.dtype,
                          "caption_image_relationship")(pooled).astype(jnp.float32)


class VisualLinguisticBertForPretraining(nn.Module):
    """VL-BERT + (rel, MLM, MVRC) pretraining heads (ref :312-380)."""

    config: VLBertConfig
    with_rel_head: bool = True
    with_mlm_head: bool = True
    with_mvrc_head: bool = True

    def setup(self):
        c = self.config
        self.vlbert = VisualLinguisticBert(c, name="bert")
        if self.with_rel_head:
            self.relationship_head = VisualLinguisticBertRelationshipPredictionHead(
                c.initializer_range, c.dtype, name="relationship_head")
        if self.with_mlm_head:
            self.mlm_head = BertLMPredictionHead(
                c.hidden_size, c.vocab_size, c.hidden_act,
                c.initializer_range, c.dtype, name="mlm_head")
        if self.with_mvrc_head:
            self.mvrc_head = VisualLinguisticBertMVRCHead(
                c.hidden_size, c.visual_region_classes, c.hidden_act,
                c.initializer_range, c.dtype, name="mvrc_head")

    def __call__(self, text_input_ids, text_token_type_ids,
                 text_visual_embeddings, text_mask,
                 object_vl_embeddings, object_mask, deterministic=True):
        text_out, obj_out, pooled = self.vlbert(
            text_input_ids, text_token_type_ids, text_visual_embeddings,
            text_mask, object_vl_embeddings, object_mask,
            deterministic=deterministic,
            output_text_and_object_separately=True)

        rel_logits = self.relationship_head(pooled) if self.with_rel_head else None
        mlm_logits = None
        if self.with_mlm_head:
            # decoder tied to the word embedding table (ref modeling.py:456-472)
            emb_matrix = self.vlbert.word_embeddings.embedding
            mlm_logits = self.mlm_head(text_out, emb_matrix)
        mvrc_logits = self.mvrc_head(obj_out) if self.with_mvrc_head else None
        return rel_logits, mlm_logits, mvrc_logits
