"""Model-core tests.

1. BERT encoder parity vs HuggingFace torch BertModel (same weights, same
   inputs) — validates post-LN block structure, erf-GELU, eps=1e-12 LN, and
   the -10000 additive mask to ~1e-5.
2. Static-layout invariance: the fixed [text|obj|END] layout must produce the
   same live-position outputs regardless of how much padding is carried —
   this is the property that makes the TPU reformulation of the reference's
   dynamic "seamless concat" exact (common/visual_linguistic_bert.py:200-241).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vlbert_tpu.models.bert import BertEncoder
from vlbert_tpu.models.vlbert import (
    VisualLinguisticBert,
    VisualLinguisticBertForPretraining,
    VLBertConfig,
)

HID, HEADS, LAYERS, INTER = 48, 4, 2, 96


def tiny_config(**kw):
    base = dict(
        vocab_size=1200, hidden_size=HID, visual_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=64,
        type_vocab_size=3, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, visual_ln=True,
        visual_scale_text_init=1.0, visual_scale_object_init=1.0,
        with_pooler=True,
    )
    base.update(kw)
    return VLBertConfig(**base)


def test_bert_encoder_matches_torch_bert():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig
    from transformers.models.bert.modeling_bert import BertEncoder as HFBertEncoder

    hf_cfg = HFBertConfig(
        vocab_size=100, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFBertEncoder(hf_cfg).eval()

    enc = BertEncoder(
        num_layers=LAYERS, num_heads=HEADS, hidden_size=HID,
        intermediate_size=INTER, hidden_act="gelu",
        attention_dropout=0.0, hidden_dropout=0.0, initializer_range=0.02)

    B, L = 2, 10
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, HID)).astype(np.float32)
    mask = np.ones((B, L), np.float32)
    mask[0, 7:] = 0.0
    bias = (1.0 - mask[:, None, None, :]) * -10000.0

    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(bias))

    # copy torch weights into the flax tree
    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    p = jax.tree_util.tree_map(lambda a: a, params)["params"]
    for i, layer in enumerate(hf.layer):
        lp = p[f"layer_{i}"]
        a = layer.attention
        lp["attention"]["self"]["query"]["kernel"] = t2j(a.self.query.weight.T)
        lp["attention"]["self"]["query"]["bias"] = t2j(a.self.query.bias)
        lp["attention"]["self"]["key"]["kernel"] = t2j(a.self.key.weight.T)
        lp["attention"]["self"]["key"]["bias"] = t2j(a.self.key.bias)
        lp["attention"]["self"]["value"]["kernel"] = t2j(a.self.value.weight.T)
        lp["attention"]["self"]["value"]["bias"] = t2j(a.self.value.bias)
        lp["attention"]["output_dense"]["kernel"] = t2j(a.output.dense.weight.T)
        lp["attention"]["output_dense"]["bias"] = t2j(a.output.dense.bias)
        lp["attention"]["output_LayerNorm"]["scale"] = t2j(a.output.LayerNorm.weight)
        lp["attention"]["output_LayerNorm"]["bias"] = t2j(a.output.LayerNorm.bias)
        lp["intermediate_dense"]["kernel"] = t2j(layer.intermediate.dense.weight.T)
        lp["intermediate_dense"]["bias"] = t2j(layer.intermediate.dense.bias)
        lp["output_dense"]["kernel"] = t2j(layer.output.dense.weight.T)
        lp["output_dense"]["bias"] = t2j(layer.output.dense.bias)
        lp["output_LayerNorm"]["scale"] = t2j(layer.output.LayerNorm.weight)
        lp["output_LayerNorm"]["bias"] = t2j(layer.output.LayerNorm.bias)

    ours = enc.apply({"params": p}, jnp.asarray(x), jnp.asarray(bias))

    with torch.no_grad():
        theirs = hf(
            torch.from_numpy(x),
            attention_mask=torch.from_numpy(bias.astype(np.float32)),
        ).last_hidden_state.numpy()

    # compare at live positions only
    live = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(ours)[live], theirs[live], rtol=2e-4, atol=2e-5)


def _make_inputs(rng, B, T, O, text_lens, obj_lens, cfg):
    ids = rng.integers(1, cfg.vocab_size, size=(B, T)).astype(np.int32)
    tt = rng.integers(0, 2, size=(B, T)).astype(np.int32)
    tve = rng.normal(size=(B, T, cfg.visual_size)).astype(np.float32)
    ove = rng.normal(size=(B, O, 2 * cfg.visual_size)).astype(np.float32)
    tmask = (np.arange(T)[None] < np.asarray(text_lens)[:, None])
    omask = (np.arange(O)[None] < np.asarray(obj_lens)[:, None])
    # text visual embedding is shared per-image in the reference; keep random
    return ids, tt, tve, tmask, ove, omask


def test_static_layout_padding_invariance():
    """Extra padding slots must not change any live output (incl. pooled)."""
    cfg = tiny_config()
    model = VisualLinguisticBert(cfg)
    rng = np.random.default_rng(1)
    B, T, O = 2, 12, 6
    text_lens, obj_lens = [7, 12], [4, 2]
    ids, tt, tve, tmask, ove, omask = _make_inputs(
        rng, B, T, O, text_lens, obj_lens, cfg)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(tve), jnp.asarray(tmask), jnp.asarray(ove),
        jnp.asarray(omask))

    def run(T2, O2):
        out_t, out_o, pooled = model.apply(
            params,
            jnp.asarray(ids[:, :T2]), jnp.asarray(tt[:, :T2]),
            jnp.asarray(tve[:, :T2]), jnp.asarray(tmask[:, :T2]),
            jnp.asarray(ove[:, :O2]), jnp.asarray(omask[:, :O2]),
            output_text_and_object_separately=True)
        return np.asarray(out_t), np.asarray(out_o), np.asarray(pooled)

    t_full, o_full, p_full = run(T, O)

    # widen the buckets: +4 text pad slots, +3 object pad slots
    ids2 = np.concatenate([ids, np.zeros((B, 4), np.int32)], 1)
    tt2 = np.concatenate([tt, np.zeros((B, 4), np.int32)], 1)
    tve2 = np.concatenate([tve, np.zeros((B, 4, cfg.visual_size), np.float32)], 1)
    tmask2 = np.concatenate([tmask, np.zeros((B, 4), bool)], 1)
    ove2 = np.concatenate([ove, np.zeros((B, 3, 2 * cfg.visual_size), np.float32)], 1)
    omask2 = np.concatenate([omask, np.zeros((B, 3), bool)], 1)

    out_t2, out_o2, p2 = model.apply(
        params, jnp.asarray(ids2), jnp.asarray(tt2), jnp.asarray(tve2),
        jnp.asarray(tmask2), jnp.asarray(ove2), jnp.asarray(omask2),
        output_text_and_object_separately=True)
    out_t2, out_o2, p2 = map(np.asarray, (out_t2, out_o2, p2))

    for b in range(B):
        np.testing.assert_allclose(
            t_full[b, :text_lens[b]], out_t2[b, :text_lens[b]],
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            o_full[b, :obj_lens[b]], out_o2[b, :obj_lens[b]],
            rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(p_full, p2, rtol=1e-5, atol=1e-5)
    # masked object slots are zeroed (matches reference new_zeros re-split)
    assert np.all(out_o2[:, -1] == 0)


def test_position_and_type_id_semantics():
    """Objects all share position text_len+ppi; END gets text_len+1+ppi;
    types are 2 for objects/END (ref :216-231)."""
    cfg = tiny_config()
    model = VisualLinguisticBert(cfg)
    rng = np.random.default_rng(2)
    B, T, O = 1, 6, 3
    ids, tt, tve, tmask, ove, omask = _make_inputs(rng, B, T, O, [4], [2], cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(tve), jnp.asarray(tmask), jnp.asarray(ove),
        jnp.asarray(omask))

    emb, mask = model.apply(
        params, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(tve),
        jnp.asarray(tmask), jnp.asarray(ove), jnp.asarray(omask),
        method=VisualLinguisticBert.embedding)
    mask = np.asarray(mask)
    # mask layout: 4 live text, 2 pad text, 2 live obj, 1 pad obj, END
    assert mask[0].tolist() == [True] * 4 + [False] * 2 + [True] * 2 + [False] + [True]

    # the two live objects must share identical position+type embedding
    # contribution: with identical visual embeddings they must be identical
    ove_same = np.tile(ove[:, :1], (1, O, 1))
    emb2, _ = model.apply(
        params, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(tve),
        jnp.asarray(tmask), jnp.asarray(ove_same), jnp.asarray(omask),
        method=VisualLinguisticBert.embedding)
    emb2 = np.asarray(emb2)
    np.testing.assert_allclose(emb2[0, T], emb2[0, T + 1], rtol=1e-6, atol=1e-6)


def test_pretraining_heads_shapes():
    cfg = tiny_config()
    model = VisualLinguisticBertForPretraining(cfg)
    rng = np.random.default_rng(3)
    B, T, O = 2, 8, 4
    ids, tt, tve, tmask, ove, omask = _make_inputs(
        rng, B, T, O, [5, 8], [3, 4], cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(tve), jnp.asarray(tmask), jnp.asarray(ove),
        jnp.asarray(omask))
    rel, mlm, mvrc = model.apply(
        params, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(tve),
        jnp.asarray(tmask), jnp.asarray(ove), jnp.asarray(omask))
    assert rel.shape == (B, 2)
    assert mlm.shape == (B, T, cfg.vocab_size)
    assert mvrc.shape == (B, O, cfg.visual_region_classes)


def test_word_embedding_frozen_gradients():
    """With word_embedding_frozen, grads flow only to the special table
    (ref :80-93 + requires_grad=False on the main table)."""
    cfg = tiny_config(word_embedding_frozen=True)
    model = VisualLinguisticBert(cfg)
    rng = np.random.default_rng(4)
    B, T, O = 1, 4, 2
    ids = np.array([[5, 1100, 3, 0]], np.int32)  # mixed special/non-special
    tt = np.zeros((B, T), np.int32)
    tve = rng.normal(size=(B, T, cfg.visual_size)).astype(np.float32)
    tmask = np.array([[1, 1, 1, 0]], bool)
    ove = rng.normal(size=(B, O, 2 * cfg.visual_size)).astype(np.float32)
    omask = np.ones((B, O), bool)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(tt),
        jnp.asarray(tve), jnp.asarray(tmask), jnp.asarray(ove), jnp.asarray(omask))

    def loss(p):
        seq, pooled = model.apply(
            p, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(tve),
            jnp.asarray(tmask), jnp.asarray(ove), jnp.asarray(omask))
        return jnp.sum(seq ** 2)

    g = jax.grad(loss)(params)["params"]
    assert np.allclose(np.asarray(g["word_embeddings"]["embedding"]), 0)
    sp = np.asarray(g["special_word_embeddings"]["embedding"])
    assert np.abs(sp).sum() > 0
    # only rows for ids < 1000 that appear get gradient
    assert np.abs(sp[5]).sum() > 0 and np.abs(sp[3]).sum() > 0
