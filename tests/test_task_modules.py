"""End-to-end forward/loss tests for the four task modules."""

import numpy as np
import jax
import jax.numpy as jnp

from vlbert_tpu.models.task_modules import build_module
from vlbert_tpu.utils.config import default_config


def small_vlbert(cfg, visual_size=None):
    v = cfg.NETWORK.VLBERT
    v.hidden_size = 32
    v.visual_size = visual_size or 32
    v.num_hidden_layers = 1
    v.num_attention_heads = 2
    v.intermediate_size = 64
    v.vocab_size = 300
    v.max_position_embeddings = 64
    v.visual_ln = True
    v.visual_scale_text_init = 1.0
    v.visual_scale_object_init = 1.0
    cfg.NETWORK.IMAGE_FINAL_DIM = v.visual_size


def test_vcr_module_train_and_inference(rng):
    cfg = default_config("vcr")
    cfg.MODULE = "ResNetVLBERT"
    cfg.DATASET.TASK = "Q2A"
    small_vlbert(cfg)
    cfg.NETWORK.IMAGE_NUM_LAYERS = 18
    cfg.NETWORK.IMAGE_SEMANTIC = True
    cfg.NETWORK.ENABLE_CNN_REG_LOSS = True
    cfg.NETWORK.CLASSIFIER_HIDDEN_SIZE = 32
    m = build_module(cfg, "vcr", dtype=jnp.float32)

    B, C, T, O = 2, 4, 10, 5
    image = jnp.asarray(rng.normal(size=(B, 32, 32, 3)), jnp.float32)
    boxes = np.zeros((B, O, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 10, (B, O)); boxes[..., 1] = rng.uniform(0, 10, (B, O))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(4, 20, (B, O))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(4, 20, (B, O))
    objects = jnp.asarray(rng.integers(0, 81, (B, O)), jnp.int32)
    segms = jnp.asarray(rng.uniform(size=(B, O, 7, 7)) > 0.5, jnp.float32)
    box_mask = jnp.asarray(np.arange(O)[None] < np.asarray([[4], [5]]))
    ids = jnp.asarray(rng.integers(1, 300, (B, C, T)), jnp.int32)
    tt = jnp.asarray(rng.integers(0, 2, (B, C, T)), jnp.int32)
    tags = jnp.asarray(rng.integers(0, 4, (B, C, T)), jnp.int32)
    tmask = jnp.asarray(np.arange(T)[None, None] < 8)
    tmask = jnp.broadcast_to(tmask, (B, C, T))
    im_info = jnp.asarray([[32, 32, 1, 1]] * B, jnp.float32)
    label = jnp.asarray([1, 3], jnp.int32)

    args = (image, jnp.asarray(boxes), objects, segms, box_mask,
            ids, tt, tags, tmask, im_info, label)
    params = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                    *args, train=True)
    outputs, loss = m.apply(params, *args, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
    assert outputs["label_logits"].shape == (B, C)
    assert np.isfinite(float(loss))
    assert "cnn_regularization_loss" in outputs

    inf = m.apply(params, image, jnp.asarray(boxes), objects, segms, box_mask,
                  ids, tt, tags, tmask, im_info, train=False)
    assert inf["label_logits"].shape == (B, C)

    # sigmoid-BCE variant (ref vcr:349-361)
    cfg2 = cfg.clone()
    cfg2.NETWORK.CLASSIFIER_SIGMOID = True
    m2 = build_module(cfg2, "vcr", dtype=jnp.float32)
    out2, loss2 = m2.apply(params, *args, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss2))
    assert abs(float(out2["positive_fraction"]) - 0.25) < 1e-6


def test_vqa_module_precomputed(rng):
    cfg = default_config("vqa")
    cfg.MODULE = "ResNetVLBERT"
    small_vlbert(cfg)
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    cfg.DATASET.ANSWER_VOCAB_SIZE = 20
    cfg.NETWORK.CLASSIFIER_TYPE = "1fc"
    m = build_module(cfg, "vqa", dtype=jnp.float32)

    B, O, T, F = 2, 6, 12, 64
    boxes = np.zeros((B, O, 4 + F), np.float32)
    boxes[..., 0] = rng.uniform(0, 50, (B, O)); boxes[..., 1] = rng.uniform(0, 50, (B, O))
    boxes[..., 2] = boxes[..., 0] + 20; boxes[..., 3] = boxes[..., 1] + 20
    boxes[..., 4:] = rng.normal(size=(B, O, F))
    box_mask = jnp.ones((B, O), bool)
    ids = jnp.asarray(rng.integers(1, 300, (B, T)), jnp.int32)
    tt = jnp.zeros((B, T), jnp.int32)
    tmask = jnp.broadcast_to(jnp.asarray(np.arange(T)[None] < 9), (B, T))
    ans_pos = jnp.asarray([7, 7], jnp.int32)
    im_info = jnp.asarray([[100, 80, 1, 1]] * B, jnp.float32)
    label = jnp.asarray(rng.uniform(size=(B, 20)) > 0.8, jnp.float32)

    # note: FastRCNN precomputed expects visual feature dim == obj feature;
    # obj_downsample input = coords(2048) + F
    args = (None, jnp.asarray(boxes), box_mask, im_info, ids, tt, tmask,
            ans_pos, label)
    params = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                    *args, train=True)
    outputs, loss = m.apply(params, *args, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
    assert outputs["label_logits"].shape == (B, 20)
    # BCE x num_answers (ref vqa:249)
    assert np.isfinite(float(loss))

    inf = m.apply(params, None, jnp.asarray(boxes), box_mask, im_info, ids,
                  tt, tmask, ans_pos, train=False)
    assert inf["label_logits"].shape == (B, 20)


def test_refcoco_module(rng):
    cfg = default_config("refcoco")
    cfg.MODULE = "ResNetVLBERT"
    small_vlbert(cfg)
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    m = build_module(cfg, "refcoco", dtype=jnp.float32)

    B, O, T, F = 2, 5, 8, 64
    boxes = np.zeros((B, O, 4 + F), np.float32)
    boxes[..., 0] = rng.uniform(0, 50, (B, O)); boxes[..., 1] = rng.uniform(0, 50, (B, O))
    boxes[..., 2] = boxes[..., 0] + 30; boxes[..., 3] = boxes[..., 1] + 30
    boxes[..., 4:] = rng.normal(size=(B, O, F))
    box_mask = jnp.asarray(np.arange(O)[None] < np.asarray([[5], [3]]))
    ids = jnp.asarray(rng.integers(1, 300, (B, T)), jnp.int32)
    tmask = jnp.broadcast_to(jnp.asarray(np.arange(T)[None] < 6), (B, T))
    im_info = jnp.asarray([[100, 80, 2.0, 2.0]] * B, jnp.float32)
    label = jnp.asarray(rng.uniform(size=(B, O)) > 0.5, jnp.float32)

    args = (None, jnp.asarray(boxes), box_mask, im_info, ids, tmask, label)
    params = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                    *args, train=True)
    outputs, loss = m.apply(params, *args, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
    assert outputs["label_logits"].shape == (B, O)
    assert np.isfinite(float(loss))
    # invalid slots at -10000
    assert np.all(np.asarray(outputs["label_logits"])[1, 3:] == -10000.0)

    inf = m.apply(params, None, jnp.asarray(boxes), box_mask, im_info, ids,
                  tmask, train=False)
    assert inf["pred_boxes"].shape == (B, 4)
    # rescale by im_info ratios (ref refcoco:219-223): coords halved
    logits = np.asarray(inf["label_logits"])
    best = logits.argmax(1)
    expected = boxes[np.arange(B), best, :4] / 2.0
    np.testing.assert_allclose(np.asarray(inf["pred_boxes"]), expected,
                               rtol=1e-5)


def test_pretrain_multitask_module(rng):
    cfg = default_config("pretrain")
    cfg.MODULE = "ResNetVLBERTForPretrainingMultitask"
    small_vlbert(cfg)
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    cfg.NETWORK.VLBERT.visual_region_classes = 11
    cfg.NETWORK.VLBERT.with_pooler = True
    cfg.NETWORK.WITH_REL_LOSS = True
    m = build_module(cfg, "pretrain", dtype=jnp.float32,
                     mask_visual_feat_dim=64)

    B, B2, O, T, T2, F = 2, 3, 4, 10, 14, 64
    boxes = np.full((B, O, 4 + F), -2.0, np.float32)
    boxes[:, :3, 0] = rng.uniform(0, 50, (B, 3))
    boxes[:, :3, 1] = rng.uniform(0, 50, (B, 3))
    boxes[:, :3, 2] = boxes[:, :3, 0] + 30
    boxes[:, :3, 3] = boxes[:, :3, 1] + 30
    boxes[:, :3, 4:] = rng.normal(size=(B, 3, F))
    text = np.zeros((B, T), np.int32)
    text[:, :7] = rng.integers(1, 300, (B, 7))
    mlm_labels = np.full((B, T), -1, np.int32)
    mlm_labels[:, 2] = 5
    mvrc_ops = np.zeros((B, O), np.int32)
    mvrc_ops[:, 1] = 1
    mvrc_labels = np.zeros((B, O, 11), np.float32)
    mvrc_labels[:, 1, 3] = 1.0   # only masked region has soft label
    rel_label = jnp.asarray([0, 1], jnp.int32)
    aux_text = np.zeros((B2, T2), np.int32)
    aux_text[:, :10] = rng.integers(1, 300, (B2, 10))
    aux_mlm = np.full((B2, T2), -1, np.int32)
    aux_mlm[:, 4] = 9
    im_info = jnp.asarray([[100, 80, 1, 1]] * B, jnp.float32)

    args = (None, jnp.asarray(boxes), im_info, jnp.asarray(text), rel_label,
            jnp.asarray(mlm_labels), jnp.asarray(mvrc_ops),
            jnp.asarray(mvrc_labels), jnp.asarray(aux_text),
            jnp.asarray(aux_mlm))
    params = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                    *args, train=True)
    outputs, loss = m.apply(params, *args, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
    for k in ("relationship_loss", "mlm_loss_wvc", "mlm_loss_aux", "mvrc_loss"):
        assert np.isfinite(float(outputs[k])), k
    total = (float(outputs["relationship_loss"]) + float(outputs["mlm_loss_wvc"])
             + float(outputs["mlm_loss_aux"]) + float(outputs["mvrc_loss"]))
    assert abs(float(loss) - total) < 1e-5
    assert outputs["mvrc_logits"].shape == (B, O, 11)


def test_vcr_blind_mode(rng):
    """NETWORK.BLIND (text-only ablation, ref vcr module :111-114,311): no
    visual features are consumed — logits must be invariant to the image
    and boxes, and the forward stays finite."""
    cfg = default_config("vcr")
    cfg.MODULE = "ResNetVLBERT"
    cfg.DATASET.TASK = "Q2A"
    small_vlbert(cfg)
    cfg.NETWORK.BLIND = True
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    cfg.NETWORK.ENABLE_CNN_REG_LOSS = False
    m = build_module(cfg, "vcr", dtype=jnp.float32)

    B, O, T, F = 2, 4, 10, 32
    def batch(seed):
        r = np.random.default_rng(seed)
        boxes = np.zeros((B, O, 4 + F), np.float32)
        boxes[..., 2:4] = 30.0
        boxes[..., 4:] = r.normal(size=(B, O, F))
        return (None, jnp.asarray(boxes), jnp.zeros((B, O), jnp.int32),
                jnp.zeros((B, O, 7, 7)), jnp.ones((B, O), bool),
                jnp.ones((B, 4, T), jnp.int32), jnp.zeros((B, 4, T), jnp.int32),
                jnp.zeros((B, 4, T), jnp.int32), jnp.ones((B, 4, T), bool),
                jnp.asarray([[64, 64, 1, 1]] * B, jnp.float32),
                jnp.zeros((B,), jnp.int32))

    b1, b2 = batch(0), batch(1)          # different visual features
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, *b1, train=True)
    out1, loss1 = m.apply(params, *b1, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
    out2, _ = m.apply(params, *b2, train=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss1))
    np.testing.assert_allclose(np.asarray(out1["label_logits"]),
                               np.asarray(out2["label_logits"]), rtol=1e-6)


def test_vcr_object_word_embed_modes_and_no_grounding(rng):
    """object_word_embed_mode 2 (generic single embedding) and 3 (mean of
    non-special word embeddings, ref vcr module :316-322) both run; with
    NO_GROUNDING the text tags are zeroed so logits are tag-invariant."""
    def run(mode, no_grounding=False, tags=None):
        cfg = default_config("vcr")
        cfg.MODULE = "ResNetVLBERT"
        cfg.DATASET.TASK = "Q2A"
        small_vlbert(cfg)
        cfg.NETWORK.VLBERT.object_word_embed_mode = mode
        cfg.NETWORK.NO_GROUNDING = no_grounding
        cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
        cfg.NETWORK.ENABLE_CNN_REG_LOSS = False
        m = build_module(cfg, "vcr", dtype=jnp.float32)
        B, O, T, F = 2, 4, 10, 32
        r = np.random.default_rng(0)
        boxes = np.zeros((B, O, 4 + F), np.float32)
        boxes[..., 2:4] = 30.0
        boxes[..., 4:] = r.normal(size=(B, O, F))
        t = tags if tags is not None else jnp.zeros((B, 4, T), jnp.int32)
        batch = (None, jnp.asarray(boxes), jnp.zeros((B, O), jnp.int32),
                 jnp.zeros((B, O, 7, 7)), jnp.ones((B, O), bool),
                 jnp.ones((B, 4, T), jnp.int32),
                 jnp.zeros((B, 4, T), jnp.int32), t,
                 jnp.ones((B, 4, T), bool),
                 jnp.asarray([[64, 64, 1, 1]] * B, jnp.float32),
                 jnp.zeros((B,), jnp.int32))
        params = m.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, *batch, train=True)
        out, loss = m.apply(params, *batch, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
        return np.asarray(out["label_logits"]), float(loss)

    for mode in (2, 3):
        logits, loss = run(mode)
        assert np.isfinite(loss) and logits.shape == (2, 4), mode

    # NO_GROUNDING: different tags give identical logits
    tags_a = jnp.zeros((2, 4, 10), jnp.int32)
    tags_b = jnp.ones((2, 4, 10), jnp.int32)
    la, _ = run(2, no_grounding=True, tags=tags_a)
    lb, _ = run(2, no_grounding=True, tags=tags_b)
    np.testing.assert_allclose(la, lb, rtol=1e-6)
