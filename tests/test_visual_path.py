"""ResNet / FastRCNN / coordinate-embedding tests."""

import numpy as np
import jax
import jax.numpy as jnp

from vlbert_tpu.models.fast_rcnn import FastRCNN
from vlbert_tpu.models.resnet import ResNetC4Backbone, ResNetRoIHead
from vlbert_tpu.ops.coord_embed import coordinate_embeddings


def coordinate_embeddings_np(boxes, dim):
    """Independent numpy mirror of ref common/utils/bbox.py:33-65."""
    boxes = boxes.astype(np.float64)
    w, h = boxes[:, 4], boxes[:, 5]
    xc = (boxes[:, 0] + boxes[:, 2]) / 2
    yc = (boxes[:, 1] + boxes[:, 3]) / 2
    bw = boxes[:, 2] - boxes[:, 0]
    bh = boxes[:, 3] - boxes[:, 1]
    pos = np.stack([xc / w * 100, yc / h * 100, bw / w * 100, bh / h * 100], -1)
    dim_mat = 1000.0 ** (np.arange(dim) / dim)
    arg = pos[..., None] / dim_mat
    return np.concatenate([np.sin(arg), np.cos(arg)], -1)


def test_coordinate_embeddings_golden(rng):
    # realistic boxes: inside the image, so pos <= 100 and fp32 sin/cos is
    # accurate (the reference also computes in fp32: bbox.py:61-63)
    K = 7
    boxes = np.zeros((K, 6), np.float32)
    boxes[:, 4] = rng.uniform(300, 1300, K)   # w_img
    boxes[:, 5] = rng.uniform(300, 1300, K)   # h_img
    boxes[:, 0] = rng.uniform(0, 0.7, K) * boxes[:, 4]
    boxes[:, 1] = rng.uniform(0, 0.7, K) * boxes[:, 5]
    boxes[:, 2] = boxes[:, 0] + rng.uniform(0.05, 0.3, K) * boxes[:, 4]
    boxes[:, 3] = boxes[:, 1] + rng.uniform(0.05, 0.3, K) * boxes[:, 5]
    ours = np.asarray(coordinate_embeddings(jnp.asarray(boxes), 256))
    golden = coordinate_embeddings_np(boxes, 256)
    assert ours.shape == (K, 4, 512)
    # fp32 sin/cos of args up to ~100 carries ~1e-4 absolute error vs the
    # fp64 golden; the reference computes in fp32 too (bbox.py:61-63)
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=3e-4)


def test_resnet_c4_shape(rng):
    m = ResNetC4Backbone(num_layers=18, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 4, 6, 256)  # stride 16; basic-block C4 = 256

    head = ResNetRoIHead(num_layers=18, average_pool=True)
    hp = head.init(jax.random.PRNGKey(0), jnp.zeros((2, 14, 14, 256)))
    out = head.apply(hp, jnp.asarray(rng.normal(size=(2, 14, 14, 256)), jnp.float32))
    assert out.shape == (2, 512)


def test_fast_rcnn_precomputed(rng):
    B, O, D = 2, 5, 32
    m = FastRCNN(image_feat_precomputed=True, final_dim=24)
    boxes = np.concatenate(
        [np.abs(rng.normal(size=(B, O, 4))) * 50 + 1,
         rng.normal(size=(B, O, D))], -1).astype(np.float32)
    boxes[..., 2:4] += boxes[..., 0:2]  # x2>x1, y2>y1
    mask = np.ones((B, O), bool)
    mask[0, 3:] = False
    im_info = np.asarray([[200, 150, 1, 1], [180, 120, 1, 1]], np.float32)

    params = m.init(jax.random.PRNGKey(0), None, jnp.asarray(boxes),
                    jnp.asarray(mask), jnp.asarray(im_info))
    out = m.apply(params, None, jnp.asarray(boxes), jnp.asarray(mask),
                  jnp.asarray(im_info))
    assert out["obj_reps"].shape == (B, O, 24)
    assert out["obj_reps_raw"].shape == (B, O, D)
    # raw features pass through unchanged on live slots
    np.testing.assert_allclose(
        np.asarray(out["obj_reps_raw"])[mask], boxes[..., 4:][mask], rtol=1e-6)
    # masked slots zeroed
    assert np.all(np.asarray(out["obj_reps"])[~mask] == 0)


def test_fast_rcnn_e2e_grads_respect_frozen_stages(rng):
    B, O = 1, 3
    m = FastRCNN(image_feat_precomputed=False, num_layers=18,
                 frozen_stages=(1, 2), final_dim=16,
                 enable_cnn_reg_loss=True)
    images = jnp.asarray(rng.normal(size=(B, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray([[[4, 4, 40, 40], [10, 8, 60, 50], [0, 0, 63, 63]]],
                        jnp.float32)
    mask = jnp.ones((B, O), bool)
    im_info = jnp.asarray([[64, 64, 1, 1]], jnp.float32)
    classes = jnp.asarray([[3, 7, 0]], jnp.int32)

    params = m.init(jax.random.PRNGKey(0), images, boxes, mask, im_info,
                    classes)
    out = m.apply(params, images, boxes, mask, im_info, classes)
    assert out["obj_reps"].shape == (B, O, 16)
    assert np.isfinite(float(out["cnn_regularization_loss"]))

    def loss(p):
        o = m.apply(p, images, boxes, mask, im_info, classes)
        return jnp.sum(o["obj_reps"] ** 2) + o["cnn_regularization_loss"]

    g = jax.grad(loss)(params)["params"]
    bb = g["backbone"]
    # frozen stem + layer1: zero grads (stop_gradient)
    assert np.abs(np.asarray(bb["conv1"]["kernel"])).sum() == 0
    z = jax.tree_util.tree_reduce(
        lambda a, l: a + np.abs(np.asarray(l)).sum(), bb["layer1"], 0.0)
    assert z == 0
    # trainable layer3 receives gradient
    nz = jax.tree_util.tree_reduce(
        lambda a, l: a + np.abs(np.asarray(l)).sum(), bb["layer3"], 0.0)
    assert nz > 0
    # roi head trains
    nz_head = jax.tree_util.tree_reduce(
        lambda a, l: a + np.abs(np.asarray(l)).sum(), g["roi_head"], 0.0)
    assert nz_head > 0


def test_fast_rcnn_mvrc_masking(rng):
    """mvrc_ops==1 regions get the learned mask embedding (ref :167-169)."""
    B, O, D = 1, 4, 16
    m = FastRCNN(image_feat_precomputed=True, final_dim=8)
    boxes = np.concatenate(
        [np.abs(rng.normal(size=(B, O, 4))) * 20 + 1,
         rng.normal(size=(B, O, D))], -1).astype(np.float32)
    boxes[..., 2:4] += boxes[..., 0:2]
    mask = np.ones((B, O), bool)
    im_info = np.asarray([[100, 100, 1, 1]], np.float32)
    mvrc_ops = np.asarray([[0, 1, 0, 1]], np.int32)
    mve = np.full((D,), 0.5, np.float32)

    params = m.init(jax.random.PRNGKey(0), None, jnp.asarray(boxes),
                    jnp.asarray(mask), jnp.asarray(im_info))
    out_m = m.apply(params, None, jnp.asarray(boxes), jnp.asarray(mask),
                    jnp.asarray(im_info), mvrc_ops=jnp.asarray(mvrc_ops),
                    mask_visual_embed=jnp.asarray(mve))
    out_0 = m.apply(params, None, jnp.asarray(boxes), jnp.asarray(mask),
                    jnp.asarray(im_info))
    a, b = np.asarray(out_m["obj_reps"]), np.asarray(out_0["obj_reps"])
    # unmasked regions identical, masked regions differ
    np.testing.assert_allclose(a[0, 0], b[0, 0], rtol=1e-6)
    np.testing.assert_allclose(a[0, 2], b[0, 2], rtol=1e-6)
    assert np.abs(a[0, 1] - b[0, 1]).max() > 1e-4


def test_mid_network_freeze_keeps_upstream_grads(rng):
    """frozen_stages=[3,4,5] (non-prefix): the stem must still receive
    gradients — the stop_gradient DCE applies only when EVERY stage is
    frozen (param freezing itself lives in the optimizer mask)."""
    from vlbert_tpu.models.fast_rcnn import FastRCNN

    fr = FastRCNN(num_layers=18, final_dim=32, image_feat_precomputed=False,
                  frozen_stages=(3, 4, 5), image_semantic=False,
                  dtype=jnp.float32)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray([[[2.0, 2.0, 60.0, 60.0]]])
    bmask = jnp.ones((1, 1), bool)
    ii = jnp.asarray([[64.0, 64.0, 1, 1]])
    fp = fr.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, img, boxes, bmask, ii)
    g = jax.grad(lambda p: jnp.sum(
        fr.apply(p, img, boxes, bmask, ii)["obj_reps"] ** 2))(fp)
    stem = max(float(jnp.max(jnp.abs(x))) for x in
               jax.tree_util.tree_leaves(g["params"]["backbone"]["conv1"]))
    assert stem > 0


def test_mvrc_mask_with_image_semantic(rng):
    """MVRC feature masking + IMAGE_SEMANTIC class embedding together:
    the mask applies to the bare visual features BEFORE the class-embed
    concat (a post-concat mask cannot broadcast; the reference crashes on
    this combination)."""
    from vlbert_tpu.models.fast_rcnn import FastRCNN

    fr = FastRCNN(num_layers=18, final_dim=32, image_feat_precomputed=False,
                  image_semantic=True, dtype=jnp.float32)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray([[[2.0, 2.0, 60.0, 60.0], [4.0, 4.0, 30.0, 30.0]]])
    bmask = jnp.ones((1, 2), bool)
    ii = jnp.asarray([[64.0, 64.0, 1, 1]])
    classes = jnp.zeros((1, 2), jnp.int32)
    mvrc_ops = jnp.asarray([[1, 0]], jnp.int32)
    mask_emb = jnp.zeros((512,), jnp.float32)
    p = fr.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, img, boxes, bmask, ii,
                classes=classes, mvrc_ops=mvrc_ops,
                mask_visual_embed=mask_emb)
    out = fr.apply(p, img, boxes, bmask, ii, classes=classes,
                   mvrc_ops=mvrc_ops, mask_visual_embed=mask_emb)
    assert np.isfinite(np.asarray(out["obj_reps"], np.float32)).all()
