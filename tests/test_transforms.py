"""Transform tests: resize math, flip, BGRx255 normalization, FixPadding."""

import numpy as np

from vlbert_tpu.data.transforms import (Compose, FixPadding, Normalize,
                                        RandomHorizontalFlip, Resize,
                                        resize_size)


def test_resize_size_shortest_edge_with_cap():
    # ref transforms.py:34-54
    assert resize_size(800, 600, 600, 1000) == (800, 600)
    # scale shortest edge to 600: 1200x600 -> cap at 1000: size=500
    assert resize_size(1200, 600, 600, 1000) == (1000, 500)
    # 300x600 scaled to shortest-edge 600 would be 600x1200 > cap 1000,
    # so size shrinks to 1000*300/600 = 500 (ref :38-42)
    assert resize_size(300, 600, 600, 1000) == (500, 1000)
    # already at min size
    assert resize_size(600, 800, 600, 1000) == (600, 800)


def test_resize_updates_boxes_and_im_info(rng):
    img = rng.uniform(size=(60, 80, 3)).astype(np.float32)
    boxes = np.asarray([[8.0, 6.0, 40.0, 30.0]], np.float32)
    s = {"image": img, "boxes": boxes.copy(), "masks": None,
         "im_info": np.asarray([80, 60, 1, 1], np.float32), "flipped": False}
    s = Resize(120, 200)(s)
    assert s["image"].shape[:2] == (120, 160)
    np.testing.assert_allclose(s["im_info"][:2], [160, 120])
    np.testing.assert_allclose(s["im_info"][2:4], [2.0, 2.0])
    np.testing.assert_allclose(s["boxes"][0], [16, 12, 80, 60])


def test_hflip_boxes_and_masks(rng):
    img = rng.uniform(size=(10, 20, 3)).astype(np.float32)
    boxes = np.asarray([[2.0, 1.0, 5.0, 4.0]], np.float32)
    masks = np.zeros((1, 4, 4), np.float32)
    masks[0, :, 0] = 1
    s = {"image": img, "boxes": boxes.copy(), "masks": masks.copy(),
         "im_info": np.asarray([20, 10, 1, 1], np.float32), "flipped": False}
    flip = RandomHorizontalFlip(prob=1.0, rng=np.random.default_rng(0))
    s = flip(s)
    assert s["flipped"]
    # x' = w - 1 - x (ref :77), swapped
    np.testing.assert_allclose(s["boxes"][0], [20 - 1 - 5, 1, 20 - 1 - 2, 4])
    assert s["masks"][0, 0, -1] == 1 and s["masks"][0, 0, 0] == 0
    np.testing.assert_allclose(s["image"], img[:, ::-1])


def test_normalize_bgr255():
    img = np.zeros((2, 2, 3), np.float32)
    img[..., 0] = 1.0   # R=1
    s = {"image": img, "boxes": None, "masks": None,
         "im_info": np.zeros(4, np.float32), "flipped": False}
    mean = (102.9801, 115.9465, 122.7717)
    s = Normalize(mean, (1, 1, 1))(s)
    # channel 0 becomes B (=0*255) - mean[0]; channel 2 becomes R*255 - mean[2]
    np.testing.assert_allclose(s["image"][0, 0, 0], -102.9801, rtol=1e-5)
    np.testing.assert_allclose(s["image"][0, 0, 2], 255 - 122.7717, rtol=1e-5)


def test_fix_padding_orientation():
    for (h, w), want in (((60, 100), (80, 120)), ((100, 60), (120, 80))):
        img = np.ones((h, w, 3), np.float32)
        s = {"image": img, "boxes": None, "masks": None,
             "im_info": np.zeros(4, np.float32), "flipped": False}
        s = FixPadding(80, 120)(s)
        assert s["image"].shape[:2] == want
        assert s["image"][:h, :w].min() == 1.0
        assert s["image"][h:, :].sum() == 0


def test_uint8_device_norm_path_matches_host_float_path(rng):
    """uint8-on-the-wire path (ops/image_norm.py): resize/flip/pad in uint8
    on the host + on-device BGR255-mean normalize must equal the host
    Normalize chain exactly, including the zero padding region."""
    import jax.numpy as jnp

    from vlbert_tpu.ops.image_norm import normalize_uint8_image

    img_u8 = (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8)
    mean = (102.9801, 115.9465, 122.7717)
    std = (1.0, 1.0, 1.0)

    def run(chain, image):
        s = {"image": image.copy(), "boxes": np.zeros((1, 4), np.float32),
             "masks": None, "im_info": np.asarray([80, 60, 1, 1], np.float32),
             "flipped": False}
        return Compose(chain)(s)

    host = run([Resize(100, 160), Normalize(mean, std), FixPadding(100, 160)],
               img_u8)
    dev = run([Resize(100, 160), FixPadding(100, 160)], img_u8)
    assert dev["image"].dtype == np.uint8
    out = np.asarray(normalize_uint8_image(
        jnp.asarray(dev["image"][None]), jnp.asarray(dev["im_info"][None]),
        mean, std))
    np.testing.assert_array_equal(out[0], host["image"])
    # padded region must be exactly zero (not -mean)
    assert np.all(out[0, int(host["im_info"][1]):] == 0.0)


def test_fast_rcnn_uint8_dispatch_matches_float(rng):
    """FastRCNN forward on a uint8 batch == forward on the equivalent
    host-normalized float batch (dtype is the dispatch signal)."""
    import jax
    import jax.numpy as jnp

    from vlbert_tpu.models.fast_rcnn import FastRCNN
    from vlbert_tpu.ops.image_norm import normalize_uint8_image

    mean = (102.9801, 115.9465, 122.7717)
    img_u8 = (rng.uniform(size=(1, 32, 48, 3)) * 255).astype(np.uint8)
    im_info = np.asarray([[40, 28, 1, 1]], np.float32)  # valid 28x40 region
    img_f32 = np.asarray(normalize_uint8_image(
        jnp.asarray(img_u8), jnp.asarray(im_info), mean, (1.0, 1.0, 1.0)))
    boxes = np.asarray([[[2.0, 2.0, 30.0, 20.0], [5.0, 4.0, 38.0, 26.0]]],
                       np.float32)
    box_mask = np.ones((1, 2), bool)

    m = FastRCNN(num_layers=18, final_dim=32, frozen_stages=(),
                 pixel_means=mean, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(img_f32),
                    jnp.asarray(boxes), jnp.asarray(box_mask),
                    jnp.asarray(im_info))
    out_f = m.apply(params, jnp.asarray(img_f32), jnp.asarray(boxes),
                    jnp.asarray(box_mask), jnp.asarray(im_info))
    out_u = m.apply(params, jnp.asarray(img_u8), jnp.asarray(boxes),
                    jnp.asarray(box_mask), jnp.asarray(im_info))
    np.testing.assert_allclose(np.asarray(out_u["obj_reps"]),
                               np.asarray(out_f["obj_reps"]), atol=1e-6)


def test_resize_cv2_impl_close_to_pil_on_natural_image():
    """RESIZE_IMPL='cv2' (v5e-tuned configs) must track the exact-parity
    PIL path closely on natural (smooth) content at this pipeline's
    near-unity scales: <=2 LSB max, <=0.3 LSB mean on uint8."""
    import pytest

    pytest.importorskip("cv2")
    yy, xx = np.mgrid[0:360, 0:480]
    img = np.stack([(yy // 3 + xx // 5) % 256, (xx // 2) % 256,
                    ((xx + yy) // 4) % 256], -1).astype(np.uint8)

    def run(impl):
        s = {"image": img.copy(), "boxes": None, "masks": None,
             "im_info": np.asarray([480, 360, 1, 1], np.float32),
             "flipped": False}
        return Resize(340, 500, impl=impl)(s)["image"]

    out_pil = run("pil").astype(np.int32)
    out_cv2 = run("cv2").astype(np.int32)
    assert out_pil.shape == out_cv2.shape
    d = np.abs(out_pil - out_cv2)
    assert d.max() <= 2 and d.mean() <= 0.3, (d.max(), d.mean())


def test_build_transforms_resize_impl_knob():
    """cfg.TPU.RESIZE_IMPL plumbs into the Resize stage; default is the
    exact-parity 'pil'."""
    from vlbert_tpu.data.transforms import build_transforms
    from vlbert_tpu.utils.config import load_config

    cfg = load_config("vcr", "cfgs/vcr/base_q2a_4x16G_fp32.yaml")
    chain = build_transforms(cfg, mode="train").transforms
    assert chain[0].impl == "pil"
    cfg_v5e = load_config("vcr", "cfgs/vcr/base_q2a_v5e_bf16.yaml")
    chain = build_transforms(cfg_v5e, mode="train").transforms
    assert chain[0].impl == "cv2"


def test_hflip_view_then_fixpadding_matches_copy_semantics(rng):
    """Flip now returns negative-stride views; FixPadding must still
    produce the same canvas as the old eager-copy flip."""
    img = (rng.uniform(size=(30, 20, 3)) * 255).astype(np.uint8)
    s = {"image": img, "boxes": None, "masks": None,
         "im_info": np.asarray([20, 30, 1, 1], np.float32), "flipped": False}
    s = RandomHorizontalFlip(prob=1.1)(s)
    assert s["flipped"]
    out = FixPadding(30, 40)(s)["image"]
    assert out.flags["C_CONTIGUOUS"]
    np.testing.assert_array_equal(out[:30, :20], img[:, ::-1])
