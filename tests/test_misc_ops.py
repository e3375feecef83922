"""ROIPool golden test, grouped sampler, smart_resume, COCO-captions builder."""

import json
import os

import numpy as np
import jax.numpy as jnp

from vlbert_tpu.data.loader import GroupedBatchSampler
from vlbert_tpu.ops.roi_pool import roi_pool


def roi_pool_np(features, rois, ph, pw, scale):
    """Scalar mirror of ROIPool_cuda.cu bin rule."""
    B, H, W, C = features.shape
    K = len(rois)
    out = np.zeros((K, ph, pw, C), np.float32)
    for k, (b, x1, y1, x2, y2) in enumerate(rois):
        b = int(b)
        # CUDA round() = half-away-from-zero; python round() is banker's
        # rounding and would mirror the same deviation being tested against
        x1r, y1r = int(np.floor(x1 * scale + 0.5)), int(np.floor(y1 * scale + 0.5))
        x2r, y2r = int(np.floor(x2 * scale + 0.5)), int(np.floor(y2 * scale + 0.5))
        rw = max(x2r - x1r + 1, 1)
        rh = max(y2r - y1r + 1, 1)
        for p in range(ph):
            for q in range(pw):
                hs = int(np.floor(p * rh / ph)) + y1r
                he = int(np.ceil((p + 1) * rh / ph)) + y1r
                ws = int(np.floor(q * rw / pw)) + x1r
                we = int(np.ceil((q + 1) * rw / pw)) + x1r
                hs, he = max(hs, 0), min(he, H)
                ws, we = max(ws, 0), min(we, W)
                if hs >= he or ws >= we:
                    continue
                out[k, p, q] = features[b, hs:he, ws:we].max(axis=(0, 1))
    return out


def test_roi_pool_matches_scalar(rng):
    B, H, W, C, O = 1, 10, 12, 3, 4
    features = rng.normal(size=(B, H, W, C)).astype(np.float32)
    boxes = np.asarray([[[0, 0, 150, 150], [16, 16, 100, 120],
                         [40, 8, 180, 60], [5, 5, 20, 20]]], np.float32)
    mask = np.ones((B, O), bool)
    ours = np.asarray(roi_pool(jnp.asarray(features), jnp.asarray(boxes),
                               jnp.asarray(mask), pooled_h=3, pooled_w=3,
                               spatial_scale=1 / 16))
    rois = [[0, *boxes[0, o]] for o in range(O)]
    golden = roi_pool_np(features, rois, 3, 3, 1 / 16)
    np.testing.assert_allclose(ours[0], golden, rtol=1e-6, atol=1e-6)


def test_grouped_batch_sampler():
    group_ids = np.asarray([0, 1, 0, 0, 1, 1, 0, 1])
    sampler_order = [3, 1, 0, 5, 2, 7, 4, 6]
    gbs = GroupedBatchSampler(sampler_order, group_ids, batch_size=2)
    batches = list(gbs)
    for b in batches:
        gs = {int(group_ids[i]) for i in b}
        assert len(gs) == 1           # homogeneous groups
    flat = [i for b in batches for i in b]
    assert sorted(flat) == sorted(sampler_order)


def test_smart_resume_explicit(tmp_path, rng):
    from tests.test_training import _tiny_vqa_setup

    from vlbert_tpu.training.checkpoint import save_checkpoint, smart_resume
    from vlbert_tpu.training.loop import create_train_state

    cfg, m, batch = _tiny_vqa_setup(rng)
    state, tx, _, _lr = create_train_state(m, batch, cfg, steps_per_epoch=4)
    prefix = str(tmp_path / "ck")
    save_checkpoint(prefix, 4, state, extra={"best_val": 0.7})

    cfg.TRAIN.RESUME = True
    cfg.TRAIN.BEGIN_EPOCH = 5
    s2, begin, extra = smart_resume(prefix, state, cfg)
    assert begin == 5 and extra["best_val"] == 0.7

    cfg.TRAIN.RESUME = False
    cfg.TRAIN.AUTO_RESUME = True
    cfg.TRAIN.END_EPOCH = 10
    s3, begin, extra = smart_resume(prefix, state, cfg)
    assert begin == 5


def test_coco_captions_builder(tmp_path):
    from vlbert_tpu.data.datasets.coco_captions import build_coco_captions_db

    caps = {
        "images": [{"id": 1, "width": 100, "height": 80,
                    "file_name": "1.jpg"}],
        "annotations": [{"image_id": 1, "caption": "a cat sits"}],
    }
    inst = {
        "categories": [{"id": 7}, {"id": 12}],
        "annotations": [
            {"image_id": 1, "category_id": 7, "bbox": [10, 10, 30, 20], "id": 1},
            {"image_id": 1, "category_id": 12, "bbox": [50, 5, 20, 40], "id": 2},
        ],
        "images": caps["images"],
    }
    (tmp_path / "caps.json").write_text(json.dumps(caps))
    (tmp_path / "inst.json").write_text(json.dumps(inst))
    db_path, n = build_coco_captions_db(
        str(tmp_path / "caps.json"), str(tmp_path / "inst.json"),
        "images", str(tmp_path / "out"))
    assert n == 1
    row = json.loads(open(db_path).read().splitlines()[0])
    frcnn = json.load(open(tmp_path / "out" / row["frcnn"]))
    assert frcnn["num_boxes"] == 2
    import base64

    classes = np.frombuffer(base64.decodebytes(frcnn["classes"].encode()),
                            np.float32).reshape(2, -1)
    assert classes[0, 1] == 1.0 and classes[1, 2] == 1.0  # contiguous remap


def test_coco_captions_live_dataset(tmp_path):
    """Live COCOCaptionsDataset (ref pretrain/data/datasets/coco_captions.py)
    indexes COCO json directly: one item per image with instance anns,
    xywh->xyxy TO_REMOVE=1 boxes, one-hot contiguous-remap cls scores."""
    from PIL import Image

    from vlbert_tpu.data.datasets.coco_captions import COCOCaptionsDataset
    from vlbert_tpu.data.tokenization import BertTokenizer

    d = tmp_path / "coco"
    os.makedirs(d / "annotations", exist_ok=True)
    os.makedirs(d / "val2017", exist_ok=True)
    Image.fromarray(np.zeros((80, 100, 3), np.uint8)).save(
        d / "val2017" / "1.jpg")
    caps = {
        "images": [{"id": 1, "width": 100, "height": 80,
                    "file_name": "1.jpg"},
                   {"id": 2, "width": 50, "height": 50,
                    "file_name": "2.jpg"}],
        "annotations": [{"image_id": 1, "caption": "a cat sits there"},
                        {"image_id": 1, "caption": "second caption"}],
    }
    inst = {
        "categories": [{"id": 12}, {"id": 7}],   # unsorted on purpose
        "images": caps["images"],
        "annotations": [
            {"image_id": 1, "category_id": 7, "bbox": [10, 10, 30, 20],
             "id": 1},
            {"image_id": 1, "category_id": 12, "bbox": [50, 5, 20, 40],
             "id": 2},
        ],  # image 2 has no instances -> filtered (ref :92-98)
    }
    (d / "annotations" / "captions_val2017.json").write_text(json.dumps(caps))
    (d / "annotations" / "instances_val2017.json").write_text(json.dumps(inst))

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "cat", "sits", "there", "second", "caption"]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab))
    tok = BertTokenizer(str(vf))

    ds = COCOCaptionsDataset(
        ann_file="", image_set="val", root_path=str(tmp_path),
        data_path=str(d), tokenizer=tok, add_image_as_a_box=True,
        with_rel_task=False, with_mvrc_task=True, seq_len=32)
    assert len(ds) == 1                       # image 2 filtered out
    row = ds.database[0]
    # xywh -> xyxy with TO_REMOVE=1 (ref :139-142)
    np.testing.assert_allclose(row["boxes"],
                               [[10, 10, 39, 29], [50, 5, 69, 44]])
    # contiguous remap over SORTED ids: 7 -> 1, 12 -> 2 (ref :100-104)
    assert row["cls_scores"][0, 1] == 1.0 and row["cls_scores"][1, 2] == 1.0
    assert row["caption"] == "a cat sits there"

    s = ds[0]
    assert s["boxes"].shape[0] == 3           # image box + 2 instances
    assert s["image"].shape[2] == 3
    assert s["mvrc_labels"].shape[1] == 81
    assert int(s["relationship_label"]) == 1  # rel negatives unsupported
