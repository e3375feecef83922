"""COCO-captions pretraining db builder.

ref: pretrain/data/datasets/coco_captions.py:89-108 — drives the same three
pretrain tasks from COCO2017 captions+instances json (gt boxes, contiguous
category remap) instead of Conceptual-Captions frcnn files. Here we build
ConceptualCaptions-compatible rows so the existing dataset/collate path is
reused (one scaffolding, parameterized — SURVEY §7.1.1).
"""

from __future__ import annotations

import base64
import json
import os

import numpy as np


def build_coco_captions_db(captions_file, instances_file, image_dir,
                           out_dir, num_classes=81):
    """Produce a jsonl db + per-image frcnn-format json files from COCO
    captions + instances annotations. Boxes are gt instances with one-hot
    class-score rows over the contiguous category remap (ref :89-108)."""
    with open(captions_file) as f:
        caps = json.load(f)
    with open(instances_file) as f:
        inst = json.load(f)

    cat_ids = sorted({c["id"] for c in inst["categories"]})
    cat_remap = {cid: i + 1 for i, cid in enumerate(cat_ids)}  # 0 = bg
    imgs = {i["id"]: i for i in caps["images"]}
    img_anns = {}
    for a in inst["annotations"]:
        img_anns.setdefault(a["image_id"], []).append(a)

    os.makedirs(os.path.join(out_dir, "frcnn"), exist_ok=True)
    rows = []
    for cap in caps["annotations"]:
        img = imgs.get(cap["image_id"])
        if img is None:
            continue
        anns = img_anns.get(cap["image_id"], [])
        if not anns:
            continue
        boxes = np.asarray(
            [[a["bbox"][0], a["bbox"][1],
              a["bbox"][0] + a["bbox"][2] - 1,
              a["bbox"][1] + a["bbox"][3] - 1] for a in anns], np.float32)
        classes = np.zeros((len(anns), num_classes), np.float32)
        for i, a in enumerate(anns):
            classes[i, cat_remap.get(a["category_id"], 0) % num_classes] = 1.0
        frcnn_fn = f"frcnn/{cap['image_id']}.json"
        frcnn_path = os.path.join(out_dir, frcnn_fn)
        if not os.path.exists(frcnn_path):
            with open(frcnn_path, "w") as f:
                json.dump({
                    "image_w": img["width"], "image_h": img["height"],
                    "num_boxes": len(anns),
                    "boxes": base64.encodebytes(boxes.tobytes()).decode(),
                    "classes": base64.encodebytes(classes.tobytes()).decode(),
                }, f)
        rows.append({
            "image": os.path.join(image_dir, img["file_name"]),
            "frcnn": frcnn_fn,
            "caption": cap["caption"],
        })

    db_path = os.path.join(out_dir, "train_frcnn.json")
    with open(db_path, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    return db_path, len(rows)
