#!/usr/bin/env python
"""RefCOCO+ single-image grounding demo (BASELINE.json tracked config:
"RefCOCO+ VL-BERT-base inference on one val image with ground-truth boxes",
ref refcoco/test.py + refcoco/function/test.py).

Runs the FULL end-to-end serving path on one image: eval transform
(Resize/Normalize/FixPadding exactly as the test entrypoint), ResNet-101 +
ROIAlign backbone, [CLS] expr [SEP] text, per-candidate grounding logits,
argmax box rescaled to original coords. No downloads needed: with no
arguments it uses a synthetic image + boxes and a random-init model at the
config's real size (pass --tiny for a seconds-fast CPU check). Point
--image/--boxes/--expr/--ckpt at real data to ground a real query:

    python tools/demo_refcoco.py --tiny                       # smoke check
    python tools/demo_refcoco.py                              # base size
    python tools/demo_refcoco.py --ckpt converted.model \\
        --image val_0001.jpg --boxes boxes.json --expr "woman on the left"

Prints one JSON object: predicted box (original coords), per-candidate
scores, and single-query latency.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


class _DemoTok:
    """Hash tokenizer for random-weight demos (no vocab download)."""

    cls_id, sep_id, mask_id = 2, 3, 4

    def tokenize(self, text):
        return text.lower().split()

    def convert_tokens_to_ids(self, toks):
        return [(hash(t) % 20000) + 10 for t in toks]


def main():
    ap = argparse.ArgumentParser()
    # default matches BASELINE's tracked config: one val image with
    # GROUND-TRUTH boxes (ADVICE r3 — detected-regions was a mismatch)
    ap.add_argument("--cfg", default=os.path.join(
        REPO, "cfgs/refcoco/base_gt_boxes_4x16G.yaml"))
    ap.add_argument("--ckpt", default=None,
                    help="converted .model checkpoint (else random init)")
    ap.add_argument("--image", default=None, help="image file (else synth)")
    ap.add_argument("--boxes", default=None,
                    help="json file: [[x1,y1,x2,y2], ...] candidate boxes")
    ap.add_argument("--expr", default="the large object on the left")
    ap.add_argument("--tiny", action="store_true",
                    help="1-layer/32-hidden model + small image: CPU smoke")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vlbert_tpu.data.transforms import build_transforms
    from vlbert_tpu.engine.serve import RefCOCOServer
    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.utils.config import load_config

    cfg = load_config("refcoco", args.cfg)
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = False
    if args.tiny:
        v = cfg.NETWORK.VLBERT
        v.hidden_size = 32; v.visual_size = 32; v.num_hidden_layers = 1
        v.num_attention_heads = 2; v.intermediate_size = 64
        cfg.NETWORK.IMAGE_FINAL_DIM = 32
        cfg.NETWORK.IMAGE_NUM_LAYERS = 50
        cfg.SCALES = (64, 96)

    rng = np.random.default_rng(0)
    if args.image:
        from PIL import Image
        image = np.asarray(Image.open(args.image).convert("RGB"))
    else:
        hw = (120, 160) if args.tiny else (480, 640)
        image = rng.integers(0, 256, hw + (3,)).astype(np.uint8)
    h0, w0 = image.shape[:2]
    if args.boxes:
        with open(args.boxes) as f:
            boxes = np.asarray(json.load(f), np.float32)
    else:
        boxes = np.stack([
            np.asarray([w0 * .05, h0 * .1, w0 * .45, h0 * .8], np.float32),
            np.asarray([w0 * .5, h0 * .15, w0 * .95, h0 * .85], np.float32),
            np.asarray([w0 * .3, h0 * .3, w0 * .7, h0 * .7], np.float32)])

    tok = _DemoTok()
    if args.ckpt:  # real checkpoints need the real vocab
        from vlbert_tpu.data.tokenization import BertTokenizer
        tok = BertTokenizer.from_pretrained(cfg.NETWORK.BERT_MODEL_NAME)

    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    model = build_module(cfg, "refcoco", dtype=dtype)
    srv = RefCOCOServer(model, None, tok,
                        transform=build_transforms(cfg, "test"),
                        max_text=24, max_boxes=len(boxes) + 1)
    batch = srv.preprocess(image, boxes, args.expr)
    params = jax.jit(lambda r: model.init(r, *batch, train=False))(
        {"params": jax.random.PRNGKey(0)})
    if args.ckpt:  # same content-sniffing loader the test entrypoint uses
        from vlbert_tpu.engine.test import _load_params
        params = _load_params(cfg, params, args.ckpt)
    srv.params = params

    t0 = time.perf_counter()
    r = srv.query(image, boxes, args.expr)         # includes compile
    compile_and_query_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = srv.query(image, boxes, args.expr)
    query_s = time.perf_counter() - t0

    print(json.dumps({
        "expr": args.expr,
        "image_hw": [h0, w0],
        "pred_box_xyxy": [round(float(x), 2) for x in r["box"]],
        "best_candidate": r["best_index"],
        "candidate_scores": [round(float(s), 4)
                             for s in r["candidate_scores"]],
        "latency_ms": round(query_s * 1e3, 2),
        "first_call_ms": round(compile_and_query_s * 1e3, 1),
        "weights": "checkpoint" if args.ckpt else "random-init",
        "backend": jax.default_backend(),
    }, indent=1))


if __name__ == "__main__":
    main()
