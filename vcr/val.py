"""VCR paired-model local validation: Q->A, QA->R, joint Q->AR.

ref: vcr/val.py:69-210 — builds a Q2A model and a QA2R model from two
configs/checkpoints, runs both over val, caches predictions, and reports the
three accuracies (joint = both correct).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def predict(config, ckpt, cache_path):
    from vlbert_tpu.engine.test import run_inference

    if cache_path and os.path.exists(cache_path):
        return np.load(cache_path)
    results, loader = run_inference(config, "vcr", ckpt, mode="val")
    logits = np.concatenate(
        [np.asarray(o["label_logits"], np.float32) for o in results], 0)
    n = len(loader.dataset)
    logits = logits[:n]
    if cache_path:
        np.save(cache_path, logits)
    return logits


def main():
    parser = argparse.ArgumentParser("VCR paired-model validation")
    parser.add_argument("--a-cfg", required=True)
    parser.add_argument("--r-cfg", required=True)
    parser.add_argument("--a-ckpt", required=True)
    parser.add_argument("--r-ckpt", required=True)
    parser.add_argument("--cache-dir", default="")
    args = parser.parse_args()

    from vlbert_tpu.utils.config import load_config

    a_cfg = load_config("vcr", args.a_cfg)
    a_cfg.DATASET.TASK = "Q2A"
    r_cfg = load_config("vcr", args.r_cfg)
    r_cfg.DATASET.TASK = "QA2R"

    a_cache = os.path.join(args.cache_dir, "a_pred.npy") if args.cache_dir else ""
    r_cache = os.path.join(args.cache_dir, "r_pred.npy") if args.cache_dir else ""
    a_logits = predict(a_cfg, args.a_ckpt, a_cache)
    r_logits = predict(r_cfg, args.r_ckpt, r_cache)

    from vlbert_tpu.data.datasets.vcr import load_jsonl

    db = load_jsonl(a_cfg.DATASET.VAL_ANNOTATION_FILE
                    if os.path.isabs(a_cfg.DATASET.VAL_ANNOTATION_FILE)
                    else os.path.join(a_cfg.DATASET.DATASET_PATH,
                                      a_cfg.DATASET.VAL_ANNOTATION_FILE))
    a_label = np.asarray([r["answer_label"] for r in db])
    r_label = np.asarray([r["rationale_label"] for r in db])

    a_pred = a_logits.argmax(1)
    r_pred = r_logits.argmax(1)
    a_acc = float((a_pred == a_label).mean())
    r_acc = float((r_pred == r_label).mean())
    joint = float(((a_pred == a_label) & (r_pred == r_label)).mean())
    print(f"Q->A: {a_acc:.4f}  QA->R: {r_acc:.4f}  Q->AR: {joint:.4f}")
    return a_acc, r_acc, joint


if __name__ == "__main__":
    main()
