#!/usr/bin/env python
"""Five-minute smoke demo: synthesize a tiny VCR dataset, fine-tune a tiny
VL-BERT end-to-end (ResNet-18 + 1-layer encoder) through the REAL CLI entry
point, run validation + checkpointing, and produce a leaderboard CSV.

No downloads needed; runs on CPU, a virtual CPU mesh, or a real TPU:

    python tools/demo_train.py                 # current JAX platform
    VLBERT_TPU_NUM_CPU_DEVICES=4 python tools/demo_train.py   # 4-dev mesh

This drives exactly the production path a real experiment uses
(`vcr/train_end2end.py --cfg ... --do-test`), just with synthetic data and
a small model, so it doubles as an install check.
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "cat", "sat", "on", "mat", "a", "dog", "ran",
         "un", "##aff", "##able", "##ing", "run", "runn", "##er",
         "person", "left", "right", "and", "casey", "riley", "jessie",
         "what", "is", "doing", "?", ",", "!", "red", "blue", "wearing",
         "hat", "shirt", "why", "because", "it", "cold"]


def write_fixture(root, n=8):
    from PIL import Image

    d = os.path.join(root, "vcr")
    os.makedirs(os.path.join(d, "img"), exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        Image.fromarray((rng.uniform(size=(60, 80, 3)) * 255)
                        .astype(np.uint8)).save(
            os.path.join(d, "img", f"{i}.jpg"))
        with open(os.path.join(d, f"metadata{i}.json"), "w") as f:
            json.dump({
                "boxes": [[5, 5, 40, 40, 0.9], [30, 10, 70, 50, 0.8]],
                "segms": [[[[5, 5], [40, 5], [40, 40], [5, 40]]],
                          [[[30, 10], [70, 10], [70, 50], [30, 50]]]],
                "width": 80, "height": 60,
            }, f)
        rows.append({
            "annot_id": f"demo-{i}",
            "img_fn": f"img/{i}.jpg",
            "metadata_fn": f"metadata{i}.json",
            "objects": ["person", "dog"],
            "question": ["what", "is", [0], "doing", "?"],
            "answer_choices": [
                [[0], "is", "wearing", "a", "hat"],
                [[0], "ran", "left"],
                ["the", "dog", "ran"],
                [[1], "is", "red"],
            ],
            "answer_label": int(rng.integers(0, 4)),
            "rationale_choices": [["because", "it", "is", "cold"]] * 4,
            "rationale_label": 0,
        })
    with open(os.path.join(d, "train.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    with open(os.path.join(d, "val.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows[: max(n // 2, 2)]))
    vocab_dir = os.path.join(root, "bert")
    os.makedirs(vocab_dir, exist_ok=True)
    with open(os.path.join(vocab_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    return d, vocab_dir


CFG_TEMPLATE = """
RNG_SEED: 1
OUTPUT_PATH: '{out}'
MODULE: ResNetVLBERT
MODEL_PREFIX: 'demo'
LOG_FREQUENT: 1
SCALES:
- 56
- 80
DATASET:
  DATASET: vcr
  TASK: 'Q2A'
  DATASET_PATH: '{data}'
  ROOT_PATH: '{data}'
  TRAIN_ANNOTATION_FILE: 'train.jsonl'
  VAL_ANNOTATION_FILE: 'val.jsonl'
  TEST_ANNOTATION_FILE: 'val.jsonl'
  ADD_IMAGE_AS_A_BOX: true
  ONLY_USE_RELEVANT_DETS: false
  MASK_SIZE: 7
NETWORK:
  IMAGE_NUM_LAYERS: 18
  IMAGE_FEAT_PRECOMPUTED: false
  IMAGE_FINAL_DIM: 32
  IMAGE_SEMANTIC: true
  ENABLE_CNN_REG_LOSS: false
  BERT_MODEL_NAME: '{vocab}'
  CLASSIFIER_TYPE: '2fc'
  CLASSIFIER_HIDDEN_SIZE: 32
  VLBERT:
    hidden_size: 32
    visual_size: 32
    num_hidden_layers: 1
    num_attention_heads: 2
    intermediate_size: 64
    vocab_size: {vocab_size}
    max_position_embeddings: 64
    visual_ln: true
    visual_scale_text_init: 1.0
    visual_scale_object_init: 1.0
    with_pooler: true
TRAIN:
  BATCH_IMAGES: 1
  OPTIMIZER: 'AdamW'
  LR: 0.0001
  LR_SCHEDULE: 'triangle'
  END_EPOCH: 2
  SHUFFLE: true
VAL:
  BATCH_IMAGES: 1
TEST:
  BATCH_IMAGES: 1
TPU:
  MAX_TEXT_LEN: 24
  MAX_BOXES: 4
  COMPUTE_DTYPE: 'float32'
  RNG_IMPL: 'threefry2x32'
"""


def main():
    root = tempfile.mkdtemp(prefix="vlbert_demo_")
    print(f"[demo] synthesizing dataset under {root}")
    data_dir, vocab_dir = write_fixture(root)
    out = os.path.join(root, "out")
    cfg_path = os.path.join(root, "demo.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG_TEMPLATE.format(out=out, data=data_dir, vocab=vocab_dir,
                                    vocab_size=len(VOCAB)))
    cmd = [sys.executable, os.path.join(REPO, "vcr", "train_end2end.py"),
           "--cfg", cfg_path, "--model-dir", out, "--do-test"]
    print("[demo] running:", " ".join(cmd))
    rc = subprocess.run(cmd, cwd=root).returncode
    if rc != 0:
        raise SystemExit(f"[demo] FAILED (exit {rc})")
    ckpt_dir = os.path.join(out, "vcr_train")
    print("[demo] outputs:", sorted(os.listdir(ckpt_dir)))
    results = [os.path.join(dp, f) for dp, _, fs in os.walk(root)
               for f in fs if f.endswith(".csv")]
    print("[demo] leaderboard csv:", results)
    print("[demo] OK — trained 2 epochs, validated, checkpointed, "
          "and produced a Q2A leaderboard file.")


if __name__ == "__main__":
    main()
