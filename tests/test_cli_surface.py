"""Public CLI surface: run the actual task entry script as a subprocess with
a YAML experiment file over a synthetic VCR fixture (argparse -> strict YAML
-> train_net -> checkpoints)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "what", "is", "the", "person", "doing", "?", "and",
         "wearing", "hat", "dog", "ran", "left", "red", "because",
         "it", "cold", "casey", "riley", "jessie", "jackie", "avery",
         "jaime", "peyton", "kerry", "jody", "kendall", "frankie",
         "pat", "quinn"]


def _write_vcr_fixture(tmp_path, n=8):
    from PIL import Image

    d = tmp_path / "vcr"
    os.makedirs(d / "img", exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        Image.fromarray((rng.uniform(size=(60, 80, 3)) * 255)
                        .astype(np.uint8)).save(d / "img" / f"{i}.jpg")
        metadata = {
            "boxes": [[5, 5, 40, 40, 0.9], [30, 10, 70, 50, 0.8]],
            "segms": [[[[5, 5], [40, 5], [40, 40], [5, 40]]],
                      [[[30, 10], [70, 10], [70, 50], [30, 50]]]],
            "width": 80, "height": 60,
        }
        with open(d / f"metadata{i}.json", "w") as f:
            json.dump(metadata, f)
        rows.append({
            "annot_id": f"val-{i}",
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
    with open(d / "train.jsonl", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    with open(d / "val.jsonl", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows[:4]))
    vocab_dir = tmp_path / "bert"
    os.makedirs(vocab_dir, exist_ok=True)
    (vocab_dir / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    return str(d), str(vocab_dir)


def test_vcr_train_end2end_cli(tmp_path):
    data_dir, vocab_dir = _write_vcr_fixture(tmp_path)
    cfg_yaml = f"""
RNG_SEED: 1
OUTPUT_PATH: '{tmp_path}/out'
MODULE: ResNetVLBERT
MODEL_PREFIX: 'cli'
LOG_FREQUENT: 1
SCALES:
- 56
- 80
DATASET:
  DATASET: vcr
  TASK: 'Q2A'
  DATASET_PATH: '{data_dir}'
  ROOT_PATH: '{data_dir}'
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
  BERT_MODEL_NAME: '{vocab_dir}'
  CLASSIFIER_TYPE: '2fc'
  CLASSIFIER_HIDDEN_SIZE: 32
  VLBERT:
    hidden_size: 32
    visual_size: 32
    num_hidden_layers: 1
    num_attention_heads: 2
    intermediate_size: 64
    vocab_size: {len(VOCAB)}
    max_position_embeddings: 64
    visual_ln: true
    visual_scale_text_init: 1.0
    visual_scale_object_init: 1.0
    with_pooler: true
TRAIN:
  BATCH_IMAGES: 1
  OPTIMIZER: 'AdamW'
  LR: 0.00001
  LR_SCHEDULE: 'triangle'
  END_EPOCH: 1
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
  COMPILE_CACHE_DIR: ''
"""
    cfg_path = tmp_path / "exp.yaml"
    cfg_path.write_text(cfg_yaml)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               VLBERT_TPU_NUM_CPU_DEVICES="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "vcr", "train_end2end.py"),
         "--cfg", str(cfg_path), "--model-dir", str(tmp_path / "out")],
        capture_output=True, text=True, env=env, timeout=540, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-3000:]
    out_dir = tmp_path / "out" / "vcr_train"
    ckpts = [f for f in os.listdir(out_dir) if f.endswith(".model")]
    assert "cli-0000.model" in ckpts, (ckpts, proc.stderr[-2000:])
    assert "PROGRESS:" in proc.stdout


def test_vcr_qa2r_cli(tmp_path):
    """QA2R task through the CLI entry (query = Q + gold answer,
    choices = rationales)."""
    data_dir, vocab_dir = _write_vcr_fixture(tmp_path, n=8)
    cfg_path = tmp_path / "exp.yaml"
    base = open(os.path.join(os.path.dirname(__file__), "..",
                             "cfgs", "vcr", "base_q2a_4x16G_fp32.yaml"))
    base.close()
    cfg_yaml = f"""
RNG_SEED: 1
OUTPUT_PATH: '{tmp_path}/out'
MODULE: ResNetVLBERT
MODEL_PREFIX: 'qa2r'
LOG_FREQUENT: 1
SCALES:
- 56
- 80
DATASET:
  DATASET: vcr
  TASK: 'QA2R'
  DATASET_PATH: '{data_dir}'
  ROOT_PATH: '{data_dir}'
  TRAIN_ANNOTATION_FILE: 'train.jsonl'
  VAL_ANNOTATION_FILE: 'val.jsonl'
  TEST_ANNOTATION_FILE: 'val.jsonl'
  ONLY_USE_RELEVANT_DETS: false
  MASK_SIZE: 7
NETWORK:
  IMAGE_NUM_LAYERS: 18
  IMAGE_FINAL_DIM: 32
  IMAGE_SEMANTIC: true
  ENABLE_CNN_REG_LOSS: false
  BERT_MODEL_NAME: '{vocab_dir}'
  CLASSIFIER_HIDDEN_SIZE: 32
  VLBERT:
    hidden_size: 32
    visual_size: 32
    num_hidden_layers: 1
    num_attention_heads: 2
    intermediate_size: 64
    vocab_size: {len(VOCAB)}
    max_position_embeddings: 64
    visual_ln: true
    visual_scale_text_init: 1.0
    visual_scale_object_init: 1.0
    with_pooler: true
TRAIN:
  BATCH_IMAGES: 2
  OPTIMIZER: 'AdamW'
  LR: 0.00001
  LR_SCHEDULE: 'triangle'
  END_EPOCH: 1
VAL:
  BATCH_IMAGES: 2
TEST:
  BATCH_IMAGES: 2
TPU:
  MAX_TEXT_LEN: 32
  MAX_BOXES: 4
  COMPUTE_DTYPE: 'float32'
  RNG_IMPL: 'threefry2x32'
  COMPILE_CACHE_DIR: ''
"""
    cfg_path.write_text(cfg_yaml)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               VLBERT_TPU_NUM_CPU_DEVICES="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "vcr", "train_end2end.py"),
         "--cfg", str(cfg_path), "--model-dir", str(tmp_path / "out")],
        capture_output=True, text=True, env=env, timeout=540, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(tmp_path / "out" / "vcr_train" / "qa2r-0000.model")
