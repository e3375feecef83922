"""End-to-end driver tests: train_net over a synthetic VQA fixture, config
YAML surface, inference driver."""

import base64
import json
import os
import types

import numpy as np
import pytest

from vlbert_tpu.utils.config import load_config, default_config

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "what", "is", "the", "cat", "doing", "?", "red", "blue", "dog"]


def _write_vqa_fixture(tmp_path, n=8, feat_dim=32):
    d = tmp_path / "vqa"
    os.makedirs(d / "boxes", exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        nb = 4
        boxes = rng.uniform(0, 50, (nb, 4)).astype(np.float32)
        boxes[:, 2:] += boxes[:, :2]
        data = {
            "num_boxes": nb,
            "boxes": base64.encodebytes(boxes.tobytes()).decode(),
            "features": base64.encodebytes(
                rng.normal(size=(nb, feat_dim)).astype(np.float32).tobytes()).decode(),
        }
        with open(d / "boxes" / f"{i}.json", "w") as f:
            json.dump(data, f)
        rows.append({
            "question_id": i, "image_id": i,
            "question": "what is the cat doing ?",
            "image_fn": f"img/{i}.jpg", "box_fn": f"boxes/{i}.json",
            "width": 100, "height": 80,
            "answers": ["red"] * 7 + ["blue"] * 3,
        })
    with open(d / "train.jsonl", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    with open(d / "val.jsonl", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows[:4]))
    (d / "answers.txt").write_text("<unk>\nred\nblue\ncat\n")
    vocab_dir = tmp_path / "bert"
    os.makedirs(vocab_dir, exist_ok=True)
    (vocab_dir / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    return str(d), str(vocab_dir)


def _tiny_vqa_cfg(tmp_path, data_dir, vocab_dir, feat_dim=32):
    cfg = default_config("vqa")
    cfg.MODULE = "ResNetVLBERT"
    cfg.OUTPUT_PATH = str(tmp_path / "out")
    cfg.MODEL_PREFIX = "tiny"
    cfg.LOG_FREQUENT = 1
    v = cfg.NETWORK.VLBERT
    v.hidden_size = 32; v.visual_size = 32; v.num_hidden_layers = 1
    v.num_attention_heads = 2; v.intermediate_size = 64
    v.vocab_size = len(VOCAB); v.max_position_embeddings = 32
    v.visual_ln = True
    v.visual_scale_text_init = 1.0; v.visual_scale_object_init = 1.0
    cfg.NETWORK.IMAGE_FINAL_DIM = 32
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    cfg.NETWORK.BERT_MODEL_NAME = vocab_dir
    cfg.NETWORK.CLASSIFIER_TYPE = "1fc"
    cfg.DATASET.DATASET = "vqa"
    cfg.DATASET.DATASET_PATH = data_dir
    cfg.DATASET.ROOT_PATH = data_dir
    cfg.DATASET.TRAIN_ANNOTATION_FILE = "train.jsonl"
    cfg.DATASET.VAL_ANNOTATION_FILE = "val.jsonl"
    cfg.DATASET.TEST_ANNOTATION_FILE = "val.jsonl"
    cfg.DATASET.ANSWER_VOCAB_FILE = os.path.join(data_dir, "answers.txt")
    cfg.DATASET.ANSWER_VOCAB_SIZE = 4
    cfg.TRAIN.BATCH_IMAGES = 1   # per-device; x8 virtual devices = 8/host
    cfg.TRAIN.OPTIMIZER = "AdamW"
    cfg.TRAIN.LR = 1e-5
    cfg.TRAIN.END_EPOCH = 2
    cfg.TRAIN.LR_SCHEDULE = "triangle"
    cfg.VAL.BATCH_IMAGES = 1
    cfg.TEST.BATCH_IMAGES = 1
    cfg.TPU.MAX_TEXT_LEN = 16
    cfg.TPU.MAX_BOXES = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # precomputed feature dim of the fixture
    cfg._fixture_feat_dim = feat_dim
    return cfg


def test_train_net_end_to_end(tmp_path, monkeypatch):
    """Full driver: config -> loaders -> train 2 epochs -> checkpoints ->
    validation metrics -> auto-resume."""
    import vlbert_tpu.data.build as build_mod

    data_dir, vocab_dir = _write_vqa_fixture(tmp_path)
    cfg = _tiny_vqa_cfg(tmp_path, data_dir, vocab_dir)

    # fixture features are 32-d, not 2048: patch the collate dim
    orig = build_mod.make_vqa_collate

    def patched(tokenizer, max_text, max_boxes, precomputed_dim=2048,
                test_mode=False):
        return orig(tokenizer, max_text, max_boxes, precomputed_dim=32,
                    test_mode=test_mode)

    monkeypatch.setattr(build_mod, "make_vqa_collate", patched)

    from vlbert_tpu.engine.train import train_net

    args = types.SimpleNamespace(model_dir=str(tmp_path / "out"), log_dir=None)
    state = train_net(args, cfg, "vqa")
    assert int(state.step) == 2 * 1  # 2 epochs x 1 batch (8 samples / 8)

    out_dir = os.path.join(cfg.OUTPUT_PATH, "vqa_train")
    ckpts = [f for f in os.listdir(out_dir) if f.endswith(".model")]
    assert "tiny-0001.model" in ckpts and "tiny-best.model" in ckpts

    # auto-resume picks up after last epoch
    state2 = train_net(args, cfg, "vqa")
    assert int(state2.step) == int(state.step)  # nothing left to train


def test_all_reference_cfgs_load():
    import glob

    files = sorted(glob.glob(os.path.join(
        os.path.dirname(__file__), "..", "cfgs", "*", "*.yaml")))
    assert len(files) >= 16
    for f in files:
        task = os.path.basename(os.path.dirname(f))
        cfg = load_config(task, f)
        assert cfg.MODULE
