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


def test_train_net_with_grad_accumulation(tmp_path, monkeypatch):
    """GRAD_ACCUMULATE_STEPS > 1 through the full driver: loader emits
    [accum*micro] flat batches, fit() reshapes and shards on the micro dim."""
    import vlbert_tpu.data.build as build_mod

    data_dir, vocab_dir = _write_vqa_fixture(tmp_path, n=16)
    cfg = _tiny_vqa_cfg(tmp_path, data_dir, vocab_dir)
    cfg.TRAIN.GRAD_ACCUMULATE_STEPS = 2
    cfg.TRAIN.END_EPOCH = 1

    orig = build_mod.make_vqa_collate

    def patched(tokenizer, max_text, max_boxes, precomputed_dim=2048,
                test_mode=False):
        return orig(tokenizer, max_text, max_boxes, precomputed_dim=32,
                    test_mode=test_mode)

    monkeypatch.setattr(build_mod, "make_vqa_collate", patched)

    from vlbert_tpu.engine.train import train_net

    args = types.SimpleNamespace(model_dir=str(tmp_path / "out"), log_dir=None)
    state = train_net(args, cfg, "vqa")
    # 16 samples / (1 img * 8 dev * 2 accum) = 1 optimizer step
    assert int(state.step) == 1


def test_train_net_donate_state_off(tmp_path):
    """TPU.DONATE_STATE=false runs the full driver without buffer donation
    (the measured escape hatch for the masked-Adam x donation small-batch
    interaction; see utils/config.py)."""
    from vlbert_tpu.engine.train import train_net

    data_dir, vocab_dir = _write_vqa_fixture(tmp_path, n=8)
    cfg = _tiny_vqa_cfg(tmp_path, data_dir, vocab_dir)
    cfg.TRAIN.END_EPOCH = 1
    cfg.TPU.DONATE_STATE = False
    args = types.SimpleNamespace(model_dir=str(tmp_path / "out"), log_dir=None)
    state = train_net(args, cfg, "vqa")
    assert int(state.step) >= 1


def test_train_net_fsdp_partition_mode(tmp_path):
    """TPU.PARTITION_MODE=fsdp through the full driver: state sharded over
    the 8-device data axis, checkpoint saved from sharded arrays, and
    AUTO_RESUME restores into the sharded layout."""
    from vlbert_tpu.engine.train import train_net

    data_dir, vocab_dir = _write_vqa_fixture(tmp_path, n=8)
    cfg = _tiny_vqa_cfg(tmp_path, data_dir, vocab_dir)
    cfg.TRAIN.END_EPOCH = 1
    cfg.TPU.PARTITION_MODE = "fsdp"
    args = types.SimpleNamespace(model_dir=str(tmp_path / "out"), log_dir=None)
    state = train_net(args, cfg, "vqa")
    assert int(state.step) >= 1
    # resume from the sharded-state checkpoint
    cfg.TRAIN.END_EPOCH = 2
    state2 = train_net(args, cfg, "vqa")
    assert int(state2.step) > int(state.step)


def test_train_net_multitask_pretrain(tmp_path):
    """Multitask pretrain driver: CC + GeneralCorpus zipped loaders through
    train_net (list-DATASET config)."""
    import types as _types

    from tests.test_data_pipeline import VOCAB as TOK_VOCAB, _write_cc_fixture
    from vlbert_tpu.data.tokenization import BertTokenizer
    from vlbert_tpu.engine.train import train_net
    from vlbert_tpu.utils.config import default_config

    vocab_dir = tmp_path / "bert"
    os.makedirs(vocab_dir, exist_ok=True)
    (vocab_dir / "vocab.txt").write_text("\n".join(TOK_VOCAB) + "\n")
    tok = BertTokenizer(str(vocab_dir / "vocab.txt"))
    cc_dir = _write_cc_fixture(tmp_path, tok, n=16)
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(["the cat sat on the mat"] * 32))

    cfg = default_config("pretrain")
    cfg.MODULE = "ResNetVLBERTForPretrainingMultitask"
    cfg.OUTPUT_PATH = str(tmp_path / "out")
    cfg.MODEL_PREFIX = "tiny"
    v = cfg.NETWORK.VLBERT
    v.hidden_size = 32; v.visual_size = 32; v.num_hidden_layers = 1
    v.num_attention_heads = 2; v.intermediate_size = 64
    v.vocab_size = len(TOK_VOCAB); v.max_position_embeddings = 48
    v.visual_ln = True; v.visual_scale_text_init = 1.0
    v.visual_scale_object_init = 1.0; v.with_pooler = True
    v.visual_region_classes = 7
    cfg.NETWORK.IMAGE_FINAL_DIM = 32
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    cfg.NETWORK.WITH_REL_LOSS = True
    cfg.NETWORK.BERT_MODEL_NAME = str(vocab_dir)
    ds_cc = cfg.DATASET.clone()
    ds_cc.DATASET = "conceptual_captions"
    ds_cc.DATASET_PATH = cc_dir
    ds_cc.ROOT_PATH = str(tmp_path)
    ds_cc.TRAIN_IMAGE_SET = "train"
    ds_cc.TRAIN_ANNOTATION_FILE = "train_frcnn.json"
    ds_cc.SEQ_LEN = 24
    ds_cc.ADD_IMAGE_AS_A_BOX = True
    ds_corp = cfg.DATASET.clone()
    ds_corp.DATASET = "general_corpus"
    ds_corp.TRAIN_ANNOTATION_FILE = str(corpus)
    ds_corp.SEQ_LEN = 24
    ds_corp.MIN_SEQ_LEN = 4
    cfg.DATASET = [ds_cc, ds_corp]
    cfg.TRAIN.BATCH_IMAGES = 2     # x8 devices = 16/host
    cfg.TRAIN.OPTIMIZER = "AdamW"
    cfg.TRAIN.LR = 1e-5
    cfg.TRAIN.END_EPOCH = 1
    cfg.TRAIN.LR_SCHEDULE = "triangle"
    cfg.TPU.MAX_TEXT_LEN = 24
    cfg.TPU.MAX_BOXES = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"

    # fixture features are 32-d: monkeypatch-free via build kwargs is not
    # plumbed; patch the collate dim directly
    import vlbert_tpu.data.build as build_mod

    orig = build_mod.make_pretrain_collate
    build_mod.make_pretrain_collate = (
        lambda mt, mb, nc, image_size=None, precomputed_dim=0:
        orig(mt, mb, nc, precomputed_dim=32))
    try:
        import vlbert_tpu.models.task_modules as tm

        orig_build = tm.build_module
        tm.build_module = lambda c, t, **kw: orig_build(
            c, t, **{**kw, "mask_visual_feat_dim": 32})
        import vlbert_tpu.engine.train as etrain

        etrain_build = etrain.build_module
        etrain.build_module = tm.build_module
        args = _types.SimpleNamespace(model_dir=str(tmp_path / "out"),
                                      log_dir=None)
        state = train_net(args, cfg, "pretrain")
        assert int(state.step) == 1    # 16 samples / 16 per batch
    finally:
        build_mod.make_pretrain_collate = orig
        tm.build_module = orig_build
        etrain.build_module = etrain_build


def test_test_net_vcr_qa2r_conditioned_csv(tmp_path):
    """QA2R leaderboard test: 4 answer-conditioned passes -> 16-column csv
    ``rationale_conditioned_on_a{i}_{j}`` (ref vcr/function/test.py:101-135),
    with conditioned probabilities differing across answers."""
    import csv as _csv

    import jax
    import jax.numpy as jnp

    from tests.test_data_pipeline import (VOCAB as TOK_VOCAB,
                                          _write_vcr_fixture)
    from vlbert_tpu.data.tokenization import BertTokenizer
    from vlbert_tpu.engine.test import test_net_vcr
    from vlbert_tpu.training import checkpoint as ckpt_lib

    data_dir = _write_vcr_fixture(tmp_path, name="vcrtest", test_mode=True)
    vocab_dir = tmp_path / "bert"
    os.makedirs(vocab_dir, exist_ok=True)
    (vocab_dir / "vocab.txt").write_text("\n".join(TOK_VOCAB) + "\n")

    cfg = default_config("vcr")
    cfg.MODULE = "ResNetVLBERT"
    cfg.DATASET.DATASET = "vcr"
    cfg.DATASET.TASK = "QA2R"
    cfg.DATASET.DATASET_PATH = str(data_dir)
    cfg.DATASET.ROOT_PATH = str(tmp_path)
    cfg.DATASET.TEST_ANNOTATION_FILE = "ann.jsonl"
    cfg.DATASET.TEST_IMAGE_SET = "test"
    cfg.DATASET.MASK_SIZE = 7
    cfg.NETWORK.BERT_MODEL_NAME = str(vocab_dir)
    v = cfg.NETWORK.VLBERT
    v.hidden_size = 32; v.visual_size = 32; v.num_hidden_layers = 1
    v.num_attention_heads = 2; v.intermediate_size = 64
    v.vocab_size = len(BertTokenizer(str(vocab_dir / "vocab.txt")).vocab)
    v.max_position_embeddings = 64; v.visual_ln = True
    v.visual_scale_text_init = 1.0; v.visual_scale_object_init = 1.0
    cfg.NETWORK.IMAGE_FINAL_DIM = 32
    cfg.NETWORK.IMAGE_NUM_LAYERS = 18
    cfg.NETWORK.ENABLE_CNN_REG_LOSS = False
    cfg.NETWORK.CLASSIFIER_HIDDEN_SIZE = 32
    cfg.SCALES = [32, 48]
    cfg.TEST.BATCH_IMAGES = 1
    cfg.TPU.MAX_TEXT_LEN = 24
    cfg.TPU.MAX_BOXES = 6
    cfg.TPU.COMPUTE_DTYPE = "float32"

    # native checkpoint from a fresh init (the driver chain under test is
    # load -> 4 conditioned passes -> csv, not training)
    from vlbert_tpu.data.build import make_dataloader
    from vlbert_tpu.engine.test import _slice_conditioned
    from vlbert_tpu.models.task_modules import build_module

    model = build_module(cfg, "vcr", dtype=jnp.float32)
    loader = make_dataloader(cfg, "vcr", "test",
                             BertTokenizer(str(vocab_dir / "vocab.txt")))
    sample = next(iter(loader))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           *_slice_conditioned(sample, 0), train=False)
    state = types.SimpleNamespace(params=variables, opt_state={},
                                  step=jnp.zeros((), jnp.int32))
    ckpt = ckpt_lib.save_checkpoint(str(tmp_path / "tiny"), 0, state)

    out_csv = str(tmp_path / "qa2r_result.csv")
    rows = test_net_vcr(cfg, ckpt, out_csv, mode="test")
    assert len(rows) == 2

    with open(out_csv) as f:
        r = list(_csv.reader(f))
    header, data = r[0], r[1:]
    assert header == ["annot_id"] + [
        f"rationale_conditioned_on_a{i}_{j}"
        for i in range(4) for j in range(4)]
    assert [d[0] for d in data] == ["val-0", "val-1"]
    probs = np.asarray([[float(x) for x in d[1:]] for d in data])
    # each conditioned block is a softmax over 4 rationales
    blocks = probs.reshape(2, 4, 4)
    assert np.allclose(blocks.sum(-1), 1.0, atol=1e-5)
    # conditioning on different answers must change the distribution
    assert not np.allclose(blocks[0, 0], blocks[0, 1])
    # raw npy saved alongside (ref :118-121)
    assert os.path.exists(str(tmp_path / "qa2r_result.npy"))


def test_test_net_vqa_leaderboard(tmp_path, monkeypatch):
    """Inference driver writes the VQA leaderboard json from a native
    checkpoint (ref vqa/function/test.py:74-81)."""
    import jax
    import vlbert_tpu.data.build as build_mod

    data_dir, vocab_dir = _write_vqa_fixture(tmp_path, n=8)
    cfg = _tiny_vqa_cfg(tmp_path, data_dir, vocab_dir)
    cfg.TRAIN.END_EPOCH = 1

    orig = build_mod.make_vqa_collate

    def patched(tokenizer, max_text, max_boxes, precomputed_dim=2048,
                test_mode=False):
        return orig(tokenizer, max_text, max_boxes, precomputed_dim=32,
                    test_mode=test_mode)

    monkeypatch.setattr(build_mod, "make_vqa_collate", patched)

    from vlbert_tpu.engine.test import test_net_vqa
    from vlbert_tpu.engine.train import train_net

    args = types.SimpleNamespace(model_dir=str(tmp_path / "out"), log_dir=None)
    train_net(args, cfg, "vqa")
    ckpt = os.path.join(cfg.OUTPUT_PATH, "vqa_train", "tiny-best.model")
    assert os.path.exists(ckpt)

    with open(cfg.DATASET.ANSWER_VOCAB_FILE) as f:
        vocab = [l.strip() for l in f if l.strip()]
    out = str(tmp_path / "answers.json")
    answers = test_net_vqa(cfg, ckpt, vocab, out, mode="test")
    assert os.path.exists(out)
    assert len(answers) == 4   # test split = val.jsonl fixture (4 rows)
    assert all("question_id" in a and a["answer"] in vocab for a in answers)


def test_train_net_observability(tmp_path, monkeypatch):
    """Observability parity (ref common/trainer.py:134-176 +
    common/utils/misc.py:40-67): the driver logs a startup parameter table
    and writes grad-norm + per-group-LR TensorBoard scalars at every
    LOG_FREQUENT step."""
    import logging

    import vlbert_tpu.data.build as build_mod

    data_dir, vocab_dir = _write_vqa_fixture(tmp_path)
    cfg = _tiny_vqa_cfg(tmp_path, data_dir, vocab_dir)
    cfg.TRAIN.END_EPOCH = 1
    cfg.TRAIN.LR_MULT = [["classifier", 10.0]]   # a second LR group

    orig = build_mod.make_vqa_collate

    def patched(tokenizer, max_text, max_boxes, precomputed_dim=2048,
                test_mode=False):
        return orig(tokenizer, max_text, max_boxes, precomputed_dim=32,
                    test_mode=test_mode)

    monkeypatch.setattr(build_mod, "make_vqa_collate", patched)

    # recorder in place of torch.utils.tensorboard.SummaryWriter
    scalars = []

    class Recorder:
        def __init__(self, log_dir=None):
            self.log_dir = log_dir

        def add_scalar(self, tag, value, step):
            scalars.append((tag, float(value), int(step)))

        def close(self):
            pass

    import torch.utils.tensorboard as tb

    monkeypatch.setattr(tb, "SummaryWriter", Recorder)

    from vlbert_tpu.engine.train import train_net

    args = types.SimpleNamespace(model_dir=str(tmp_path / "out"),
                                 log_dir=str(tmp_path / "tb"))
    train_net(args, cfg, "vqa")

    tags = {t for t, _, _ in scalars}
    assert "train/loss" in tags
    assert "grad-para/Total-Norm" in tags          # ref trainer.py:146-148
    assert {"LR/Group_0", "LR/Group_1",
            "Initial-LR/Group_0", "Initial-LR/Group_1"} <= tags
    norm = [v for t, v, _ in scalars if t == "grad-para/Total-Norm"]
    assert all(np.isfinite(v) and v > 0 for v in norm)
    lr0 = {v for t, v, _ in scalars if t == "Initial-LR/Group_0"}
    lr1 = {v for t, v, _ in scalars if t == "Initial-LR/Group_1"}
    assert len(lr0) == 1 and len(lr1) == 1
    assert abs(next(iter(lr1)) - 10.0 * next(iter(lr0))) < 1e-12

    # startup parameter table (ref misc.py:40-67) lands in the rank-0 log
    # file (setup_logger's basicConfig(force=True) detaches caplog)
    with open(os.path.join(cfg.OUTPUT_PATH, "vqa_train",
                           "train_rank0.log")) as f:
        text = f.read()
    assert ">> Trainable Parameters:" in text
    assert "# TotalParams:" in text
    assert "word_embeddings" in text
