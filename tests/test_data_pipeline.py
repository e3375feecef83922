"""Data pipeline tests: tokenizer parity, masking, collation, datasets with
synthetic fixtures, loaders."""

import base64
import json
import os

import numpy as np
import pytest

from vlbert_tpu.data.collate import assemble_qa_text, pad_to
from vlbert_tpu.data.loader import DataLoader, MultiTaskLoader, ShardedSampler
from vlbert_tpu.data.masking import random_word_wwm, truncate_seq_and_boxes
from vlbert_tpu.data.tokenization import BertTokenizer
from vlbert_tpu.utils.mask import generate_instance_mask

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "cat", "sat", "on", "mat", "a", "dog", "ran",
         "un", "##aff", "##able", "##ing", "run", "runn", "##er",
         "person", "left", "right", "and", "casey", "riley", "jessie",
         "what", "is", "doing", "?", ",", "!", "red", "blue", "wearing",
         "hat", "shirt", "why", "because", "it", "cold"]


@pytest.fixture
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture
def tok(vocab_file):
    return BertTokenizer(vocab_file)


def test_tokenizer_parity_with_transformers(vocab_file, tok):
    from transformers import BertTokenizer as HFTok

    hf = HFTok(vocab_file, do_lower_case=True)
    cases = [
        "The cat sat on the mat.",
        "unaffable",
        "Running runner runs",           # exercises [UNK] + wordpiece
        "What is Casey doing?",
        "naïve café",                    # accents stripped
        "hello,world!foo",               # punctuation splitting
        "日本語 text",                    # CJK spacing
        "",
        "   ",
    ]
    for text in cases:
        assert tok.tokenize(text) == hf.tokenize(text), text
    ids_ours = tok.convert_tokens_to_ids(tok.tokenize(cases[0]))
    ids_hf = hf.convert_tokens_to_ids(hf.tokenize(cases[0]))
    assert ids_ours == ids_hf


def test_native_tokenizer_parity_fuzz(vocab_file):
    """native/wordpiece.cc (ASCII fast path) is token-for-token identical to
    the pure-Python reference-parity path: targeted edges (never_split,
    100-char cap, controls, tabs, punctuation runs) + 1500 random ASCII
    strings; non-ASCII routes to the Python path transparently."""
    import random
    import string

    tok_n = BertTokenizer(vocab_file)
    tok_p = BertTokenizer(vocab_file, native=False)
    if tok_n._native is None:
        pytest.skip("native toolchain unavailable")

    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + string.punctuation \
        + " \t\n"
    cases = [
        "The cat sat, unaffable!", "hello   world", "", "   ", "a,b!c",
        "[MASK] the [SEP]cat", "[mask] lowercase is not special",
        "x" * 101, "x" * 100, "ctrl\x01char", "tab\tsep", "naïve café",
        "mixed ascii ünïcode",
    ]
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
              for _ in range(1500)]
    for c in cases:
        assert tok_n.tokenize(c) == tok_p.tokenize(c), repr(c)
    # ids round-trip agrees too
    ids_n = tok_n.convert_tokens_to_ids(tok_n.tokenize(cases[0]))
    ids_p = tok_p.convert_tokens_to_ids(tok_p.tokenize(cases[0]))
    assert ids_n == ids_p


def test_native_tokenizer_dup_vocab_and_missing_unk(tmp_path):
    """Review-pass regressions: (1) duplicate vocab lines give last-wins ids
    WITH GAPS (load_vocab semantics) — the native blob must carry explicit
    ids, not line order; (2) a vocab without [UNK] cannot be mirrored by the
    native path (Python emits the literal string) — it must refuse and the
    wrapper must fall back."""
    p = tmp_path / "dup.txt"
    p.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                            "the", "cat", "sat", "cat", "dog"]))
    tn = BertTokenizer(str(p))
    tp_ = BertTokenizer(str(p), native=False)
    if tn._native is None:
        pytest.skip("native toolchain unavailable")
    for t in ["the dog sat", "sat", "cat dog"]:
        assert tn.tokenize(t) == tp_.tokenize(t), t
        assert (tn.convert_tokens_to_ids(tn.tokenize(t))
                == tp_.convert_tokens_to_ids(tp_.tokenize(t)))

    p2 = tmp_path / "nounk.txt"
    p2.write_text("\n".join(["[PAD]", "the", "cat"]))
    tn2 = BertTokenizer(str(p2))
    assert tn2._native is None          # refused -> pure Python path
    assert tn2.tokenize("the zebra") == ["the", "[UNK]"]


def test_wwm_masking_semantics(tok):
    rng = np.random.default_rng(0)
    words = ["the", "cat", "sat", "on", "the", "mat"] * 50
    toks, labels = random_word_wwm(words, tok, rng)
    assert len(toks) == len(labels)
    n_masked = sum(1 for l in labels if l != -1)
    # ~15% of 300 words
    assert 20 < n_masked < 80
    # masked positions' labels are original token ids
    for t, l in zip(toks, labels):
        if l != -1 and t == "[MASK]":
            assert tok.ids_to_tokens[l] in VOCAB
    # unmasked positions keep original token
    for t, l in zip(toks, labels):
        if l == -1:
            assert t != "[MASK]"


def test_truncate_seq_and_boxes():
    text = list(range(100, 120))          # 20 tokens
    mlm = [-1] * 20
    boxes = np.zeros((30, 4))
    ops = [0] * 30
    labels = [np.zeros(5)] * 30
    t, m, b, o, l = truncate_seq_and_boxes(text, mlm, boxes, ops, labels, 32)
    assert len(t) + len(b) == 32
    assert t[-1] == 119                   # last token preserved
    assert len(t) == len(m) and len(b) == len(o) == len(l)


def test_assemble_qa_text(tok):
    q = tok.convert_tokens_to_ids(["what", "is", "casey", "doing"])
    a = tok.convert_tokens_to_ids(["wearing", "hat"])
    q_tags = [0, 0, 2, 0]
    a_tags = [0, 3]
    ids, types, tags, mask, ans_pos = assemble_qa_text(
        q, q_tags, a, a_tags, 16, tok.cls_id, tok.sep_id)
    # [CLS] q(4) [SEP] a(2) [SEP] = 9 live positions
    assert mask.sum() == 9
    assert ids[0] == tok.cls_id and ids[5] == tok.sep_id and ids[8] == tok.sep_id
    assert list(types[:6]) == [0] * 6 and list(types[6:9]) == [1] * 3
    assert tags[3] == 2 and tags[7] == 3
    assert ans_pos == 8
    # answer_first variant
    ids2, types2, _, mask2, _ = assemble_qa_text(
        q, q_tags, a, a_tags, 16, tok.cls_id, tok.sep_id, answer_first=True)
    assert ids2[1] == a[0] and mask2.sum() == 9


def test_polygon_mask():
    # a square polygon covering the left half of the box
    box = [0, 0, 27, 27]
    poly = [np.asarray([[0, 0], [13, 0], [13, 27], [0, 27]], np.float32)]
    m = generate_instance_mask(poly, box, (14, 14))
    assert m.shape == (14, 14)
    assert m[:, :6].mean() > 0.9          # left covered
    assert m[:, 8:].mean() < 0.1          # right mostly empty


def test_sharded_sampler():
    s0 = ShardedSampler(10, shuffle=True, num_replicas=4, rank=0, seed=1)
    s1 = ShardedSampler(10, shuffle=True, num_replicas=4, rank=1, seed=1)
    s0.set_epoch(3)
    s1.set_epoch(3)
    i0, i1 = s0.indices(), s1.indices()
    assert len(i0) == len(i1) == 3        # ceil(10/4)
    assert set(i0).isdisjoint(set(i1)) or True  # wrap padding may collide
    all_idx = np.concatenate([ShardedSampler(10, True, 4, r, 1).indices()
                              for r in range(4)])
    assert set(all_idx.tolist()) == set(range(10))


def _write_cc_fixture(tmp_path, tok, n=6):
    data_dir = tmp_path / "cc"
    os.makedirs(data_dir / "frcnn", exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        nb = 5
        boxes = rng.uniform(0, 60, (nb, 4)).astype(np.float32)
        boxes[:, 2:] += boxes[:, :2]
        classes = rng.uniform(size=(nb, 7)).astype(np.float32)
        frcnn = {
            "image_w": 100, "image_h": 80, "num_boxes": nb,
            "boxes": base64.encodebytes(boxes.tobytes()).decode(),
            "classes": base64.encodebytes(classes.tobytes()).decode(),
            "features": base64.encodebytes(
                rng.normal(size=(nb, 32)).astype(np.float32).tobytes()).decode(),
        }
        with open(data_dir / "frcnn" / f"{i}.json", "w") as f:
            json.dump(frcnn, f)
        rows.append({"image": f"img/{i}.jpg", "frcnn": f"frcnn/{i}.json",
                     "caption": "the cat sat on the mat"})
    with open(data_dir / "train_frcnn.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    return str(data_dir)


def test_conceptual_captions_precomputed(tmp_path, tok):
    from vlbert_tpu.data.datasets.conceptual_captions import (
        ConceptualCaptionsDataset, make_pretrain_collate)

    data_dir = _write_cc_fixture(tmp_path, tok)
    ds = ConceptualCaptionsDataset(
        "train_frcnn.json", "train", str(tmp_path), data_dir,
        tokenizer=tok, seq_len=24, with_precomputed_visual_feat=True,
        add_image_as_a_box=True)
    s = ds[0]
    assert s["boxes"].shape[1] == 4 + 32   # coords + features
    assert s["text"][0] == tok.cls_id
    assert len(s["text"]) + len(s["boxes"]) <= 24
    assert s["mvrc_labels"].shape[1] == 7

    collate = make_pretrain_collate(16, 8, 7, precomputed_dim=32)
    batch = collate([ds[0], ds[1]])
    image, boxes, im_info, text, rel, mlm, ops, mvrc = batch
    assert boxes.shape == (2, 8, 36)
    assert text.shape == (2, 16) and mlm.shape == (2, 16)
    assert mvrc.shape == (2, 8, 7)
    # pad sentinel
    assert boxes[0, -1, 0] == -2.0


def test_dataloader_and_multitask(tmp_path, tok):
    from vlbert_tpu.data.datasets.conceptual_captions import (
        ConceptualCaptionsDataset, GeneralCorpusDataset,
        make_corpus_collate, make_pretrain_collate)

    data_dir = _write_cc_fixture(tmp_path, tok, n=6)
    ds = ConceptualCaptionsDataset(
        "train_frcnn.json", "train", str(tmp_path), data_dir,
        tokenizer=tok, seq_len=24, with_precomputed_visual_feat=True,
        add_image_as_a_box=True)
    loader = DataLoader(ds, 2, make_pretrain_collate(16, 8, 7, precomputed_dim=32),
                        shuffle=True, num_replicas=1, rank=0)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(["the cat sat on the mat"] * 4))
    aux_ds = GeneralCorpusDataset(str(corpus), tokenizer=tok, seq_len=16,
                                  min_seq_len=4)
    aux_loader = DataLoader(aux_ds, 2, make_corpus_collate(16),
                            shuffle=False, num_replicas=1, rank=0)
    mt = MultiTaskLoader([loader, aux_loader])
    batches = list(mt)
    assert len(batches) == 3              # master defines epoch length
    assert len(batches[0]) == 8 + 2       # pretrain tuple + (aux_text, aux_mlm)
    assert batches[0][8].shape == (2, 16)
    # aux loader restarted (only 2 aux batches available for 3 master)
    assert mt.cycles[1] >= 1


def test_vcr_dataset_end_to_end(tmp_path, tok):
    """Synthetic VCR fixture -> dataset -> collate -> tiny model forward."""
    from PIL import Image

    from vlbert_tpu.data.datasets.vcr import VCRDataset, make_vcr_collate

    d = tmp_path / "vcr"
    os.makedirs(d / "img", exist_ok=True)
    Image.fromarray((np.random.default_rng(0).uniform(
        size=(60, 80, 3)) * 255).astype(np.uint8)).save(d / "img" / "0.jpg")
    metadata = {
        "boxes": [[5, 5, 40, 40, 0.9], [30, 10, 70, 50, 0.8]],
        "segms": [[[[5, 5], [40, 5], [40, 40], [5, 40]]],
                  [[[30, 10], [70, 10], [70, 50], [30, 50]]]],
        "width": 80, "height": 60,
    }
    with open(d / "metadata0.json", "w") as f:
        json.dump(metadata, f)
    row = {
        "img_fn": "img/0.jpg",
        "metadata_fn": "metadata0.json",
        "objects": ["person", "dog"],
        "question": ["what", "is", [0], "doing", "?"],
        "answer_choices": [
            [[0], "is", "wearing", "a", "hat"],
            [[0], "ran", "left"],
            ["the", "dog", "ran"],
            [[1], "is", "red"],
        ],
        "answer_label": 1,
        "rationale_choices": [["because", "it", "is", "cold"]] * 4,
        "rationale_label": 0,
    }
    with open(d / "train.jsonl", "w") as f:
        f.write(json.dumps(row) + "\n")

    ds = VCRDataset(str(d / "train.jsonl"), "train", str(tmp_path), str(d),
                    tokenizer=tok, task="Q2A", add_image_as_a_box=True,
                    mask_size=(7, 7), seq_len=32)
    s = ds[0]
    assert len(s["choices"]) == 4
    # person ref -> gender-neutral name, tag = box index + 1 (image box at 0)
    q_tags = [t[1] for t in s["query"]]
    assert 1 in q_tags                    # [0]-referenced person -> tag 1
    assert s["boxes"].shape[0] == 3       # image box + 2 objects

    collate = make_vcr_collate(tok, 24, 6, mask_size=(7, 7))
    batch = collate([s])
    (image, boxes, objects, segms, box_mask, ids, tt, tags, tmask,
     im_info, label) = batch
    assert ids.shape == (1, 4, 24)
    assert segms.shape == (1, 6, 7, 7)
    assert int(label[0]) == 1
    assert box_mask[0].sum() == 3

    # tiny model forward on the real collated batch
    import jax
    import jax.numpy as jnp

    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.utils.config import default_config

    cfg = default_config("vcr")
    cfg.MODULE = "ResNetVLBERT"
    cfg.DATASET.TASK = "Q2A"
    v = cfg.NETWORK.VLBERT
    v.hidden_size = 32; v.visual_size = 32; v.num_hidden_layers = 1
    v.num_attention_heads = 2; v.intermediate_size = 64; v.vocab_size = 64
    v.max_position_embeddings = 64; v.visual_ln = True
    v.visual_scale_text_init = 1.0; v.visual_scale_object_init = 1.0
    cfg.NETWORK.IMAGE_FINAL_DIM = 32
    cfg.NETWORK.IMAGE_NUM_LAYERS = 18
    cfg.NETWORK.ENABLE_CNN_REG_LOSS = False
    cfg.NETWORK.CLASSIFIER_HIDDEN_SIZE = 32
    m = build_module(cfg, "vcr", dtype=jnp.float32)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, *jb, train=True)
    outputs, loss = m.apply(params, *jb, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
    assert outputs["label_logits"].shape == (1, 4)
    assert np.isfinite(float(loss))


def test_vcr_dataset_qa2r_and_q2ar(tmp_path, tok):
    """QA2R: query = question + gold answer, choices = rationales;
    Q2AR additionally carries rationale fields (ref vcr.py:388-426)."""
    import json as _json

    from PIL import Image

    from vlbert_tpu.data.datasets.vcr import VCRDataset

    d = tmp_path / "vcr2"
    os.makedirs(d / "img", exist_ok=True)
    Image.fromarray((np.random.default_rng(1).uniform(
        size=(60, 80, 3)) * 255).astype(np.uint8)).save(d / "img" / "0.jpg")
    metadata = {"boxes": [[5, 5, 40, 40, 0.9]],
                "segms": [[[[5, 5], [40, 5], [40, 40], [5, 40]]]],
                "width": 80, "height": 60}
    with open(d / "metadata0.json", "w") as f:
        _json.dump(metadata, f)
    row = {
        "img_fn": "img/0.jpg", "metadata_fn": "metadata0.json",
        "objects": ["person"],
        "question": ["what", "is", [0], "doing", "?"],
        "answer_choices": [[[0], "is", "wearing", "a", "hat"],
                           ["the", "dog", "ran"]],
        "answer_label": 0,
        "rationale_choices": [["because", "it", "is", "cold"],
                              ["the", "dog", "ran"]],
        "rationale_label": 1,
    }
    with open(d / "train.jsonl", "w") as f:
        f.write(_json.dumps(row) + "\n")

    qa2r = VCRDataset(str(d / "train.jsonl"), "train", str(tmp_path), str(d),
                      tokenizer=tok, task="QA2R", add_image_as_a_box=True,
                      mask_size=(7, 7), seq_len=32)[0]
    # query must contain the gold answer's tokens after the question
    q_ids = [t[0] for t in qa2r["query"]]
    hat_id = tok.convert_tokens_to_ids(["hat"])[0]
    assert hat_id in q_ids
    assert int(qa2r["label"]) == 1
    assert len(qa2r["choices"]) == 2

    q2ar = VCRDataset(str(d / "train.jsonl"), "train", str(tmp_path), str(d),
                      tokenizer=tok, task="Q2AR", add_image_as_a_box=True,
                      mask_size=(7, 7), seq_len=32)[0]
    assert int(q2ar["label"]) == 0                  # answer label
    assert int(q2ar["rationale_label"]) == 1
    assert len(q2ar["rationale_choices"]) == 2


def _write_vcr_fixture(tmp_path, name="vcrfix", n_answers=4, test_mode=False):
    """Two-row VCR jsonl + metadata + image, returns the data dir."""
    from PIL import Image

    d = tmp_path / name
    os.makedirs(d / "img", exist_ok=True)
    Image.fromarray((np.random.default_rng(7).uniform(
        size=(60, 80, 3)) * 255).astype(np.uint8)).save(d / "img" / "0.jpg")
    metadata = {"boxes": [[5, 5, 40, 40, 0.9], [30, 10, 70, 50, 0.8]],
                "segms": [[[[5, 5], [40, 5], [40, 40], [5, 40]]],
                          [[[30, 10], [70, 10], [70, 50], [30, 50]]]],
                "width": 80, "height": 60}
    with open(d / "metadata0.json", "w") as f:
        json.dump(metadata, f)
    rows = []
    for k in range(2):
        row = {
            "annot_id": f"val-{k}",
            "img_fn": "img/0.jpg", "metadata_fn": "metadata0.json",
            "objects": ["person", "dog"],
            "question": ["what", "is", [0], "doing", "?"],
            "answer_choices": [[[0], "is", "wearing", "a", "hat"],
                               [[0], "ran", "left"],
                               ["the", "dog", "ran"],
                               [[1], "is", "red"]][:n_answers],
            "rationale_choices": [["because", "it", "is", "cold"],
                                  ["the", "dog", "ran", "left"],
                                  [[0], "is", "red"],
                                  ["why", "?"]][:n_answers],
        }
        if not test_mode:
            row["answer_label"] = 1
            row["rationale_label"] = 0
        rows.append(row)
    with open(d / "ann.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    return d


def test_vcr_qa2r_test_mode_conditioned_queries(tmp_path, tok):
    """Test-mode QA2R emits one conditioned query per candidate answer
    (ref vcr.py:416-424) and the collator stacks them to [B, A, C, T]."""
    from vlbert_tpu.data.datasets.vcr import VCRDataset, make_vcr_collate

    d = _write_vcr_fixture(tmp_path, test_mode=True)
    ds = VCRDataset(str(d / "ann.jsonl"), "test", str(tmp_path), str(d),
                    tokenizer=tok, task="QA2R", test_mode=True,
                    add_image_as_a_box=True, mask_size=(7, 7), seq_len=32)
    s = ds[0]
    assert isinstance(s["query"], list) and len(s["query"]) == 4
    # each conditioned query = question + that answer -> all distinct
    flat = [tuple(t[0] for t in q) for q in s["query"]]
    assert len(set(flat)) == 4
    # question prefix is shared
    assert all(f[:3] == flat[0][:3] for f in flat)

    collate = make_vcr_collate(tok, 24, 6, mask_size=(7, 7),
                               test_mode=True, task="QA2R")
    batch = collate([ds[0], ds[1]])
    (image, boxes, objects, segms, box_mask, ids, tt, tags, tmask,
     im_info) = batch
    assert ids.shape == (2, 4, 4, 24)       # [B, A(conditioning), C, T]
    assert tmask.shape == (2, 4, 4, 24)
    # conditioned inputs differ across the conditioning axis
    assert not np.array_equal(ids[0, 0], ids[0, 1])


def test_vcr_q2ar_collate_and_joint_forward(tmp_path, tok):
    """Q2AR: single-model dual-head batch -> forward -> joint metric."""
    import jax
    import jax.numpy as jnp

    from vlbert_tpu.data.datasets.vcr import VCRDataset, make_vcr_collate
    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.training import metrics as metrics_lib
    from vlbert_tpu.utils.config import default_config

    d = _write_vcr_fixture(tmp_path)
    ds = VCRDataset(str(d / "ann.jsonl"), "train", str(tmp_path), str(d),
                    tokenizer=tok, task="Q2AR", add_image_as_a_box=True,
                    mask_size=(7, 7), seq_len=32)
    collate = make_vcr_collate(tok, 24, 6, mask_size=(7, 7), task="Q2AR")
    batch = collate([ds[0], ds[1]])
    assert len(batch) == 16
    (image, boxes, objects, segms, box_mask, a_ids, a_tt, a_tags, a_mask,
     r_ids, r_tt, r_tags, r_mask, im_info, label, r_label) = batch
    assert a_ids.shape == (2, 4, 24) and r_ids.shape == (2, 4, 24)
    assert int(label[0]) == 1 and int(r_label[0]) == 0

    cfg = default_config("vcr")
    cfg.MODULE = "ResNetVLBERT"
    assert cfg.DATASET.TASK == "Q2AR"
    v = cfg.NETWORK.VLBERT
    v.hidden_size = 32; v.visual_size = 32; v.num_hidden_layers = 1
    v.num_attention_heads = 2; v.intermediate_size = 64; v.vocab_size = 64
    v.max_position_embeddings = 64; v.visual_ln = True
    v.visual_scale_text_init = 1.0; v.visual_scale_object_init = 1.0
    cfg.NETWORK.IMAGE_FINAL_DIM = 32
    cfg.NETWORK.IMAGE_NUM_LAYERS = 18
    cfg.NETWORK.ENABLE_CNN_REG_LOSS = False
    cfg.NETWORK.CLASSIFIER_HIDDEN_SIZE = 32
    m = build_module(cfg, "vcr", dtype=jnp.float32)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, *jb, train=True)
    outputs, loss = m.apply(params, *jb, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
    assert outputs["label_logits"].shape == (2, 4)
    assert outputs["rationale_logits"].shape == (2, 4)
    assert np.isfinite(float(loss))
    # answer and rationale heads are distinct params
    assert "final_mlp_rationale" in params["params"]

    dm = metrics_lib.device_metrics("vcr", cfg, outputs)
    assert "JointAcc" in dm and "RationaleAcc" in dm
    js, jn = dm["JointAcc"]
    assert float(jn) == 2.0

    # inference mode returns both logit sets without labels
    infer_out = m.apply(params, *jb[:-2], train=False)
    assert set(infer_out) >= {"label_logits", "rationale_logits"}


def test_vcr_fixed_category_ids_and_db_cache(tmp_path, tok):
    """Category ids come from the fixed COCO-81 list (stable across visit
    order, ref vcr.py:69-78); db pickle cache round-trips (ref :120-181)."""
    from vlbert_tpu.data.datasets.vcr import VCR_CATEGORIES, VCRDataset

    assert len(VCR_CATEGORIES) == 81
    assert VCR_CATEGORIES.index("person") == 1
    assert VCR_CATEGORIES.index("toothbrush") == 80

    d = _write_vcr_fixture(tmp_path)
    ds = VCRDataset(str(d / "ann.jsonl"), "train", str(tmp_path), str(d),
                    tokenizer=tok, task="Q2A", add_image_as_a_box=True,
                    mask_size=(7, 7), seq_len=32,
                    cache_db=True, ignore_db_cache=True)
    s = ds[0]
    # image box class 0, person 1, dog 17 — independent of visit order
    assert s["objects"].tolist() == [0, 1, 17]

    cache = tmp_path / "cache"
    assert any(p.name.startswith("vcr_nometa_Q2A_train_ann")
               for p in cache.iterdir())
    ds2 = VCRDataset(str(d / "ann.jsonl"), "train", str(tmp_path), str(d),
                     tokenizer=tok, task="Q2A", add_image_as_a_box=True,
                     mask_size=(7, 7), seq_len=32,
                     cache_db=True, ignore_db_cache=False)
    assert len(ds2) == len(ds)
    assert ds2[0]["objects"].tolist() == [0, 1, 17]


def _write_refcoco_fixture(tmp_path):
    """jsonl rows + MAttNet proposal dets + VG b64 box jsons + image."""
    import base64

    from PIL import Image

    d = tmp_path / "refcoco"
    os.makedirs(d / "img", exist_ok=True)
    Image.fromarray((np.random.default_rng(3).uniform(
        size=(60, 80, 3)) * 255).astype(np.uint8)).save(d / "img" / "7.jpg")
    rows = [{
        "image_id": 7,
        "image_fn": "img/7.jpg", "width": 80, "height": 60,
        "boxes": [[5, 5, 40, 40], [30, 10, 70, 50]],      # gt COCO anns
        "gt_box": [5, 5, 40, 40],
        "sentence": "the red dog",
    }]
    with open(d / "ann.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    # MAttNet detections (xywh, ref refcoco.py:85-96,143-145)
    os.makedirs(d / "refcoco+" / "proposal", exist_ok=True)
    dets = [{"image_id": 7, "box": [4, 4, 38, 38]},
            {"image_id": 7, "box": [28, 8, 44, 44]},
            {"image_id": 7, "box": [0, 0, 20, 20]}]
    with open(d / "refcoco+" / "proposal" /
              "res101_coco_minus_refer_notime_dets.json", "w") as f:
        json.dump(dets, f)

    # VG precomputed b64 boxes (ref :146-152)
    vg_dir = (d / "vgbua_res101_precomputed" /
              "trainval2014_resnet101_faster_rcnn_genome")
    os.makedirs(vg_dir, exist_ok=True)
    vg_boxes = np.asarray([[6, 6, 42, 42], [25, 12, 66, 48]], np.float32)
    with open(vg_dir / "7.json", "w") as f:
        json.dump({"num_boxes": 2,
                   "boxes": base64.encodebytes(vg_boxes.tobytes()).decode()},
                  f)
    return d


def test_refcoco_box_sources(tmp_path, tok):
    """gt / proposal(official) / proposal+gt / vg box sources
    (ref refcoco/data/datasets/refcoco.py:133-176)."""
    from vlbert_tpu.data.datasets.refcoco import RefCOCODataset

    d = _write_refcoco_fixture(tmp_path)
    common = dict(tokenizer=tok, add_image_as_a_box=True)

    gt = RefCOCODataset(str(d / "ann.jsonl"), "train", str(tmp_path), str(d),
                        boxes="gt", **common)[0]
    # image box + 2 gt anns
    assert gt["boxes"].shape[0] == 3

    prop = RefCOCODataset(str(d / "ann.jsonl"), "train", str(tmp_path),
                          str(d), boxes="proposal", **common)[0]
    # image box + 3 MAttNet detections
    assert prop["boxes"].shape[0] == 4
    # xywh -> xyxy conversion: det [4,4,38,38] -> [4,4,42,42]
    assert prop["boxes"][1].tolist() == [4.0, 4.0, 42.0, 42.0]
    # labels = IoU > 0.5 vs gt box per region (ref :200-203)
    assert prop["label"].shape[0] == 4 and prop["label"][1] == 1.0

    both = RefCOCODataset(str(d / "ann.jsonl"), "train", str(tmp_path),
                          str(d), boxes="proposal+gt", **common)[0]
    # image box + 3 dets + 2 gt anns
    assert both["boxes"].shape[0] == 6

    vg = RefCOCODataset(str(d / "ann.jsonl"), "train", str(tmp_path), str(d),
                        boxes="proposal", proposal_source="vg", **common)[0]
    assert vg["boxes"].shape[0] == 3
    assert vg["boxes"][1].tolist() == [6.0, 6.0, 42.0, 42.0]


def test_refcoco_detected_regions_end_to_end(tmp_path, tok):
    """proposal+gt source -> collate -> RefCOCO module forward (the
    detected_regions config path, cfgs/refcoco/*detected_regions*.yaml)."""
    import jax
    import jax.numpy as jnp

    from vlbert_tpu.data.datasets.refcoco import (RefCOCODataset,
                                                  make_refcoco_collate)
    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.utils.config import default_config

    d = _write_refcoco_fixture(tmp_path)
    ds = RefCOCODataset(str(d / "ann.jsonl"), "train", str(tmp_path), str(d),
                        tokenizer=tok, boxes="proposal+gt",
                        add_image_as_a_box=True)
    collate = make_refcoco_collate(tok, 12, 8)
    batch = collate([ds[0]])
    (image, boxes, box_mask, im_info, ids, tmask, label) = batch
    assert boxes.shape == (1, 8, 4)
    assert int(box_mask[0].sum()) == 6

    cfg = default_config("refcoco")
    cfg.MODULE = "ResNetVLBERT"
    v = cfg.NETWORK.VLBERT
    v.hidden_size = 32; v.visual_size = 32; v.num_hidden_layers = 1
    v.num_attention_heads = 2; v.intermediate_size = 64; v.vocab_size = 64
    v.max_position_embeddings = 64; v.visual_ln = True
    v.visual_scale_text_init = 1.0; v.visual_scale_object_init = 1.0
    cfg.NETWORK.IMAGE_FINAL_DIM = 32
    cfg.NETWORK.IMAGE_NUM_LAYERS = 18
    m = build_module(cfg, "refcoco", dtype=jnp.float32)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, *jb, train=True)
    outputs, loss = m.apply(params, *jb, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
    assert outputs["label_logits"].shape == (1, 8)
    assert np.isfinite(float(loss))


def test_vqa_imdb_npy_path(tmp_path, tok):
    """Pythia imdb .npy annotations (DATASET.USE_IMDB,
    ref vqa/data/datasets/vqa.py:357-376) through __getitem__."""
    import base64

    from vlbert_tpu.data.datasets.vqa import VQADataset, build_vqa_imdb_db

    d = tmp_path / "vqa_imdb"
    box_dir = (d / "vgbua_res101_precomputed" /
               "trainval_resnet101_faster_rcnn_genome_36")
    os.makedirs(box_dir, exist_ok=True)
    os.makedirs(d / "annotations", exist_ok=True)
    rng = np.random.default_rng(0)
    image_id = 42
    nb, feat_dim = 3, 16
    boxes = rng.uniform(0, 40, (nb, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    with open(box_dir / f"{image_id}.json", "w") as f:
        json.dump({"num_boxes": nb,
                   "boxes": base64.encodebytes(boxes.tobytes()).decode(),
                   "features": base64.encodebytes(rng.normal(
                       size=(nb, feat_dim)).astype(np.float32).tobytes()).decode()},
                  f)
    with open(d / "annotations" / "instances_train2014.json", "w") as f:
        json.dump({"images": [{"id": image_id, "width": 100, "height": 80}]},
                  f)
    imdb = np.asarray([
        {"dataset_name": "vqa"},                     # info header row
        {"image_id": image_id, "question_id": 9,
         "question_tokens": ["what", "is", "the", "cat", "doing", "?"],
         "answers": ["red"] * 7 + ["blue"] * 3},
    ], dtype=object)
    np.save(d / "imdb_train2014.npy", imdb, allow_pickle=True)
    (d / "answers.txt").write_text("<unk>\nred\nblue\n")

    db = build_vqa_imdb_db(str(d / "imdb_train2014.npy"), "train2014", str(d))
    assert len(db) == 1
    assert db[0]["width"] == 100 and db[0]["question_id"] == 9
    assert db[0]["box_fn"].endswith(f"{image_id}.json")

    ds = VQADataset(str(d / "imdb_train2014.npy"), "train2014", str(tmp_path),
                    str(d), tokenizer=tok,
                    answer_vocab_file=str(d / "answers.txt"),
                    with_precomputed_visual_feat=True, use_imdb=True)
    s = ds[0]
    assert s["boxes"].shape == (nb + 1, 4 + feat_dim)   # +whole-image box
    assert s["label"].argmax() == 1                     # 'red' consensus
    assert len(s["q_ids"]) > 0


def test_process_worker_loader_matches_thread_loader(tmp_path, tok):
    """Fork-pool workers (num_workers>0) must yield the same batches as the
    thread path for a deterministic dataset, and surface worker errors."""
    from vlbert_tpu.data.datasets.vcr import VCRDataset, make_vcr_collate
    from vlbert_tpu.data.loader import DataLoader

    d = _write_vcr_fixture(tmp_path, name="vcrproc")
    collate = make_vcr_collate(tok, 24, 6, mask_size=(7, 7))

    def batches(num_workers):
        # person-name rotation is deterministic per sample index, so thread
        # and process layouts must produce identical batches
        ds = VCRDataset(str(d / "ann.jsonl"), "train", str(tmp_path), str(d),
                        tokenizer=tok, task="Q2A", add_image_as_a_box=True,
                        mask_size=(7, 7), seq_len=32)
        dl = DataLoader(ds, batch_size=2, collate_fn=collate, shuffle=True,
                        seed=3, num_workers=num_workers, drop_last=False)
        try:
            return list(dl)
        finally:
            dl.shutdown()

    thread_b = batches(0)
    proc_b = batches(2)
    assert len(thread_b) == len(proc_b) == 1
    for a, b in zip(thread_b[0], proc_b[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # error propagation from a forked worker
    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("worker boom")

    dl = DataLoader(Boom(), batch_size=2, collate_fn=lambda s: s,
                    shuffle=False, num_workers=2)
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="worker boom"):
            list(dl)
    finally:
        dl.shutdown()


def test_device_norm_loader_feeds_uint8(tmp_path, tok):
    """make_dataloader with TPU.DEVICE_IMAGE_NORM (default) ships uint8
    images; the VCR module forward accepts them via dtype dispatch."""
    from vlbert_tpu.data.build import make_dataloader
    from vlbert_tpu.utils.config import default_config

    d = _write_vcr_fixture(tmp_path, name="vcrdevnorm")
    cfg = default_config("vcr")
    cfg.DATASET.DATASET = "vcr"
    cfg.DATASET.TASK = "Q2A"
    cfg.DATASET.VAL_ANNOTATION_FILE = str(d / "ann.jsonl")
    cfg.DATASET.VAL_IMAGE_SET = "val"
    cfg.DATASET.ROOT_PATH = str(tmp_path)
    cfg.DATASET.DATASET_PATH = str(d)
    cfg.VAL.BATCH_IMAGES = 1          # x8 virtual devices; padded (val mode)
    cfg.NUM_WORKERS_PER_GPU = 0
    cfg.TPU.MAX_TEXT_LEN = 24
    cfg.TPU.MAX_BOXES = 6
    cfg.DATASET.MASK_SIZE = 7

    dl = make_dataloader(cfg, "vcr", mode="val", tokenizer=tok,
                         num_replicas=1, rank=0)
    batch = next(iter(dl))
    assert batch[0].dtype == np.uint8            # image on the wire
    # and the host-normalize knob still produces float32
    cfg.TPU.DEVICE_IMAGE_NORM = False
    dl = make_dataloader(cfg, "vcr", mode="val", tokenizer=tok,
                         num_replicas=1, rank=0)
    batch = next(iter(dl))
    assert batch[0].dtype == np.float32


def test_aspect_grouping_wired_through_loader():
    """TRAIN.ASPECT_GROUPING: batches come from GroupedBatchSampler when the
    dataset exposes group_ids; without them it fails loudly like the
    reference's assert (vcr.py:114-116)."""
    import pytest as _pytest

    from vlbert_tpu.data.loader import DataLoader

    class DS:
        group_ids = [0, 1, 0, 1, 0, 1, 0, 1]

        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"i": np.int32(i)}

    collate = lambda s: tuple(x["i"] for x in s)
    dl = DataLoader(DS(), batch_size=2, collate_fn=collate, shuffle=False,
                    aspect_grouping=True)
    batches = list(dl)
    assert len(batches) == len(dl) == 4
    for b in batches:
        gids = {DS.group_ids[int(i)] for i in b}
        assert len(gids) == 1                 # homogeneous groups

    class NoGroups:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {}

    with _pytest.raises(NotImplementedError):
        DataLoader(NoGroups(), batch_size=2, collate_fn=collate,
                   aspect_grouping=True)


class _PickOKDataset:
    """Module-level (hence picklable) tiny dataset for the pool test."""

    def __len__(self):
        return 4

    def __getitem__(self, i):
        return {"text": np.arange(3, dtype=np.int32),
                "mlm_labels": np.full(3, -1, np.int32)}


def test_collates_pickle_and_pool_prefers_forkserver(tmp_path, tok):
    """All public collate factories return picklable objects (so the worker
    pool can use the forkserver start method — workers exec'd fresh instead
    of forking the JAX-threaded parent), and the pool picks forkserver for
    picklable dataset/collate pairs, fork otherwise."""
    import pickle

    from vlbert_tpu.data.collate import PicklableCollate
    from vlbert_tpu.data.datasets.conceptual_captions import (
        make_corpus_collate, make_pretrain_collate)
    from vlbert_tpu.data.datasets.refcoco import make_refcoco_collate
    from vlbert_tpu.data.datasets.vcr import make_vcr_collate
    from vlbert_tpu.data.datasets.vqa import make_vqa_collate
    from vlbert_tpu.data.loader import DataLoader

    for c in (make_vcr_collate(tok, 24, 6, mask_size=(7, 7)),
              make_vqa_collate(tok, 24, 6, precomputed_dim=8),
              make_refcoco_collate(tok, 24, 6),
              make_pretrain_collate(24, 6, 10),
              make_corpus_collate(24)):
        assert isinstance(c, PicklableCollate)
        c2 = pickle.loads(pickle.dumps(c))
        assert isinstance(c2, PicklableCollate)

    # round-trip functional equality for one of them
    c = make_corpus_collate(8)
    c2 = pickle.loads(pickle.dumps(c))
    s = [{"text": np.arange(5, dtype=np.int32),
          "mlm_labels": np.full(5, -1, np.int32)}]
    for a, b in zip(c(s), c2(s)):
        np.testing.assert_array_equal(a, b)

    dl = DataLoader(_PickOKDataset(), batch_size=2,
                    collate_fn=make_corpus_collate(8),
                    shuffle=False, num_workers=1)
    try:
        pool = dl._ensure_pool()
        assert "forkserver" in type(pool._mp_context).__name__.lower() or \
            "ForkServer" in type(pool._mp_context).__name__
        batches = list(dl)
        assert len(batches) == 2
    finally:
        dl.shutdown()

    unpicklable = lambda s: s   # noqa: E731 — lambdas don't pickle
    dl2 = DataLoader(_PickOKDataset(), batch_size=2, collate_fn=unpicklable,
                     shuffle=False, num_workers=1)
    try:
        pool2 = dl2._ensure_pool()
        assert "Fork" in type(pool2._mp_context).__name__
        assert "Server" not in type(pool2._mp_context).__name__
    finally:
        dl2.shutdown()


def test_worker_count_capped_by_host_cores(tmp_path, tok, monkeypatch):
    """NUM_WORKERS_PER_GPU x devices is capped at cpu_count-1 (single-core
    hosts fall back to the thread path — measured faster, bench_host.py)."""
    import vlbert_tpu.data.build as build_mod
    from vlbert_tpu.data.build import make_dataloader
    from vlbert_tpu.utils.config import default_config

    d = _write_vcr_fixture(tmp_path, name="vcrcap")
    cfg = default_config("vcr")
    cfg.DATASET.DATASET = "vcr"
    cfg.DATASET.DATASET_PATH = str(d)
    cfg.DATASET.ROOT_PATH = str(tmp_path)
    cfg.DATASET.TRAIN_ANNOTATION_FILE = "ann.jsonl"
    cfg.DATASET.TRAIN_IMAGE_SET = "train"
    cfg.DATASET.TASK = "Q2A"
    cfg.DATASET.MASK_SIZE = 7
    cfg.TRAIN.BATCH_IMAGES = 1
    cfg.NUM_WORKERS_PER_GPU = 4
    cfg.TPU.MAX_TEXT_LEN = 32
    cfg.TPU.MAX_BOXES = 8
    cfg.NETWORK.BERT_MODEL_NAME = tok.vocab_file \
        if hasattr(tok, "vocab_file") else cfg.NETWORK.BERT_MODEL_NAME

    monkeypatch.setattr(build_mod.os, "cpu_count", lambda: 1)
    dl = make_dataloader(cfg, "vcr", "train", tokenizer=tok)
    assert dl.num_workers == 0

    monkeypatch.setattr(build_mod.os, "cpu_count", lambda: 64)
    dl = make_dataloader(cfg, "vcr", "train", tokenizer=tok)
    assert dl.num_workers == 4 * __import__("jax").local_device_count()


def test_vcr_person_names_vary_by_epoch(tmp_path, tok):
    """Person-name rotation is deterministic per (epoch, sample): same
    sample gets different names across epochs (no stable per-sample name
    cue), and both worker layouts agree at every epoch."""
    from vlbert_tpu.data.datasets.vcr import VCRDataset, make_vcr_collate
    from vlbert_tpu.data.loader import DataLoader

    d = _write_vcr_fixture(tmp_path, name="vcrep")
    collate = make_vcr_collate(tok, 24, 6, mask_size=(7, 7))

    def batches(num_workers, epoch):
        ds = VCRDataset(str(d / "ann.jsonl"), "train", str(tmp_path), str(d),
                        tokenizer=tok, task="Q2A", add_image_as_a_box=True,
                        mask_size=(7, 7), seq_len=32)
        dl = DataLoader(ds, batch_size=2, collate_fn=collate, shuffle=False,
                        seed=3, num_workers=num_workers, drop_last=False)
        dl.set_epoch(epoch)
        try:
            return list(dl)
        finally:
            dl.shutdown()

    e0_threads = batches(0, 0)
    e1_threads = batches(0, 1)
    # text ids differ between epochs (person names rotated)
    assert not all(np.array_equal(a, b)
                   for a, b in zip(e0_threads[0], e1_threads[0]))
    # process workers agree with threads at the same epoch
    e1_procs = batches(2, 1)
    for a, b in zip(e1_threads[0], e1_procs[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grouped_batch_sampler_deterministic_count():
    """Every epoch/rank yields EXACTLY n//B (drop) or ceil (no-drop) full
    batches regardless of group composition — the varying per-rank count is
    the reference's distributed-RefCOCO deadlock (README.md:137-139)."""
    from vlbert_tpu.data.loader import GroupedBatchSampler

    rng = np.random.default_rng(0)
    B = 4
    for trial in range(20):
        n = int(rng.integers(8, 40))
        group_ids = rng.integers(0, 2, size=100)
        idx = rng.permutation(100)[:n]
        s = GroupedBatchSampler(idx, group_ids, B, drop_uneven=True)
        batches = list(s)
        assert len(batches) == len(s) == n // B, (trial, n)
        assert all(len(b) == B for b in batches)
        s2 = GroupedBatchSampler(idx, group_ids, B, drop_uneven=False)
        batches2 = list(s2)
        assert len(batches2) == len(s2) == -(-n // B), (trial, n)
        assert all(len(b) == B for b in batches2)   # wrap-padded, static
        # full batches are group-homogeneous; only leftover batches may mix
        full_homog = sum(1 for b in batches2
                         if len({int(group_ids[int(i)]) for i in b}) == 1)
        assert full_homog >= len(batches2) - 2      # <= #groups-1 mixed + pad


def test_vcr_qa2r_noq(tmp_path, tok):
    """qa2r_noq (ref vcr.py:411-424 'qa2r_noq' wiring): the QA2R query is
    the chosen ANSWER alone, without the question tokens."""
    from vlbert_tpu.data.datasets.vcr import VCRDataset

    d = _write_vcr_fixture(tmp_path, name="vcrnoq")

    def query_ids(noq):
        ds = VCRDataset(str(d / "ann.jsonl"), "train", str(tmp_path), str(d),
                        tokenizer=tok, task="QA2R", qa2r_noq=noq,
                        add_image_as_a_box=True, mask_size=(7, 7), seq_len=32)
        return [t[0] for t in ds[0]["query"]]

    with_q = query_ids(False)
    no_q = query_ids(True)
    assert len(no_q) < len(with_q)
    # the noq query is a suffix of the full query (question stripped)
    assert with_q[-len(no_q):] == no_q


def test_vcr_zip_mode(tmp_path, tok):
    """DATASET.ZIP_MODE: images + metadata read from the
    '{image_set}.zip@/{image_set}' archive with paths rewritten exactly like
    the reference (ref vcr.py:150-152); batches match the plain-dir run."""
    import zipfile

    from vlbert_tpu.data.datasets.vcr import VCRDataset

    d = _write_vcr_fixture(tmp_path, name="vcrzip")
    image_set = "train"
    zpath = tmp_path / "zipped" / f"{image_set}.zip"
    os.makedirs(zpath.parent, exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        for dp, _, fs in os.walk(d):
            for f in fs:
                if f == "ann.jsonl":
                    continue
                full = os.path.join(dp, f)
                rel = os.path.relpath(full, d)
                z.write(full, os.path.join(image_set, rel))

    def sample(zip_mode, data_path):
        ds = VCRDataset(str(d / "ann.jsonl"), image_set, str(tmp_path),
                        data_path, tokenizer=tok, task="Q2A",
                        add_image_as_a_box=True, mask_size=(7, 7),
                        seq_len=32, zip_mode=zip_mode)
        return ds[0]

    plain = sample(False, str(d))
    zipped = sample(True, str(zpath.parent))
    np.testing.assert_array_equal(plain["image"], zipped["image"])
    np.testing.assert_array_equal(plain["boxes"], zipped["boxes"])
    assert [t[0] for t in plain["query"]] == [t[0] for t in zipped["query"]]


def test_vqa_zip_mode(tmp_path, tok):
    """VQA ZIP_MODE: the box-feature json's parent dir is read as a
    '{dir}.zip@/{dir}' archive (reference path-template semantics,
    ref vqa.py:141-152); results match the plain-dir run."""
    import zipfile

    from tests.test_entrypoints import _write_vqa_fixture
    from vlbert_tpu.data.datasets.vqa import VQADataset

    d, _vocab = _write_vqa_fixture(tmp_path)
    with zipfile.ZipFile(os.path.join(d, "boxes.zip"), "w") as z:
        for f in os.listdir(os.path.join(d, "boxes")):
            z.write(os.path.join(d, "boxes", f), os.path.join("boxes", f))

    def sample(zip_mode):
        ds = VQADataset(os.path.join(d, "val.jsonl"), "val", str(tmp_path),
                        str(d), tokenizer=tok,
                        answer_vocab_file=os.path.join(d, "answers.txt"),
                        zip_mode=zip_mode)
        return ds[0]

    plain = sample(False)
    zipped = sample(True)
    np.testing.assert_array_equal(plain["boxes"], zipped["boxes"])


def test_refcoco_zip_mode(tmp_path, tok):
    """RefCOCO ZIP_MODE: images and VG proposal jsons read through
    '{dir}.zip@/{dir}' archives (ref refcoco.py:146,264-270)."""
    import shutil
    import zipfile

    from vlbert_tpu.data.datasets.refcoco import RefCOCODataset, VG_PROPOSAL

    d = pathlib_Path = __import__("pathlib").Path(
        _write_refcoco_fixture(tmp_path))
    vg_root = d / VG_PROPOSAL[0]
    sub = VG_PROPOSAL[1]
    with zipfile.ZipFile(vg_root / f"{sub}.zip", "w") as z:
        for f in os.listdir(vg_root / sub):
            z.write(vg_root / sub / f, os.path.join(sub, f))
    shutil.rmtree(vg_root / sub)
    with zipfile.ZipFile(d / "img.zip", "w") as z:
        for f in os.listdir(d / "img"):
            z.write(d / "img" / f, os.path.join("img", f))
    shutil.rmtree(d / "img")

    ds = RefCOCODataset(str(d / "ann.jsonl"), "train", str(tmp_path), str(d),
                        tokenizer=tok, boxes="proposal",
                        proposal_source="vg", zip_mode=True)
    s = ds[0]
    assert s["image"].shape == (60, 80, 3)
    assert s["boxes"].shape[0] >= 1

def test_cc_zero_image_fallback_normalizes_to_zero(tmp_path, tok):
    """The zero-image fallback (rotten CC downloads) must look like the
    reference's: ~0.0 AFTER normalization (ref conceptual_captions.py
    creates the zeros buffer post-transform). Filling with the rounded
    pixel means achieves that on both the host-Normalize and the on-device
    uint8 paths."""
    from vlbert_tpu.data.datasets.conceptual_captions import (
        ConceptualCaptionsDataset)
    from vlbert_tpu.data.transforms import (Compose, FixPadding, Normalize,
                                            Resize)

    data_dir = _write_cc_fixture(tmp_path, tok)
    mean = (102.9801, 115.9465, 122.7717)      # BGR caffe means
    fill_rgb = tuple(int(round(m)) for m in mean[::-1])

    # host-normalize path
    t = Compose([Resize(32, 48), Normalize(mean, (1.0, 1.0, 1.0)),
                 FixPadding(32, 48)])
    ds = ConceptualCaptionsDataset(
        "train_frcnn.json", "train", str(tmp_path), data_dir,
        tokenizer=tok, seq_len=24, with_precomputed_visual_feat=False,
        add_image_as_a_box=True, transform=t, fallback_fill_rgb=fill_rgb)
    s = ds[0]                                  # img/0.jpg missing -> fallback
    w, h = int(s["im_info"][0]), int(s["im_info"][1])
    assert np.abs(s["image"][:h, :w]).max() <= 0.5 + 1e-6

    # device-normalize path: uint8 stays on the wire; the jitted normalize
    # subtracts the same means
    import jax.numpy as jnp

    from vlbert_tpu.ops.image_norm import normalize_uint8_image

    t2 = Compose([Resize(32, 48), FixPadding(32, 48)])
    # with_mvrc_task off: MVRC raw-pixel zeroing needs NORMALIZED space, so
    # build.py forces host normalization whenever MASK_RAW_PIXELS is active
    # (build.py:87-89) — the uint8 wire path never sees that combination
    ds2 = ConceptualCaptionsDataset(
        "train_frcnn.json", "train", str(tmp_path), data_dir,
        tokenizer=tok, seq_len=24, with_precomputed_visual_feat=False,
        with_mvrc_task=False, add_image_as_a_box=True, transform=t2,
        fallback_fill_rgb=fill_rgb)
    s2 = ds2[0]
    assert s2["image"].dtype == np.uint8
    out = normalize_uint8_image(
        jnp.asarray(s2["image"])[None], jnp.asarray(s2["im_info"])[None],
        mean, (1.0, 1.0, 1.0))
    assert float(jnp.abs(out).max()) <= 0.5 + 1e-6
