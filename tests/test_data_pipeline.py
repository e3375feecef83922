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
