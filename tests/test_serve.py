"""Serving path test: single-query VQA inference + latency probe."""

import numpy as np
import jax
import jax.numpy as jnp

from vlbert_tpu.engine.serve import VQAServer
from vlbert_tpu.models.task_modules import build_module
from vlbert_tpu.utils.config import default_config


class TinyTok:
    vocab = {"[CLS]": 2, "[SEP]": 3, "[MASK]": 4}

    cls_id, sep_id, mask_id = 2, 3, 4

    def tokenize(self, text):
        return text.split()

    def convert_tokens_to_ids(self, toks):
        return [(hash(t) % 90) + 10 for t in toks]


def test_vqa_server_query_and_latency(rng):
    cfg = default_config("vqa")
    cfg.MODULE = "ResNetVLBERT"
    v = cfg.NETWORK.VLBERT
    v.hidden_size = 32; v.visual_size = 32; v.num_hidden_layers = 1
    v.num_attention_heads = 2; v.intermediate_size = 64; v.vocab_size = 100
    v.max_position_embeddings = 64; v.visual_ln = True
    v.visual_scale_text_init = 1.0; v.visual_scale_object_init = 1.0
    cfg.NETWORK.IMAGE_FINAL_DIM = 32
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    cfg.DATASET.ANSWER_VOCAB_SIZE = 4
    cfg.NETWORK.CLASSIFIER_TYPE = "1fc"
    m = build_module(cfg, "vqa", dtype=jnp.float32)

    tok = TinyTok()
    feat_dim = 16
    srv = VQAServer(m, None, tok, ["<unk>", "red", "blue", "cat"],
                    max_text=16, max_boxes=8, feat_dim=feat_dim)

    boxes = np.asarray([[5, 5, 50, 50], [20, 10, 80, 60]], np.float32)
    feats = rng.normal(size=(2, feat_dim)).astype(np.float32)
    batch = srv.preprocess("what color is the cat", boxes, feats, 100, 80)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, *batch, train=False)
    srv.params = params

    ans = srv.query("what color is the cat", boxes, feats, 100, 80)
    assert ans in ("<unk>", "red", "blue", "cat")

    queries = [(f"what color is the cat {i}", boxes, feats, 100, 80)
               for i in range(5)]
    lat = srv.measure_latency(queries, warmup=2)
    assert lat["n"] == 5 and lat["p50_ms"] > 0
    assert lat["p50_ms"] <= lat["p99_ms"]
