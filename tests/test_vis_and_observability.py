"""Attention-dump + Speedometer/observability tests."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from vlbert_tpu.engine.vis import dump_attention_maps
from vlbert_tpu.models.vlbert import VisualLinguisticBert, VLBertConfig


class TinyTok:
    def convert_ids_to_tokens(self, ids):
        return [f"tok{i}" for i in ids]


def test_dump_attention_maps(tmp_path, rng):
    cfg = VLBertConfig(
        vocab_size=100, hidden_size=32, visual_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, visual_ln=True,
        visual_scale_text_init=1.0, visual_scale_object_init=1.0,
        with_pooler=False)
    model = VisualLinguisticBert(cfg)
    B, T, O = 2, 6, 3
    ids = jnp.asarray(rng.integers(1, 100, (B, T)), jnp.int32)
    tt = jnp.zeros((B, T), jnp.int32)
    tve = jnp.asarray(rng.normal(size=(B, T, 32)), jnp.float32)
    tmask = jnp.asarray(np.arange(T)[None] < 5)
    tmask = jnp.broadcast_to(tmask, (B, T))
    ove = jnp.asarray(rng.normal(size=(B, O, 64)), jnp.float32)
    omask = jnp.ones((B, O), bool)
    params = model.init(jax.random.PRNGKey(0), ids, tt, tve, tmask, ove,
                        omask)

    n = dump_attention_maps(model, params,
                            [(ids, tt, tve, tmask, ove, omask)],
                            TinyTok(), str(tmp_path))
    assert n == 2
    probs = np.load(tmp_path / "0_attention_probs.npy")
    L = T + O + 1
    assert probs.shape == (2, 2, L, L)            # [layers, heads, L, L]
    # each row is a distribution over live positions
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    # masked (pad) text position receives ~0 attention from live queries
    assert probs[:, :, 0, 5].max() < 1e-6
    names = json.loads((tmp_path / "0_tokens.json").read_text())
    assert len(names) == L and names[5] == "[PAD]" and names[-1] == "[END]"


def test_speedometer_phases(capsys, caplog):
    import logging

    from vlbert_tpu.training.loop import Speedometer

    s = Speedometer(batch_size=4, frequent=2, batches_per_epoch=4, epochs=1)
    with caplog.at_level(logging.INFO, logger="vlbert_tpu.training.loop"):
        s.phase(0.1, 0.2, tran_dt=0.04, sync_dt=0.3)
        s(0, 0)
        s.phase(0.1, 0.2, 0.04, 0.5)
        s(0, 1)
    out = capsys.readouterr().out
    assert "PROGRESS: 50%" in out
    # the log line carries all four phases (per-batch averages over the
    # window): Data (loader), Tran (H2D dispatch), Step (jit dispatch),
    # Sync (the LOG_FREQUENT fetch barrier = drained device backlog)
    line = next(m for m in caplog.messages if "Speed:" in m)
    assert "Data: 0.100s Tran: 0.040s Step: 0.200s Sync: 0.400s" in line


def test_pretrain_attention_vis_method(rng):
    import jax
    import jax.numpy as jnp

    from vlbert_tpu.models.task_modules import (
        ResNetVLBERTForPretrainingMultitask, build_module)
    from vlbert_tpu.utils.config import default_config

    cfg = default_config("pretrain")
    cfg.MODULE = "ResNetVLBERTForPretrainingMultitask"
    v = cfg.NETWORK.VLBERT
    v.hidden_size = 32; v.visual_size = 32; v.num_hidden_layers = 2
    v.num_attention_heads = 2; v.intermediate_size = 64; v.vocab_size = 100
    v.max_position_embeddings = 64; v.visual_ln = True
    v.visual_scale_text_init = 1.0; v.visual_scale_object_init = 1.0
    v.with_pooler = True
    v.visual_region_classes = 7
    cfg.NETWORK.IMAGE_FINAL_DIM = 32
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    m = build_module(cfg, "pretrain", dtype=jnp.float32,
                     mask_visual_feat_dim=16)

    B, O, T, F = 1, 3, 8, 16
    boxes = np.concatenate(
        [np.abs(rng.normal(size=(B, O, 4))).astype(np.float32) * 20 + 1,
         rng.normal(size=(B, O, F)).astype(np.float32)], -1)
    boxes[..., 2:4] += boxes[..., 0:2]
    text = np.zeros((B, T), np.int32); text[:, :5] = rng.integers(1, 100, (B, 5))
    im_info = jnp.asarray([[64, 64, 1, 1]], jnp.float32)
    mlm = np.full((B, T), -1, np.int32)
    mvrc_ops = np.zeros((B, O), np.int32)
    mvrc_labels = np.zeros((B, O, 7), np.float32)
    args = (None, jnp.asarray(boxes), im_info, jnp.asarray(text),
            jnp.asarray([1], jnp.int32), jnp.asarray(mlm),
            jnp.asarray(mvrc_ops), jnp.asarray(mvrc_labels))
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, *args, train=False)
    probs = m.apply(variables, None, jnp.asarray(boxes), im_info,
                    jnp.asarray(text),
                    method=ResNetVLBERTForPretrainingMultitask.attention_vis)
    L = T + O + 1
    assert probs.shape == (B, 2, 2, L, L)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)


def test_validation_fn_numerics(rng):
    """do_validation computes SoftAcc from inference outputs + batch labels."""
    import jax.numpy as jnp

    from vlbert_tpu.engine.val import make_validation_fn
    from vlbert_tpu.parallel.mesh import make_mesh
    from vlbert_tpu.utils.config import default_config

    class FakeModel:
        def apply(self, params, *inputs, train):
            assert train is False
            # logits favoring class 1 for every example
            B = inputs[0].shape[0]
            logits = np.zeros((B, 4), np.float32)
            logits[:, 1] = 5.0
            return {"label_logits": jnp.asarray(logits)}

    cfg = default_config("vqa")
    mesh = make_mesh()
    vfn = make_validation_fn(FakeModel(), cfg, "vqa", mesh)

    B = 8
    x = np.zeros((B, 3), np.float32)
    # soft labels: half the batch scores 1.0 on class 1, half 0.0
    label = np.zeros((B, 4), np.float32)
    label[: B // 2, 1] = 1.0
    label[B // 2:, 2] = 1.0
    val = vfn(type("S", (), {"params": None})(), [(x, label)])
    assert abs(val["SoftAcc"] - 0.5) < 1e-6


def test_attention_viewer_npy_assumptions(tmp_path):
    """viz/attention_viewer.html parses .npy in JS with fixed byte-layout
    assumptions (v1 header: magic \\x93NUMPY, uint16 header-len at offset 8,
    data at 10+hlen, '<f4' C-order). Validate those against numpy's actual
    serialization and the viewer's flat-index formula."""
    import json
    import os
    import re
    import struct

    import numpy as np

    p = np.random.default_rng(0).uniform(size=(3, 4, 10, 10)).astype(np.float32)
    f = tmp_path / "0_attention_probs.npy"
    np.save(f, p)
    buf = f.read_bytes()

    assert buf[0] == 0x93 and buf[1:6] == b"NUMPY"
    major = buf[6]
    assert major == 1
    hlen = struct.unpack("<H", buf[8:10])[0]
    header = buf[10:10 + hlen].decode()
    shape = tuple(int(x) for x in
                  re.search(r"'shape':\s*\(([^)]*)\)", header).group(1)
                  .split(",") if x.strip())
    descr = re.search(r"'descr':\s*'([^']*)'", header).group(1)
    assert shape == (3, 4, 10, 10) and descr == "<f4"
    data = np.frombuffer(buf[10 + hlen:], np.float32)
    assert data.size == p.size

    # the viewer's att(l, h, i, j) flat-index formula
    def att(l, h, i, j):
        L = shape[3]
        return data[((l * shape[1] + h) * L + i) * L + j]

    assert att(2, 3, 7, 1) == p[2, 3, 7, 1]
    assert att(0, 0, 0, 9) == p[0, 0, 0, 9]

    # the viewer file itself exists and is self-contained (no external src)
    html = open(os.path.join(os.path.dirname(__file__), "..", "viz",
                             "attention_viewer.html")).read()
    assert "parseNpy" in html and "<script src" not in html
    json.dump(["[CLS]"], open(tmp_path / "0_tokens.json", "w"))


def test_attention_view_python_api(tmp_path):
    """viz/attention_view.py: the bertviz-equivalent notebook API
    (ref viz/bertviz/model_view.py:30, attention.py:5-184) — model_view
    grid, head_view lines, and the SVG variant, over an engine/vis.py-format
    dump."""
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from viz.attention_view import (head_view, head_view_html, load_dump,
                                    model_view)

    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.ones(6), size=(2, 3, 6)).astype(np.float32)
    np.save(tmp_path / "0_attention_probs.npy", probs)
    json.dump(["[CLS]", "a", "cat", "box_0", "box_1", "[END]"],
              open(tmp_path / "0_tokens.json", "w"))

    p, toks = load_dump(str(tmp_path), 0)
    assert p.shape == (2, 3, 6, 6) and toks[-1] == "[END]"
    fig = model_view(p, toks)
    assert len(fig.axes) >= 6          # 2 layers x 3 heads
    fig2 = head_view(p, toks, layer=1, heads=[0, 2], min_weight=0.1)
    assert fig2 is not None
    html = head_view_html(p, toks, 0, min_weight=0.1)
    assert html.startswith("<svg") and "box_0" in html and "<line" in html
    # notebook exists and drives this module
    nb = open(os.path.join(os.path.dirname(__file__), "..", "viz",
                           "attention_view.ipynb")).read()
    assert "model_view" in nb and "head_view" in nb
