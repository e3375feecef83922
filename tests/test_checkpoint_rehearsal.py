"""End-to-end checkpoint rehearsal (VERDICT r1 #6): save a reference-format
``.model`` from the ACTUAL reference torch task modules (random weights, with
the real ``module.`` DDP prefix + ``vlbert._module.`` TimeDistributed nesting
+ the reference's own state-dict names), then drive the full chain

    torch .model -> convert -> partial_load -> engine test driver -> file

for each task, asserting (a) the conversion is BIJECTIVE (every tensor of our
model comes from the checkpoint, nothing is dropped) and (b) a valid
leaderboard file is produced.

Skipped when /root/reference is not mounted.
"""

import json
import os
import subprocess
import sys
import types
from copy import deepcopy

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

HID, HEADS, LAYERS, INTER, MAXPOS = 32, 2, 1, 64, 64


@pytest.fixture(scope="module")
def ref_env():
    """Import path for the reference with its unavailable deps stubbed:
    boto3/requests/tqdm (file_utils), easydict (configs), the C_ROIPooling
    CUDA extension (not built here), and model-zoo downloads (no egress —
    weights are random for the rehearsal, so FastRCNN.init_weight is a
    no-op)."""
    added = []

    def stub(name, m):
        if name not in sys.modules:
            sys.modules[name] = m
            added.append(name)

    for mod in ("boto3", "requests", "tqdm"):
        m = types.ModuleType(mod)
        if mod == "tqdm":
            m.tqdm = lambda x, **k: x
        stub(mod, m)
    be = types.ModuleType("botocore.exceptions")
    be.ClientError = Exception
    stub("botocore", types.ModuleType("botocore"))
    stub("botocore.exceptions", be)
    ed = types.ModuleType("easydict")

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    ed.EasyDict = EasyDict
    stub("easydict", ed)
    c = types.ModuleType("common.lib.roi_pooling.C_ROIPooling")
    for fn in ("roi_align_forward", "roi_align_backward",
               "roi_pool_forward", "roi_pool_backward"):
        setattr(c, fn, None)
    sys.modules["common.lib.roi_pooling.C_ROIPooling"] = c
    added.append("common.lib.roi_pooling.C_ROIPooling")
    sys.path.insert(0, REF)

    import torch.utils.model_zoo as mz

    orig_load_url = mz.load_url
    mz.load_url = lambda *a, **k: {}
    import common.fast_rcnn as fr

    orig_init_weight = fr.FastRCNN.init_weight
    fr.FastRCNN.init_weight = lambda self: None
    yield
    # undo: stubs (requests/tqdm/...) would break later real imports
    # (e.g. transformers in the tokenizer-parity tests)
    mz.load_url = orig_load_url
    fr.FastRCNN.init_weight = orig_init_weight
    for name in added:
        sys.modules.pop(name, None)
    sys.path.remove(REF)


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    from tests.test_data_pipeline import VOCAB

    d = tmp_path_factory.mktemp("bert")
    (d / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    return str(d), len(VOCAB)


def _tiny_ref_vlbert(v, vocab_size):
    v.hidden_size = HID
    v.visual_size = HID
    v.num_hidden_layers = LAYERS
    v.num_attention_heads = HEADS
    v.intermediate_size = INTER
    v.vocab_size = vocab_size
    v.max_position_embeddings = MAXPOS
    v.type_vocab_size = 3
    v.visual_ln = True


def _tiny_my_vlbert(cfg, vocab_size):
    v = cfg.NETWORK.VLBERT
    v.hidden_size = HID
    v.visual_size = HID
    v.num_hidden_layers = LAYERS
    v.num_attention_heads = HEADS
    v.intermediate_size = INTER
    v.vocab_size = vocab_size
    v.max_position_embeddings = MAXPOS
    v.visual_ln = True
    v.visual_scale_text_init = 1.0
    v.visual_scale_object_init = 1.0
    cfg.NETWORK.IMAGE_FINAL_DIM = HID
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.FUSED_QKV = False


def _save_ref_model(model, path):
    import torch

    sd = {"module." + k: v for k, v in model.state_dict().items()}
    torch.save({"state_dict": sd}, path)
    return len(sd)


def _assert_bijective(model, init_batch, ckpt_path):
    """Every tensor of our model tree is loaded from the converted reference
    checkpoint, and every converted tensor lands in the tree."""
    import jax

    from vlbert_tpu.training.checkpoint import flatten_params, partial_load
    from vlbert_tpu.training.convert import load_torch_or_native_checkpoint

    flat = load_torch_or_native_checkpoint(ckpt_path)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        *init_batch, train=False)
    model_flat = flatten_params(params["params"])
    _, loaded = partial_load(params["params"], flat)
    assert set(model_flat) == set(loaded), (
        sorted(set(model_flat) - set(loaded))[:8],
        sorted(set(loaded) - set(model_flat))[:8])
    assert set(flat) == set(model_flat), sorted(set(flat) - set(model_flat))[:8]
    return len(model_flat)


def test_vcr_reference_model_to_leaderboard(ref_env, vocab_dir, tmp_path):
    """Reference VCR ResNetVLBERT (resnet50 e2e, TimeDistributed VL-BERT,
    2fc head, cnn-reg) -> .model -> convert -> test_net_vcr Q2A csv."""
    import torch

    import jax.numpy as jnp

    from tests.test_data_pipeline import _write_vcr_fixture
    from vlbert_tpu.engine.test import test_net_vcr
    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.utils.config import default_config

    vdir, vocab_size = vocab_dir

    from vcr.function.config import config as ref_cfg_global

    rc = deepcopy(ref_cfg_global)
    n = rc.NETWORK
    n.BLIND = False
    n.IMAGE_FEAT_PRECOMPUTED = False
    n.IMAGE_NUM_LAYERS = 50
    n.IMAGE_PRETRAINED = ""
    n.IMAGE_FINAL_DIM = HID
    n.IMAGE_SEMANTIC = True
    n.IMAGE_FROZEN_BN = True
    n.ENABLE_CNN_REG_LOSS = True
    n.CNN_LOSS_TOP = False
    n.BERT_MODEL_NAME = vdir
    n.BERT_PRETRAINED = ""
    n.FOR_MASK_VL_MODELING_PRETRAIN = False
    n.CLASSIFIER_TYPE = "2fc"
    n.CLASSIFIER_HIDDEN_SIZE = HID
    _tiny_ref_vlbert(n.VLBERT, vocab_size)
    n.VLBERT.object_word_embed_mode = 1
    n.VLBERT.word_embedding_frozen = False

    from vcr.modules.resnet_vlbert_for_vcr import ResNetVLBERT as RefVCR

    torch.manual_seed(0)
    ckpt = str(tmp_path / "ref_vcr.model")
    n_saved = _save_ref_model(RefVCR(rc), ckpt)
    assert n_saved > 300

    # our matching tiny config over the VCR fixture
    data_dir = _write_vcr_fixture(tmp_path, name="vcrq2a", test_mode=True)
    cfg = default_config("vcr")
    cfg.MODULE = "ResNetVLBERT"
    cfg.DATASET.DATASET = "vcr"
    cfg.DATASET.TASK = "Q2A"
    cfg.DATASET.DATASET_PATH = str(data_dir)
    cfg.DATASET.ROOT_PATH = str(tmp_path)
    cfg.DATASET.TEST_ANNOTATION_FILE = "ann.jsonl"
    cfg.DATASET.TEST_IMAGE_SET = "test"
    cfg.DATASET.MASK_SIZE = 7
    cfg.NETWORK.BERT_MODEL_NAME = vdir
    _tiny_my_vlbert(cfg, vocab_size)
    cfg.NETWORK.VLBERT.object_word_embed_mode = 1
    cfg.NETWORK.IMAGE_NUM_LAYERS = 50
    cfg.NETWORK.IMAGE_SEMANTIC = True
    cfg.NETWORK.IMAGE_FROZEN_BN = True
    cfg.NETWORK.ENABLE_CNN_REG_LOSS = True
    cfg.NETWORK.CNN_LOSS_TOP = False
    cfg.NETWORK.CLASSIFIER_TYPE = "2fc"
    cfg.NETWORK.CLASSIFIER_HIDDEN_SIZE = HID
    cfg.SCALES = [32, 48]
    cfg.TEST.BATCH_IMAGES = 1
    cfg.TPU.MAX_TEXT_LEN = 24
    cfg.TPU.MAX_BOXES = 6

    model = build_module(cfg, "vcr", dtype=jnp.float32)
    B, O, C, T, IMG = 1, 3, 4, 10, 32
    init_batch = (
        jnp.zeros((B, IMG, IMG, 3)), jnp.zeros((B, O, 4)),
        jnp.zeros((B, O), jnp.int32), jnp.zeros((B, O, 7, 7)),
        jnp.ones((B, O), bool), jnp.ones((B, C, T), jnp.int32),
        jnp.zeros((B, C, T), jnp.int32), jnp.zeros((B, C, T), jnp.int32),
        jnp.ones((B, C, T), bool), jnp.asarray([[IMG, IMG, 1, 1]], jnp.float32))
    n_tensors = _assert_bijective(model, init_batch, ckpt)
    assert n_tensors > 290

    out_csv = str(tmp_path / "q2a.csv")
    rows = test_net_vcr(cfg, ckpt, out_csv, mode="test")
    assert len(rows) == 2
    import csv as _csv

    with open(out_csv) as f:
        r = list(_csv.reader(f))
    assert r[0] == ["annot_id", "answer_0", "answer_1", "answer_2", "answer_3"]
    probs = np.asarray([[float(x) for x in d[1:]] for d in r[1:]])
    assert np.allclose(probs.sum(1), 1.0, atol=1e-5)

    # tools/convert_checkpoint.py produces the same tensor set as npz
    npz = str(tmp_path / "conv.npz")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_checkpoint.py"),
         ckpt, npz], capture_output=True, text=True, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    with np.load(npz) as z:
        assert len(z.files) == n_tensors


def test_vqa_reference_model_to_leaderboard(ref_env, vocab_dir, tmp_path):
    """Reference VQA ResNetVLBERT (precomputed features, 1fc head) ->
    .model -> convert -> test_net_vqa answers json."""
    import torch

    import jax.numpy as jnp

    from tests.test_entrypoints import _tiny_vqa_cfg, _write_vqa_fixture
    from vlbert_tpu.engine.test import test_net_vqa
    from vlbert_tpu.models.task_modules import build_module

    vdir, vocab_size = vocab_dir

    from vqa.function.config import config as ref_cfg_global

    rc = deepcopy(ref_cfg_global)
    n = rc.NETWORK
    n.BLIND = False
    n.IMAGE_FEAT_PRECOMPUTED = True
    n.IMAGE_FINAL_DIM = HID
    n.IMAGE_SEMANTIC = False
    n.BERT_MODEL_NAME = vdir
    n.BERT_PRETRAINED = ""
    n.CLASSIFIER_TYPE = "1fc"
    n.CLASSIFIER_HIDDEN_SIZE = HID
    _tiny_ref_vlbert(n.VLBERT, vocab_size)
    rc.DATASET.ANSWER_VOCAB_SIZE = 4

    from vqa.modules.resnet_vlbert_for_vqa import ResNetVLBERT as RefVQA

    torch.manual_seed(0)
    ckpt = str(tmp_path / "ref_vqa.model")
    _save_ref_model(RefVQA(rc), ckpt)

    # feature dim 2048: the reference hardcodes obj_downsample at
    # 2*2048 (+128 semantic) regardless of config (common/fast_rcnn.py:105-109)
    FEAT = 2048
    data_dir, _ = _write_vqa_fixture(tmp_path, n=4, feat_dim=FEAT)
    cfg = _tiny_vqa_cfg(tmp_path, data_dir, vdir, feat_dim=FEAT)
    cfg.NETWORK.VLBERT.vocab_size = vocab_size
    cfg.NETWORK.VLBERT.max_position_embeddings = MAXPOS
    cfg.NETWORK.VLBERT.visual_size = HID
    cfg.TPU.FUSED_QKV = False

    model = build_module(cfg, "vqa", dtype=jnp.float32)
    B, O, T = 1, 4, 12
    init_batch = (
        None, jnp.zeros((B, O, 4 + FEAT)), jnp.ones((B, O), bool),
        jnp.asarray([[64, 64, 1, 1]], jnp.float32),
        jnp.ones((B, T), jnp.int32), jnp.zeros((B, T), jnp.int32),
        jnp.ones((B, T), bool), jnp.full((B,), 5, jnp.int32))
    _assert_bijective(model, init_batch, ckpt)

    with open(cfg.DATASET.ANSWER_VOCAB_FILE) as f:
        vocab = [l.strip() for l in f if l.strip()]
    out = str(tmp_path / "vqa_answers.json")
    answers = test_net_vqa(cfg, ckpt, vocab, out, mode="test")
    assert len(answers) == 4
    assert all("question_id" in a and a["answer"] in vocab for a in answers)
    assert json.load(open(out)) == answers


def test_refcoco_reference_model_to_result(ref_env, vocab_dir, tmp_path):
    """Reference RefCOCO ResNetVLBERT (resnet50 e2e, MVRC-transform head)
    -> .model -> convert -> test_net_refcoco pred-box json."""
    import torch

    import jax.numpy as jnp

    from tests.test_data_pipeline import _write_refcoco_fixture
    from vlbert_tpu.engine.test import test_net_refcoco
    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.utils.config import default_config

    vdir, vocab_size = vocab_dir

    from refcoco.function.config import config as ref_cfg_global

    rc = deepcopy(ref_cfg_global)
    n = rc.NETWORK
    n.BLIND = False
    n.IMAGE_FEAT_PRECOMPUTED = False
    n.IMAGE_NUM_LAYERS = 50
    n.IMAGE_PRETRAINED = ""
    n.IMAGE_FINAL_DIM = HID
    n.IMAGE_SEMANTIC = False
    n.IMAGE_FROZEN_BN = True
    n.ENABLE_CNN_REG_LOSS = False
    n.BERT_MODEL_NAME = vdir
    n.BERT_PRETRAINED = ""
    _tiny_ref_vlbert(n.VLBERT, vocab_size)

    from refcoco.modules.resnet_vlbert_for_refcoco import \
        ResNetVLBERT as RefRef

    torch.manual_seed(0)
    ckpt = str(tmp_path / "ref_refcoco.model")
    _save_ref_model(RefRef(rc), ckpt)

    data_dir = _write_refcoco_fixture(tmp_path)
    cfg = default_config("refcoco")
    cfg.MODULE = "ResNetVLBERT"
    cfg.DATASET.DATASET = "refcoco+"
    cfg.DATASET.DATASET_PATH = str(data_dir)
    cfg.DATASET.ROOT_PATH = str(tmp_path)
    cfg.DATASET.TEST_ANNOTATION_FILE = "ann.jsonl"
    cfg.DATASET.TEST_IMAGE_SET = "test"
    cfg.NETWORK.BERT_MODEL_NAME = vdir
    _tiny_my_vlbert(cfg, vocab_size)
    cfg.NETWORK.IMAGE_NUM_LAYERS = 50
    cfg.NETWORK.IMAGE_SEMANTIC = False
    cfg.NETWORK.IMAGE_FROZEN_BN = True
    cfg.SCALES = [32, 48]
    cfg.TEST.BATCH_IMAGES = 1
    cfg.TPU.MAX_TEXT_LEN = 12
    cfg.TPU.MAX_BOXES = 8

    model = build_module(cfg, "refcoco", dtype=jnp.float32)
    B, O, T, IMG = 1, 4, 12, 32
    init_batch = (
        jnp.zeros((B, IMG, IMG, 3)), jnp.zeros((B, O, 4)),
        jnp.ones((B, O), bool), jnp.asarray([[IMG, IMG, 1, 1]], jnp.float32),
        jnp.ones((B, T), jnp.int32), jnp.ones((B, T), bool))
    _assert_bijective(model, init_batch, ckpt)

    out = str(tmp_path / "refcoco_preds.json")
    preds, acc = test_net_refcoco(cfg, ckpt, out, mode="test")
    assert len(preds) >= 1
    assert all(len(p["pred_box"]) == 4 for p in preds)
    assert os.path.exists(out)


def test_raw_resnet_warm_start(ref_env, vocab_dir, tmp_path):
    """resnet101-pt-vgbua-style RAW ResNet state dict (conv1/bn1/layerL.K.*)
    -> full backbone + conv5 ROI-head warm start. ref: the resnet ctor loads
    the whole dict (common/fast_rcnn.py:55-61) and init_weight copies the
    layer4.* rows into the ROI head (:115-121). Exercises the engine path
    NETWORK.IMAGE_PRETRAINED -> apply_warm_starts."""
    import torch

    import jax
    import jax.numpy as jnp

    from common.backbone.resnet.resnet import resnet50   # reference ctor
    from vlbert_tpu.engine.train import apply_warm_starts, warm_start_paths
    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.training.checkpoint import flatten_params
    from vlbert_tpu.training.loop import TrainState
    from vlbert_tpu.utils.config import default_config

    torch.manual_seed(0)
    net = resnet50(pretrained=False, expose_stages=[5])
    sd = {k: v for k, v in net.state_dict().items()}
    prefix = str(tmp_path / "resnet50-pt-test")
    torch.save(sd, prefix + "-0000.model")

    vdir, vocab_size = vocab_dir
    cfg = default_config("refcoco")
    cfg.MODULE = "ResNetVLBERT"
    cfg.NETWORK.BERT_MODEL_NAME = vdir
    _tiny_my_vlbert(cfg, vocab_size)
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = False
    cfg.NETWORK.IMAGE_NUM_LAYERS = 50
    cfg.NETWORK.IMAGE_SEMANTIC = False
    cfg.NETWORK.IMAGE_PRETRAINED = prefix
    cfg.NETWORK.IMAGE_PRETRAINED_EPOCH = 0

    # path resolution mirrors the reference's '{prefix}-{epoch:04d}.model'
    lang, img = warm_start_paths(cfg)
    assert img == prefix + "-0000.model"
    assert lang is None   # vocab-only dir: no pytorch_model.bin

    model = build_module(cfg, "refcoco", dtype=jnp.float32)
    B, O, T, IMG = 1, 4, 12, 32
    init_batch = (
        jnp.zeros((B, IMG, IMG, 3)), jnp.zeros((B, O, 4)),
        jnp.ones((B, O), bool), jnp.asarray([[IMG, IMG, 1, 1]], jnp.float32),
        jnp.ones((B, T), jnp.int32), jnp.ones((B, T), bool))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        *init_batch, train=False)
    state = TrainState(params=params, opt_state=None,
                       step=jnp.zeros((), jnp.int32))
    before = flatten_params(jax.device_get(state.params["params"]))
    state2 = apply_warm_starts(state, cfg)
    after = flatten_params(jax.device_get(state2.params["params"]))

    # every visual-tower tensor (backbone + conv5 roi head) is overwritten
    visual = [k for k in after
              if ".backbone." in k or ".roi_head." in k]
    assert len(visual) > 100
    changed = [k for k in visual if not np.array_equal(before[k], after[k])]
    missed = sorted(set(visual) - set(changed))
    # FrozenBatchNorm 'var' init is ones and torch init is ones too — allow
    # only exact-same-init leaves to be unchanged; conv kernels MUST change
    assert all(".var" in k or ".mean" in k or "bn" in k or ".scale" in k
               for k in missed), missed[:8]
    conv_kernels = [k for k in visual if k.endswith(".kernel")]
    assert all(k in changed for k in conv_kernels), \
        sorted(set(conv_kernels) - set(changed))[:8]

    # numeric spot check: conv1 kernel = torch conv1.weight in HWIO
    w_ref = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    k_conv1 = [k for k in visual if k.endswith("backbone.conv1.kernel")]
    assert len(k_conv1) == 1
    np.testing.assert_allclose(after[k_conv1[0]], w_ref, rtol=0, atol=0)

    # roi head layer4 block 0 conv1 = torch layer4.0.conv1.weight
    w4 = sd["layer4.0.conv1.weight"].numpy().transpose(2, 3, 1, 0)
    k4 = [k for k in visual if k.endswith("roi_head.layer4.block_0.conv1.kernel")]
    assert len(k4) == 1
    np.testing.assert_allclose(after[k4[0]], w4, rtol=0, atol=0)


def test_bert_warm_start_from_model_dir(ref_env, vocab_dir, tmp_path):
    """BERT_MODEL_NAME dir containing pytorch_model.bin -> language warm
    start of the vlbert tree (ref module ctor fallback,
    vcr/modules/resnet_vlbert_for_vcr.py:25-33), gated on VLBERT.from_scratch."""
    import shutil

    import torch

    import jax
    import jax.numpy as jnp

    from vlbert_tpu.engine.train import apply_warm_starts, warm_start_paths
    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.training.checkpoint import flatten_params
    from vlbert_tpu.training.loop import TrainState
    from vlbert_tpu.utils.config import default_config

    vdir, vocab_size = vocab_dir
    bdir = tmp_path / "bert-tiny-uncased"
    bdir.mkdir()
    shutil.copy(os.path.join(vdir, "vocab.txt"), bdir / "vocab.txt")

    # synthesize bert.* weights at the tiny geometry
    torch.manual_seed(1)
    sd = {
        "bert.embeddings.word_embeddings.weight": torch.randn(vocab_size, HID),
        "bert.embeddings.position_embeddings.weight": torch.randn(MAXPOS, HID),
        "bert.embeddings.token_type_embeddings.weight": torch.randn(2, HID),
        "bert.embeddings.LayerNorm.weight": torch.randn(HID),
        "bert.embeddings.LayerNorm.bias": torch.randn(HID),
    }
    for i in range(LAYERS):
        p = f"bert.encoder.layer.{i}."
        for name, shape in [
            ("attention.self.query.weight", (HID, HID)),
            ("attention.self.query.bias", (HID,)),
            ("attention.self.key.weight", (HID, HID)),
            ("attention.self.key.bias", (HID,)),
            ("attention.self.value.weight", (HID, HID)),
            ("attention.self.value.bias", (HID,)),
            ("attention.output.dense.weight", (HID, HID)),
            ("attention.output.dense.bias", (HID,)),
            ("attention.output.LayerNorm.weight", (HID,)),
            ("attention.output.LayerNorm.bias", (HID,)),
            ("intermediate.dense.weight", (INTER, HID)),
            ("intermediate.dense.bias", (INTER,)),
            ("output.dense.weight", (HID, INTER)),
            ("output.dense.bias", (HID,)),
            ("output.LayerNorm.weight", (HID,)),
            ("output.LayerNorm.bias", (HID,)),
        ]:
            sd[p + name] = torch.randn(*shape)
    torch.save(sd, bdir / "pytorch_model.bin")

    cfg = default_config("vqa")
    cfg.MODULE = "ResNetVLBERT"
    cfg.NETWORK.BERT_MODEL_NAME = str(bdir)
    _tiny_my_vlbert(cfg, vocab_size)
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    cfg.DATASET.ANSWER_VOCAB_SIZE = 8

    lang, img = warm_start_paths(cfg)
    assert lang == str(bdir / "pytorch_model.bin")
    cfg.NETWORK.VLBERT.from_scratch = True
    assert warm_start_paths(cfg)[0] is None       # from_scratch gates it
    cfg.NETWORK.VLBERT.from_scratch = False

    model = build_module(cfg, "vqa", dtype=jnp.float32)
    B, O, T, F = 1, 4, 10, HID
    init_batch = (
        None, jnp.zeros((B, O, 4 + F)), jnp.ones((B, O), bool),
        jnp.asarray([[64, 64, 1, 1]], jnp.float32),
        jnp.ones((B, T), jnp.int32), jnp.zeros((B, T), jnp.int32),
        jnp.ones((B, T), bool), jnp.full((B,), T - 1, jnp.int32),
        jnp.zeros((B, 8)))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        *init_batch, train=True)
    state = TrainState(params=params, opt_state=None,
                       step=jnp.zeros((), jnp.int32))
    state2 = apply_warm_starts(state, cfg)
    after = flatten_params(jax.device_get(state2.params["params"]))

    we = [k for k in after if k.endswith("vlbert.word_embeddings.embedding")]
    assert len(we) == 1
    np.testing.assert_allclose(
        after[we[0]], sd["bert.embeddings.word_embeddings.weight"].numpy(),
        rtol=0, atol=0)
    # token-type rows: 2-row checkpoint -> row2 duplicated from row1
    tt = [k for k in after if k.endswith("token_type_embeddings.embedding")]
    ttv = after[tt[0]]
    ref_tt = sd["bert.embeddings.token_type_embeddings.weight"].numpy()
    np.testing.assert_allclose(ttv[:2], ref_tt)
    np.testing.assert_allclose(ttv[2], ref_tt[1])
    # encoder layer weights land transposed (torch [out,in] -> flax [in,out])
    q = [k for k in after if k.endswith("layer_0.attention.self.query.kernel")]
    assert len(q) == 1
    np.testing.assert_allclose(
        after[q[0]], sd["bert.encoder.layer.0.attention.self.query.weight"]
        .numpy().T, rtol=0, atol=0)
