"""THE parity test: run the actual reference torch VisualLinguisticBert (from
/root/reference, pure-torch import path) and this framework's model with
CONVERTER-mapped identical weights on identical inputs, and compare the
text/object/pooled outputs at every live position.

This validates, against the reference's own code: the static-layout
reformulation of the seamless concat (position ids, token types, END token,
masking), the encoder numerics, the visual LN/scale fusion, the pretraining
heads, and the checkpoint converter's name/layout mapping — the whole chain
the ±0.3% eval-parity target depends on.

Skipped when /root/reference is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    # the reference's file_utils imports boto3/requests/tqdm at module
    # scope; stub them (never used on this code path), and UNDO the stubs on
    # teardown so later real imports (transformers needs requests/tqdm)
    # still work
    added = []
    for mod in ("boto3", "requests", "tqdm"):
        m = types.ModuleType(mod)
        if mod == "tqdm":
            m.tqdm = lambda x, **k: x
        if mod not in sys.modules:
            sys.modules[mod] = m
            added.append(mod)
    be = types.ModuleType("botocore.exceptions")
    be.ClientError = Exception
    for name, m in (("botocore", types.ModuleType("botocore")),
                    ("botocore.exceptions", be)):
        if name not in sys.modules:
            sys.modules[name] = m
            added.append(name)
    sys.path.insert(0, REF)
    from common import visual_linguistic_bert as ref_vlb

    yield ref_vlb
    for name in added:
        sys.modules.pop(name, None)
    sys.path.remove(REF)


HID, HEADS, LAYERS, INTER, VOCAB, MAXPOS = 64, 4, 3, 128, 400, 128


def _ref_config(visual_ln):
    return types.SimpleNamespace(
        vocab_size=VOCAB, hidden_size=HID, visual_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=INTER, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=MAXPOS, type_vocab_size=3,
        initializer_range=0.02, visual_scale_text_init=1.0,
        visual_scale_object_init=1.0, visual_ln=visual_ln,
        word_embedding_frozen=False, pos_embedding_frozen=False,
        obj_pos_id_relative=True,
        with_pooler=True, position_padding_idx=-1,
        visual_region_classes=13)


def _my_config(visual_ln):
    from vlbert_tpu.models.vlbert import VLBertConfig

    return VLBertConfig(
        vocab_size=VOCAB, hidden_size=HID, visual_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=MAXPOS,
        type_vocab_size=3, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, visual_ln=visual_ln,
        visual_scale_text_init=1.0, visual_scale_object_init=1.0,
        with_pooler=True, position_padding_idx=-1,
        visual_region_classes=13)


def _inputs(rng, B=3, T=11, O=5):
    text_lens = rng.integers(3, T + 1, B)
    text_lens[0] = T
    obj_lens = rng.integers(1, O + 1, B)
    ids = rng.integers(5, VOCAB, (B, T)).astype(np.int64)
    tt = rng.integers(0, 2, (B, T)).astype(np.int64)
    tve = rng.normal(size=(B, T, HID)).astype(np.float32)
    tmask = (np.arange(T)[None] < text_lens[:, None])
    ove = rng.normal(size=(B, O, 2 * HID)).astype(np.float32)
    omask = (np.arange(O)[None] < obj_lens[:, None])
    # zero padded inputs like real collators do
    ids = ids * tmask
    tve = tve * tmask[..., None]
    ove = ove * omask[..., None]
    return ids, tt, tve, tmask, ove, omask, text_lens, obj_lens


@pytest.mark.parametrize("visual_ln", [True, False])
def test_vlbert_matches_reference(ref_modules, visual_ln, rng):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from vlbert_tpu.models.vlbert import VisualLinguisticBert
    from vlbert_tpu.training.checkpoint import partial_load
    from vlbert_tpu.training.convert import convert_state_dict

    torch.manual_seed(0)
    ref = ref_modules.VisualLinguisticBert(_ref_config(visual_ln)).eval()

    sd = {f"vlbert.{k}": v for k, v in ref.state_dict().items()}
    flat, skipped = convert_state_dict(sd)
    assert not [s for s in skipped if "position_ids" not in s], skipped

    mine = VisualLinguisticBert(_my_config(visual_ln))
    ids, tt, tve, tmask, ove, omask, text_lens, obj_lens = _inputs(rng)
    params = mine.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                       jnp.asarray(tt, jnp.int32), jnp.asarray(tve),
                       jnp.asarray(tmask), jnp.asarray(ove),
                       jnp.asarray(omask))
    flat_local = {k[len("vlbert."):]: v for k, v in flat.items()}
    new_params, loaded = partial_load(jax.device_get(params["params"]),
                                      flat_local)
    from vlbert_tpu.training.checkpoint import flatten_params

    n_all = len(flatten_params(jax.device_get(params["params"])))
    assert len(loaded) == n_all, (n_all, len(loaded))

    t_out, o_out, pooled = mine.apply(
        {"params": new_params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(tt, jnp.int32), jnp.asarray(tve), jnp.asarray(tmask),
        jnp.asarray(ove), jnp.asarray(omask),
        output_text_and_object_separately=True)

    with torch.no_grad():
        rt, ro, rp = ref(
            torch.from_numpy(ids), torch.from_numpy(tt),
            torch.from_numpy(tve), torch.from_numpy(tmask),
            torch.from_numpy(ove), torch.from_numpy(omask),
            output_all_encoded_layers=False,
            output_text_and_object_separately=True)

    t_out, o_out, pooled = map(np.asarray, (t_out, o_out, pooled))
    rt, ro, rp = rt.numpy(), ro.numpy(), rp.numpy()

    for b in range(ids.shape[0]):
        np.testing.assert_allclose(
            t_out[b, :text_lens[b]], rt[b, :text_lens[b]],
            rtol=5e-4, atol=5e-5,
            err_msg=f"text outputs diverge (b={b}, visual_ln={visual_ln})")
        np.testing.assert_allclose(
            o_out[b, :obj_lens[b]], ro[b, :obj_lens[b]],
            rtol=5e-4, atol=5e-5,
            err_msg=f"object outputs diverge (b={b})")
    np.testing.assert_allclose(pooled, rp, rtol=5e-4, atol=5e-5,
                               err_msg="pooled output diverges")


def test_pretraining_heads_match_reference(ref_modules, rng):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from vlbert_tpu.models.vlbert import VisualLinguisticBertForPretraining
    from vlbert_tpu.training.checkpoint import flatten_params, partial_load
    from vlbert_tpu.training.convert import convert_state_dict

    torch.manual_seed(1)
    ref = ref_modules.VisualLinguisticBertForPretraining(
        _ref_config(True), with_rel_head=True, with_mlm_head=True,
        with_mvrc_head=True).eval()

    # reference nests the base model params at top level; heads beside them
    sd = {f"vlbert.{k}": v for k, v in ref.state_dict().items()}
    flat, skipped = convert_state_dict(sd)
    # the tied mlm decoder weight is skipped (shared with word embeddings)
    leftover = [s for s in skipped if "decoder" not in s]
    assert not leftover, leftover

    mine = VisualLinguisticBertForPretraining(_my_config(True))
    ids, tt, tve, tmask, ove, omask, text_lens, obj_lens = _inputs(rng)
    params = mine.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                       jnp.asarray(tt, jnp.int32), jnp.asarray(tve),
                       jnp.asarray(tmask), jnp.asarray(ove),
                       jnp.asarray(omask))
    # reference base-model params have no prefix; ours nest under 'bert'
    flat_local = {}
    for k, v in flat.items():
        k = k[len("vlbert."):]
        if k.startswith(("relationship_head.", "mlm_head.", "mvrc_head.")):
            flat_local[k] = v
        else:
            flat_local["bert." + k] = v
    new_params, loaded = partial_load(jax.device_get(params["params"]),
                                      flat_local)
    n_all = len(flatten_params(jax.device_get(params["params"])))
    assert len(loaded) == n_all, (n_all, len(loaded))

    rel, mlm, mvrc = mine.apply(
        {"params": new_params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(tt, jnp.int32), jnp.asarray(tve), jnp.asarray(tmask),
        jnp.asarray(ove), jnp.asarray(omask))

    with torch.no_grad():
        r_rel, r_mlm, r_mvrc = ref(
            torch.from_numpy(ids), torch.from_numpy(tt),
            torch.from_numpy(tve), torch.from_numpy(tmask),
            torch.from_numpy(ove), torch.from_numpy(omask))

    np.testing.assert_allclose(np.asarray(rel), r_rel.numpy(),
                               rtol=5e-4, atol=5e-5)
    B, T = ids.shape
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(mlm)[b, :text_lens[b]], r_mlm.numpy()[b, :text_lens[b]],
            rtol=5e-4, atol=3e-4)
        np.testing.assert_allclose(
            np.asarray(mvrc)[b, :obj_lens[b]], r_mvrc.numpy()[b, :obj_lens[b]],
            rtol=5e-4, atol=5e-5)


def test_fast_rcnn_precomputed_matches_reference(ref_modules, rng):
    """FastRCNN precomputed path (coordinate embeddings + class embedding +
    obj_downsample) vs the reference module (CUDA extension stubbed — the
    precomputed path never touches it; ref common/fast_rcnn.py:140-142)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    # stub the CUDA extension module before importing common.fast_rcnn
    stub = types.ModuleType("common.lib.roi_pooling.C_ROIPooling")
    for fn in ("roi_align_forward", "roi_align_backward",
               "roi_pool_forward", "roi_pool_backward"):
        setattr(stub, fn, lambda *a, **k: None)
    sys.modules.setdefault("common.lib.roi_pooling.C_ROIPooling", stub)
    import importlib

    fast_rcnn_ref = importlib.import_module("common.fast_rcnn")

    F = 64
    cfg = types.SimpleNamespace(NETWORK=types.SimpleNamespace(
        IMAGE_FEAT_PRECOMPUTED=True, IMAGE_SEMANTIC=True))
    torch.manual_seed(3)
    ref = fast_rcnn_ref.FastRCNN(cfg, average_pool=True, final_dim=48).eval()
    # reference hardcodes Linear(2*2048+128, ...); rebuild for F-dim feats
    ref.obj_downsample = torch.nn.Sequential(
        torch.nn.Dropout(p=0.1),
        torch.nn.Linear(2 * 2048 + 128 - 2048 + F, 48),
        torch.nn.ReLU(inplace=True),
    ).eval()

    from vlbert_tpu.models.fast_rcnn import FastRCNN
    from vlbert_tpu.training.checkpoint import partial_load
    from vlbert_tpu.training.convert import convert_state_dict

    sd = {f"image_feature_extractor.{k}": v for k, v in ref.state_dict().items()}
    flat, skipped = convert_state_dict(sd)
    assert not skipped, skipped

    mine = FastRCNN(image_feat_precomputed=True, final_dim=48,
                    image_semantic=True)

    B, O = 2, 4
    boxes = np.zeros((B, O, 4 + F), np.float32)
    boxes[..., 0] = rng.uniform(0, 200, (B, O))
    boxes[..., 1] = rng.uniform(0, 150, (B, O))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(20, 100, (B, O))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(20, 100, (B, O))
    boxes[..., 4:] = rng.normal(size=(B, O, F))
    box_mask = np.ones((B, O), bool)
    im_info = np.asarray([[400, 300, 1, 1]] * B, np.float32)
    classes = rng.integers(0, 81, (B, O)).astype(np.float32)

    params = mine.init(jax.random.PRNGKey(0), None, jnp.asarray(boxes),
                       jnp.asarray(box_mask), jnp.asarray(im_info),
                       jnp.asarray(classes, jnp.int32))
    flat_local = {k[len("image_feature_extractor."):]: v
                  for k, v in flat.items()}
    new_params, loaded = partial_load(jax.device_get(params["params"]),
                                      flat_local)
    assert len(loaded) == 3  # object_embed, obj_downsample kernel+bias

    out = mine.apply({"params": new_params}, None, jnp.asarray(boxes),
                     jnp.asarray(box_mask), jnp.asarray(im_info),
                     jnp.asarray(classes, jnp.int32))

    with torch.no_grad():
        ref_out = ref(images=None, boxes=torch.from_numpy(boxes),
                      box_mask=torch.from_numpy(box_mask),
                      im_info=torch.from_numpy(im_info),
                      classes=torch.from_numpy(classes))

    np.testing.assert_allclose(
        np.asarray(out["obj_reps"]), ref_out["obj_reps"].numpy(),
        rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["obj_reps_raw"]), ref_out["obj_reps_raw"].numpy(),
        rtol=1e-5, atol=1e-6)
