"""Checkpoint-converter tests: HF BERT -> VL-BERT numerics through the
converter, and ResNet/FastRCNN name-mapping coverage."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vlbert_tpu.models.vlbert import VisualLinguisticBert, VLBertConfig
from vlbert_tpu.training.checkpoint import flatten_params, partial_load
from vlbert_tpu.training.convert import (
    convert_bert_checkpoint, convert_state_dict, map_reference_name,
    normalize_torch_name)

HID, HEADS, LAYERS, INTER, VOCAB = 48, 4, 2, 96, 200


def test_bert_checkpoint_conversion_numerics():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    hf_cfg = HFBertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
        max_position_embeddings=64, type_vocab_size=2,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = HFBertModel(hf_cfg).eval()

    sd = {f"bert.{k}": v for k, v in hf.state_dict().items()}
    flat, skipped = convert_bert_checkpoint(sd)

    cfg = VLBertConfig(
        vocab_size=VOCAB, hidden_size=HID, visual_size=HID,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        visual_ln=True, visual_scale_text_init=1.0,
        visual_scale_object_init=1.0, with_pooler=True,
        position_padding_idx=-1)
    model = VisualLinguisticBert(cfg)

    B, T, O = 2, 10, 1
    rng = np.random.default_rng(0)
    ids = rng.integers(5, VOCAB, (B, T)).astype(np.int32)
    tt = np.zeros((B, T), np.int32)
    tve = np.zeros((B, T, HID), np.float32)   # zero visual -> pure BERT text
    tmask = np.ones((B, T), bool)
    ove = np.zeros((B, O, 2 * HID), np.float32)
    omask = np.zeros((B, O), bool)            # no objects attended

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(tt), jnp.asarray(tve), jnp.asarray(tmask),
                        jnp.asarray(ove), jnp.asarray(omask))
    # prefix flat keys with nothing: VisualLinguisticBert is the root here,
    # converter emits 'vlbert.'-prefixed paths
    flat_local = {k[len("vlbert."):]: v for k, v in flat.items()
                  if k.startswith("vlbert.")}
    new_params, loaded = partial_load(
        jax.device_get(params["params"]), flat_local)
    # every encoder (16/layer) / embedding (3+2 LN) / pooler (2) tensor
    # loaded; only VL-specific params (end_embedding, visual_ln_*) are new
    assert len(loaded) == 16 * LAYERS + 7, sorted(
        set(flatten_params(jax.device_get(params["params"]))) - set(loaded))

    # visual_ln with scale 1 and zero visual input adds LayerNorm(0)=bias=0
    # contribution... NOT zero in general: LN of a zero vector is 0*scale+bias
    # = bias, and bias inits to 0 -> contribution is exactly 0. END token and
    # masked object slots don't affect text positions (masked attention).
    seq, pooled = model.apply({"params": new_params}, jnp.asarray(ids),
                              jnp.asarray(tt), jnp.asarray(tve),
                              jnp.asarray(tmask), jnp.asarray(ove),
                              jnp.asarray(omask),
                              output_text_and_object_separately=False)

    with torch.no_grad():
        hf_out = hf(torch.from_numpy(ids.astype(np.int64)),
                    attention_mask=torch.ones(B, T, dtype=torch.long),
                    token_type_ids=torch.from_numpy(tt.astype(np.int64)))

    # text positions must match the true BERT to fp32 tolerance. Note the
    # END token attends into text in our model but text positions also
    # attend to END -- so outputs differ unless END is masked out. Compare
    # only how much END influences: we instead zero the END influence by
    # comparing against a second reference... simpler: END IS part of the
    # VL-BERT architecture; for pure-BERT parity we mask it by running with
    # all objects masked AND checking the first-layer pre-attention
    # embeddings, plus the converter shapes above. Here we check the
    # EMBEDDING output strictly:
    emb, mask = model.apply({"params": new_params}, jnp.asarray(ids),
                            jnp.asarray(tt), jnp.asarray(tve),
                            jnp.asarray(tmask), jnp.asarray(ove),
                            jnp.asarray(omask),
                            method=VisualLinguisticBert.embedding)
    with torch.no_grad():
        hf_emb = hf.embeddings(torch.from_numpy(ids.astype(np.int64)),
                               token_type_ids=torch.from_numpy(tt.astype(np.int64)))
    np.testing.assert_allclose(np.asarray(emb)[:, :T], hf_emb.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_bert_encoder_through_converter():
    """Encoder weights through the converter reproduce HF encoder outputs."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig
    from transformers.models.bert.modeling_bert import BertEncoder as HFBertEncoder

    from vlbert_tpu.models.bert import BertEncoder

    hf_cfg = HFBertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
        attn_implementation="eager")
    torch.manual_seed(1)
    hf = HFBertEncoder(hf_cfg).eval()

    sd = {f"vlbert.encoder.{k}": v for k, v in hf.state_dict().items()}
    flat, skipped = convert_state_dict(sd)
    assert not skipped

    enc = BertEncoder(num_layers=LAYERS, num_heads=HEADS, hidden_size=HID,
                      intermediate_size=INTER, hidden_act="gelu",
                      attention_dropout=0.0, hidden_dropout=0.0,
                      initializer_range=0.02)
    B, L = 2, 7
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, HID)).astype(np.float32)
    bias = np.zeros((B, 1, 1, L), np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(bias))
    flat_local = {k[len("vlbert.encoder."):]: v for k, v in flat.items()}
    new_params, loaded = partial_load(jax.device_get(params["params"]),
                                      flat_local)
    assert len(loaded) == len(flatten_params(jax.device_get(params["params"])))

    ours = np.asarray(enc.apply({"params": new_params}, jnp.asarray(x),
                                jnp.asarray(bias)))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(x),
                    attention_mask=torch.zeros(B, 1, 1, L)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_resnet_name_mapping_coverage():
    """Reference-style FastRCNN torch names map onto existing flax paths."""
    from vlbert_tpu.models.fast_rcnn import FastRCNN

    m = FastRCNN(image_feat_precomputed=False, num_layers=18,
                 final_dim=16, image_semantic=True, enable_cnn_reg_loss=True)
    B, O = 1, 2
    params = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, 64, 64, 3)), jnp.asarray([[[1, 1, 30, 30], [2, 2, 40, 40]]],
                                               jnp.float32),
        jnp.ones((B, O), bool), jnp.asarray([[64, 64, 1, 1]], jnp.float32),
        jnp.zeros((B, O), jnp.int32))
    flax_paths = set(flatten_params(jax.device_get(params["params"])))

    torch_names = [
        "module.image_feature_extractor.backbone.conv1.weight",
        "module.image_feature_extractor.backbone.bn1.weight",
        "module.image_feature_extractor.backbone.bn1.bias",
        "module.image_feature_extractor.backbone.bn1.running_mean",
        "module.image_feature_extractor.backbone.bn1.running_var",
        "module.image_feature_extractor.backbone.bn1.num_batches_tracked",
        "module.image_feature_extractor.backbone.layer1.0.conv1.weight",
        "module.image_feature_extractor.backbone.layer1.0.bn2.running_var",
        "module.image_feature_extractor.backbone.layer2.0.downsample.0.weight",
        "module.image_feature_extractor.backbone.layer2.0.downsample.1.running_mean",
        "module.image_feature_extractor.roi_head_feature_extractor.0.conv1.weight",
        "module.image_feature_extractor.roi_head_feature_extractor.0.downsample.1.weight",
        "module.image_feature_extractor.obj_downsample.1.weight",
        "module.image_feature_extractor.obj_downsample.1.bias",
        "module.image_feature_extractor.object_embed.weight",
        "module.image_feature_extractor.regularizing_predictor.weight",
        "module.image_feature_extractor.regularizing_predictor.bias",
    ]
    for tn in torch_names:
        mapped = map_reference_name(normalize_torch_name(tn))
        if tn.endswith("num_batches_tracked"):
            assert mapped is None
            continue
        assert mapped is not None, tn
        tgt, tf = mapped
        # FastRCNN is the tree root in this test; the converter emits paths
        # relative to the full task module
        local = tgt.replace("image_feature_extractor.", "")
        assert local in flax_paths, (tn, local)


def test_vlbert_task_checkpoint_names():
    """vlbert._module./DDP/gamma-beta era names normalize + map."""
    cases = {
        "module.vlbert._module.word_embeddings.weight":
            "vlbert.word_embeddings.embedding",
        "module.vlbert._module.encoder.layer.3.attention.output.LayerNorm.gamma":
            "vlbert.encoder.layer_3.attention.output_LayerNorm.scale",
        "module.vlbert._module.embedding_LayerNorm.beta":
            "vlbert.embedding_LayerNorm.bias",
        "module.vlbert.relationsip_head.caption_image_relationship.weight":
            "vlbert.relationship_head.caption_image_relationship.kernel",
        "module.final_mlp.1.weight": "final_mlp.dense_0.kernel",
        "module.final_mlp.4.bias": "final_mlp.dense_1.bias",
        "module.object_linguistic_embeddings.weight":
            "object_linguistic_embeddings.embedding",
    }
    for src, tgt in cases.items():
        mapped = map_reference_name(normalize_torch_name(src))
        assert mapped is not None, src
        assert mapped[0] == tgt, (src, mapped[0], tgt)


def test_mlm_transform_to_classifier():
    from vlbert_tpu.training.convert import mlm_transform_to_classifier

    flat = {"mlm_head.transform.dense.kernel": np.ones((4, 4)),
            "mlm_head.transform.LayerNorm.scale": np.ones(4),
            "other.key": np.zeros(2)}
    out = mlm_transform_to_classifier(flat)
    assert "final_mlp.transform_dense.kernel" in out
    assert "final_mlp.transform_LayerNorm.scale" in out
    assert "other.key" in out


def test_align_vlbert_nesting():
    """Task trees hold the encoder at 'vlbert.'; the pretrain tree nests it
    at 'vlbert.bert.' with heads staying at 'vlbert.<head>'. The aligner
    adapts flat checkpoints in BOTH directions; without it pretrain warm
    starts silently loaded zero encoder weights."""
    from vlbert_tpu.training.convert import align_vlbert_nesting

    flat_task_style = {
        "vlbert.encoder.layer_0.attention.self.query.kernel": 1,
        "vlbert.word_embeddings.embedding": 2,
        "vlbert.mlm_head.transform.dense.kernel": 3,
        "final_mlp.dense_0.kernel": 4,
    }
    pretrain_tree = {"vlbert": {"bert": {"encoder": {}},
                                "mlm_head": {}}}
    out = align_vlbert_nesting(flat_task_style, pretrain_tree)
    assert "vlbert.bert.encoder.layer_0.attention.self.query.kernel" in out
    assert "vlbert.bert.word_embeddings.embedding" in out
    assert "vlbert.mlm_head.transform.dense.kernel" in out   # head untouched
    assert "final_mlp.dense_0.kernel" in out

    flat_pretrain_style = {
        "vlbert.bert.encoder.layer_0.output_dense.kernel": 1,
        "vlbert.mvrc_head.transform_dense.kernel": 2,
    }
    task_tree = {"vlbert": {"encoder": {}}}
    out = align_vlbert_nesting(flat_pretrain_style, task_tree)
    assert "vlbert.encoder.layer_0.output_dense.kernel" in out
    assert "vlbert.mvrc_head.transform_dense.kernel" in out


def test_mlm_transform_accepts_prefixed_keys():
    """convert_bert_checkpoint emits the MLM head under 'vlbert.'; the
    mlm-classifier warm start must find it there (shipped VQA mlm configs
    silently loaded nothing before)."""
    import numpy as np

    from vlbert_tpu.training.convert import mlm_transform_to_classifier

    flat = {"vlbert.mlm_head.transform.dense.kernel": np.ones((4, 4)),
            "vlbert.mlm_head.transform.dense.bias": np.ones(4)}
    out = mlm_transform_to_classifier(flat)
    assert "final_mlp.transform_dense.kernel" in out
    assert "final_mlp.transform_dense.bias" in out


def test_tp_rules_cover_fused_and_scanned_kernels():
    """param_sharding_rules shards fused 'qkv' and scan-stacked [L,in,out]
    kernels over the model axis (the product-default layouts)."""
    import numpy as np

    import jax
    from vlbert_tpu.parallel.mesh import make_mesh, param_sharding_rules

    mesh = make_mesh([4, 2], ("data", "model"))
    params = {
        "encoder": {
            "layer_0": {"attention": {"self": {"qkv": {
                "kernel": np.zeros((64, 192))}}}},
            "layers": {"layer": {"intermediate_dense": {
                "kernel": np.zeros((12, 64, 128))},
                "output_dense": {"kernel": np.zeros((12, 128, 64))}}},
        },
        "word_embeddings": {"embedding": np.zeros((100, 64))},
    }
    rules = param_sharding_rules(mesh, params)
    assert "model" in str(
        rules["encoder"]["layer_0"]["attention"]["self"]["qkv"]["kernel"].spec)
    assert "model" in str(
        rules["encoder"]["layers"]["layer"]["intermediate_dense"]["kernel"].spec)
    assert "model" in str(
        rules["encoder"]["layers"]["layer"]["output_dense"]["kernel"].spec)
    assert "model" not in str(
        rules["word_embeddings"]["embedding"].spec)
