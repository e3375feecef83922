"""Torch-checkpoint -> flax-params conversion.

Handles the reference's three naming eras (SURVEY §7.3):
  * TF-style 'gamma'/'beta' LayerNorm names (ref visual_linguistic_bert.py:
    257-260),
  * 'bert.'/'roberta.' prefixes of language-pretrained checkpoints
    (ref :249-256),
  * 'module.' (DDP) and 'vlbert._module.' (TimeDistributed) nesting of task
    checkpoints (ref vcr/function/train.py:202-229,
    common/utils/load.py:5-17).

Layout transforms: torch Linear [out, in] -> flax kernel [in, out];
torch Conv2d [out, in, kh, kw] -> flax NHWC kernel [kh, kw, in, out];
BatchNorm running stats -> FrozenBatchNorm mean/var params.

The output is a flat {dot.path: np.ndarray} in THIS framework's naming,
consumable by training/checkpoint.partial_load.
"""

from __future__ import annotations

import re

import numpy as np


def _t(x):
    return np.ascontiguousarray(np.asarray(x).T)


def _conv(x):
    return np.ascontiguousarray(np.transpose(np.asarray(x), (2, 3, 1, 0)))


# --------------------------------------------------------------- name rules

def normalize_torch_name(name):
    """Strip DDP/TimeDistributed wrappers, fix TF-era LN names, and the
    reference's 'relationsip' typo."""
    name = re.sub(r"^module\.", "", name)
    name = name.replace("vlbert._module.", "vlbert.")
    name = name.replace(".gamma", ".weight_ln").replace(".beta", ".bias_ln")
    name = name.replace("relationsip_head", "relationship_head")
    return name


def map_reference_name(name):
    """Map a normalized reference param name to (flax_path, transform).

    Returns None for buffers/params with no counterpart.
    transform in {'linear', 'conv', 'none'}.
    """
    n = name

    # ---- LayerNorm weight/bias (incl. TF-era renames) ----
    n = n.replace(".weight_ln", ".weight").replace(".bias_ln", ".bias")

    # ---- BERT encoder layers ----
    m = re.search(r"encoder\.layer\.(\d+)\.(.*)", n)
    if m:
        i, rest = m.group(1), m.group(2)
        prefix = n[: m.start()] + f"encoder.layer_{i}."
        table = {
            "attention.self.query.weight": ("attention.self.query.kernel", "linear"),
            "attention.self.query.bias": ("attention.self.query.bias", "none"),
            "attention.self.key.weight": ("attention.self.key.kernel", "linear"),
            "attention.self.key.bias": ("attention.self.key.bias", "none"),
            "attention.self.value.weight": ("attention.self.value.kernel", "linear"),
            "attention.self.value.bias": ("attention.self.value.bias", "none"),
            "attention.output.dense.weight": ("attention.output_dense.kernel", "linear"),
            "attention.output.dense.bias": ("attention.output_dense.bias", "none"),
            "attention.output.LayerNorm.weight": ("attention.output_LayerNorm.scale", "none"),
            "attention.output.LayerNorm.bias": ("attention.output_LayerNorm.bias", "none"),
            "intermediate.dense.weight": ("intermediate_dense.kernel", "linear"),
            "intermediate.dense.bias": ("intermediate_dense.bias", "none"),
            "output.dense.weight": ("output_dense.kernel", "linear"),
            "output.dense.bias": ("output_dense.bias", "none"),
            "output.LayerNorm.weight": ("output_LayerNorm.scale", "none"),
            "output.LayerNorm.bias": ("output_LayerNorm.bias", "none"),
        }
        if rest.replace("weight_ln", "weight").replace("bias_ln", "bias") in table:
            tgt, tf = table[rest.replace("weight_ln", "weight").replace("bias_ln", "bias")]
            return prefix + tgt, tf
        return None

    # ---- embeddings / pooler / visual fusion in VisualLinguisticBert ----
    simple = [
        (r"word_embeddings\.weight$", "word_embeddings.embedding", "none"),
        (r"special_word_embeddings\.weight$", "special_word_embeddings.embedding", "none"),
        (r"end_embedding\.weight$", "end_embedding.embedding", "none"),
        (r"position_embeddings\.weight$", "position_embeddings.embedding", "none"),
        (r"token_type_embeddings\.weight$", "token_type_embeddings.embedding", "none"),
        (r"embedding_LayerNorm\.weight$", "embedding_LayerNorm.scale", "none"),
        (r"embedding_LayerNorm\.bias$", "embedding_LayerNorm.bias", "none"),
        (r"visual_ln_text\.weight$", "visual_ln_text.scale", "none"),
        (r"visual_ln_text\.bias$", "visual_ln_text.bias", "none"),
        (r"visual_ln_object\.weight$", "visual_ln_object.scale", "none"),
        (r"visual_ln_object\.bias$", "visual_ln_object.bias", "none"),
        (r"visual_scale_text$", "visual_scale_text", "none"),
        (r"visual_scale_object$", "visual_scale_object", "none"),
        (r"visual_1x1_text\.weight$", "visual_1x1_text.kernel", "linear"),
        (r"visual_1x1_text\.bias$", "visual_1x1_text.bias", "none"),
        (r"visual_1x1_object\.weight$", "visual_1x1_object.kernel", "linear"),
        (r"visual_1x1_object\.bias$", "visual_1x1_object.bias", "none"),
        (r"pooler\.dense\.weight$", "pooler.dense.kernel", "linear"),
        (r"pooler\.dense\.bias$", "pooler.dense.bias", "none"),
        (r"object_linguistic_embeddings\.weight$",
         "object_linguistic_embeddings.embedding", "none"),
        (r"object_mask_visual_embedding\.weight$", "object_mask_visual_embedding", "squeeze0"),
        (r"object_mask_word_embedding\.weight$", "object_mask_word_embedding", "squeeze0"),
        (r"aux_text_visual_embedding\.weight$", "aux_text_visual_embedding", "squeeze0"),
    ]
    for pat, tgt, tf in simple:
        m = re.search(pat, n)
        if m:
            return n[: m.start()] + tgt, tf

    # ---- pretraining heads ----
    heads = [
        (r"mlm_head\.predictions\.transform\.dense\.weight$",
         "mlm_head.transform.dense.kernel", "linear"),
        (r"mlm_head\.predictions\.transform\.dense\.bias$",
         "mlm_head.transform.dense.bias", "none"),
        (r"mlm_head\.predictions\.transform\.LayerNorm\.weight$",
         "mlm_head.transform.LayerNorm.scale", "none"),
        (r"mlm_head\.predictions\.transform\.LayerNorm\.bias$",
         "mlm_head.transform.LayerNorm.bias", "none"),
        (r"mlm_head\.predictions\.bias$", "mlm_head.bias", "none"),
        (r"mvrc_head\.transform\.dense\.weight$",
         "mvrc_head.transform_dense.kernel", "linear"),
        (r"mvrc_head\.transform\.dense\.bias$",
         "mvrc_head.transform_dense.bias", "none"),
        (r"mvrc_head\.region_cls_pred\.weight$",
         "mvrc_head.region_cls_pred.kernel", "linear"),
        (r"mvrc_head\.region_cls_pred\.bias$",
         "mvrc_head.region_cls_pred.bias", "none"),
        (r"relationship_head\.caption_image_relationship\.weight$",
         "relationship_head.caption_image_relationship.kernel", "linear"),
        (r"relationship_head\.caption_image_relationship\.bias$",
         "relationship_head.caption_image_relationship.bias", "none"),
    ]
    for pat, tgt, tf in heads:
        m = re.search(pat, n)
        if m:
            return n[: m.start()] + tgt, tf

    # ---- task classifier heads (Sequential index -> named layers) ----
    cls = [
        (r"final_mlp\.1\.weight$", "final_mlp.dense_0.kernel", "linear"),
        (r"final_mlp\.1\.bias$", "final_mlp.dense_0.bias", "none"),
        (r"final_mlp\.4\.weight$", "final_mlp.dense_1.kernel", "linear"),
        (r"final_mlp\.4\.bias$", "final_mlp.dense_1.bias", "none"),
        # refcoco / mlm-classifier style: [0]=transform, [2]=linear
        (r"final_mlp\.0\.dense\.weight$", "final_mlp_transform.dense.kernel", "linear"),
        (r"final_mlp\.0\.dense\.bias$", "final_mlp_transform.dense.bias", "none"),
        (r"final_mlp\.0\.LayerNorm\.weight$", "final_mlp.transform_LayerNorm.scale", "none"),
        (r"final_mlp\.0\.LayerNorm\.bias$", "final_mlp.transform_LayerNorm.bias", "none"),
        (r"final_mlp\.2\.weight$", "final_mlp_fc.kernel", "linear"),
        (r"final_mlp\.2\.bias$", "final_mlp_fc.bias", "none"),
        (r"cnn_loss_reg\.0\.dense\.weight$", "cnn_loss_reg_transform.dense.kernel", "linear"),
        (r"cnn_loss_reg\.0\.dense\.bias$", "cnn_loss_reg_transform.dense.bias", "none"),
        (r"cnn_loss_reg\.2\.weight$", "cnn_loss_reg_fc.kernel", "linear"),
        (r"cnn_loss_reg\.2\.bias$", "cnn_loss_reg_fc.bias", "none"),
    ]
    for pat, tgt, tf in cls:
        m = re.search(pat, n)
        if m:
            return n[: m.start()] + tgt, tf

    # ---- FastRCNN non-resnet parts (must precede the resnet rules:
    # 'obj_downsample.1.' would otherwise match 'downsample.1.') ----
    if re.search(r"obj_downsample\.1\.weight$", n):
        return n.replace("obj_downsample.1.weight", "obj_downsample.kernel"), "linear"
    if re.search(r"obj_downsample\.1\.bias$", n):
        return n.replace("obj_downsample.1.bias", "obj_downsample.bias"), "none"
    if re.search(r"object_embed\.weight$", n):
        return n.replace("object_embed.weight", "object_embed.embedding"), "none"
    if re.search(r"regularizing_predictor\.weight$", n):
        return n.replace("regularizing_predictor.weight",
                         "regularizing_predictor.kernel"), "linear"
    if re.search(r"regularizing_predictor\.bias$", n):
        return n, "none"

    # ---- ResNet backbone / ROI head ----
    if "backbone." in n or "roi_head_feature_extractor" in n:
        return _map_resnet_name(n)

    return None


def _map_resnet_name(n):
    """torch resnet names -> our ResNetC4Backbone/ResNetRoIHead tree."""
    # roi head: roi_head_feature_extractor.K.* == roi_head.layer4.block_K.*
    n2 = re.sub(r"roi_head_feature_extractor\.(\d+)\.",
                r"roi_head.layer4.block_\1.", n)
    # backbone blocks: backbone.layerL.K. -> backbone.layerL.block_K.
    n2 = re.sub(r"backbone\.layer(\d)\.(\d+)\.", r"backbone.layer\1.block_\2.", n2)

    # downsample: downsample.0 = conv, downsample.1 = bn
    n2 = n2.replace("downsample.0.", "downsample_conv.")
    n2 = n2.replace("downsample.1.", "downsample_bn.")

    if re.search(r"conv\d?\.weight$", n2) or n2.endswith("downsample_conv.weight"):
        return n2.replace(".weight", ".kernel"), "conv"
    # BatchNorm -> FrozenBatchNorm
    for src, tgt in ((".weight", ".scale"), (".bias", ".bias"),
                     (".running_mean", ".mean"), (".running_var", ".var")):
        if re.search(r"(bn\d|downsample_bn)" + re.escape(src) + "$", n2):
            return re.sub(re.escape(src) + "$", tgt, n2), "none"
    if n2.endswith("num_batches_tracked"):
        return None
    return None


def convert_state_dict(sd):
    """torch state_dict -> flat {flax.dot.path: np.ndarray} (this naming)."""
    out = {}
    skipped = []
    for name, tensor in sd.items():
        arr = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") \
            else np.asarray(tensor)
        mapped = map_reference_name(normalize_torch_name(name))
        if mapped is None:
            skipped.append(name)
            continue
        tgt, tf = mapped
        if tf == "linear":
            arr = _t(arr)
        elif tf == "conv":
            arr = _conv(arr)
        elif tf == "squeeze0":
            arr = np.asarray(arr)[0]
        out[tgt] = arr
    return out, skipped


def convert_bert_checkpoint(sd, target_prefix="vlbert."):
    """Language-pretrained BERT (bert.* / roberta.* keys) -> VL-BERT tree
    (ref visual_linguistic_bert.py:243-309 incl. token-type row duplication
    for single-type checkpoints)."""
    remapped = {}
    for k, v in sd.items():
        if k.startswith("bert."):
            k = k[len("bert."):]
        elif k.startswith("roberta."):
            k = k[len("roberta."):]
        elif k.startswith("cls.predictions."):
            k = "mlm_head.predictions." + k[len("cls.predictions."):]
        elif k.startswith("cls.seq_relationship."):
            k = "relationship_head.caption_image_relationship." \
                + k[len("cls.seq_relationship."):]
        else:
            continue
        k = k.replace("embeddings.word_embeddings", "word_embeddings")
        k = k.replace("embeddings.position_embeddings", "position_embeddings")
        k = k.replace("embeddings.token_type_embeddings", "token_type_embeddings")
        k = k.replace("embeddings.LayerNorm", "embedding_LayerNorm")
        remapped[target_prefix + k if not k.startswith("mlm_head")
                 and not k.startswith("relationship_head")
                 else target_prefix + k] = v

    flat, skipped = convert_state_dict(remapped)

    # token-type row duplication (ref :276-286): single-row checkpoints get
    # rows 1 and 2 copied from row 0; 2-row checkpoints get row 2 = row 1
    tt = flat.get(f"{target_prefix}token_type_embeddings.embedding")
    if tt is not None and tt.shape[0] < 3:
        rows = [tt[0], tt[0], tt[0]] if tt.shape[0] == 1 \
            else [tt[0], tt[1], tt[1]]
        flat[f"{target_prefix}token_type_embeddings.embedding"] = np.stack(rows)
    return flat, skipped


def convert_raw_resnet_checkpoint(sd, target_prefix="image_feature_extractor."):
    """Raw torchvision-style ResNet state dict (conv1./bn1./layerL.K.*) ->
    backbone + conv5 ROI-head warm start.

    ref semantics: the backbone loads the whole dict (resnet ctor w/
    pretrained_model_path, common/fast_rcnn.py:55-61 +
    common/backbone/resnet/resnet.py:201-215) and the ROI head loads the
    layer4.* rows of the SAME checkpoint (FastRCNN.init_weight,
    common/fast_rcnn.py:115-121). Our C4 backbone holds stem + layer1..3;
    layer4 maps only onto the ROI head.
    """
    remapped = {}
    for k, v in sd.items():
        if k.startswith("fc.") or k.endswith("num_batches_tracked"):
            continue
        if k.startswith("layer4."):
            remapped[target_prefix + "roi_head_feature_extractor."
                     + k[len("layer4."):]] = v
        else:
            remapped[target_prefix + "backbone." + k] = v
    return convert_state_dict(remapped)


TORCH_CKPT_SUFFIXES = (".model", ".bin", ".pt", ".pth")


def load_torch_blob(path):
    """torch.load + state_dict extraction (the one place this happens)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    return blob.get("state_dict", blob) if isinstance(blob, dict) else blob


def convert_torch_state_dict(sd):
    """Detect raw-BERT vs reference VL-BERT names and convert to flat
    {flax.path: array}."""
    if any(k.startswith("bert.") or k.startswith("roberta.")
           for k in sd.keys()):
        flat, _ = convert_bert_checkpoint(sd)
    else:
        flat, _ = convert_state_dict(sd)
    return flat


def apply_reference_prefix_changes(sd, prefix_changes):
    """PARTIAL_PRETRAIN_PREFIX_CHANGES on RAW torch checkpoint names,
    exactly as the reference applies them BEFORE loading
    (ref vcr/function/train.py:202-214): first matching rule wins, keys
    matching no rule pass through unchanged."""
    if not prefix_changes:
        return sd
    out = {}
    for k, v in sd.items():
        for old, new in prefix_changes:
            if k.startswith(old):
                out[new + k[len(old):]] = v
                break
        else:
            out[k] = v
    return out


# reference-era prefix rules -> this framework's flax naming, for prefix
# changes applied to NATIVE checkpoints (whose keys are already flax paths).
# The DDP/TimeDistributed renames are identities here (normalize_torch_name
# collapses them); the mvrc->cnn_loss_reg remap translates submodule paths.
_NATIVE_RULE_TRANSLATION = {
    ("vlbert", "vlbert._module"): None,                      # identity
    ("vlbert.mvrc_head.transform", "cnn_loss_reg.0"):
        ("vlbert.mvrc_head.transform_dense", "cnn_loss_reg_transform.dense"),
}


def translate_prefix_rules_for_native(prefix_changes):
    """Translate reference-era PARTIAL_PRETRAIN_PREFIX_CHANGES for use on a
    native (flax-named) checkpoint. Unknown rules pass through verbatim
    (assumed already written in flax naming)."""
    out = []
    for old, new in prefix_changes:
        o = old[len("module."):] if old.startswith("module.") else old
        n = new[len("module."):] if new.startswith("module.") else new
        if (o, n) in _NATIVE_RULE_TRANSLATION:
            tr = _NATIVE_RULE_TRANSLATION[(o, n)]
            if tr is not None and tr not in out:
                out.append(tr)
        elif (o, n) not in out:
            out.append((o, n))
    return out


def checkpoint_format(path):
    """Classify a checkpoint file: 'torch' | 'native' (flax msgpack) |
    'npz' (tools/convert_checkpoint.py output).

    Suffixes are ambiguous — '.model' is both the reference torch format
    and this framework's native save, and torch>=1.6 zips share the PK
    header with numpy's .npz — so classify by content: PK zips with
    'data.pkl' are torch, PK zips of .npy members are npz, legacy pickles
    (0x80 + protocol byte) are torch, everything else is native msgpack.
    """
    import zipfile

    try:
        with open(path, "rb") as f:
            head = f.read(4)
    except OSError:
        return "native"
    if head[:2] == b"PK":
        try:
            with zipfile.ZipFile(path) as z:
                names = z.namelist()
            if any(n.endswith("data.pkl") for n in names):
                return "torch"
            if names and all(n.endswith(".npy") for n in names):
                return "npz"
        except zipfile.BadZipFile:
            pass
        return "torch"
    if len(head) >= 2 and head[0] == 0x80 and head[1] <= 0x05:
        return "torch"      # legacy (pre-1.6) torch pickle
    return "native"


def load_npz_checkpoint(path):
    """tools/convert_checkpoint.py output: flat {flax.dot.path: array}."""
    import numpy as np

    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


VLBERT_HEAD_PREFIXES = ("mlm_head", "relationship_head", "mvrc_head")


def align_vlbert_nesting(flat, params_tree):
    """Align 'vlbert.*' keys with the target tree's nesting.

    Task models hold the encoder directly under 'vlbert.'; the PRETRAIN
    model nests it one level deeper as 'vlbert.bert.' (task_modules wraps
    VisualLinguisticBertForPretraining as name='vlbert', whose base model
    is name='bert', models/vlbert.py) with the pretraining heads staying at
    'vlbert.<head>'. Converter output uses the task-style flat form; native
    checkpoints carry whichever tree produced them. Without this step a
    pretrain warm start (or a task fine-tune from a native pretrain
    checkpoint) silently loads no encoder/embedding weights.
    """
    vl = params_tree.get("vlbert") if isinstance(params_tree, dict) else None
    tree_nested = isinstance(vl, dict) and "bert" in vl
    out = {}
    for k, v in flat.items():
        if k.startswith("vlbert."):
            rest = k[len("vlbert."):]
            is_head = rest.startswith(VLBERT_HEAD_PREFIXES)
            if tree_nested and not rest.startswith("bert.") and not is_head:
                k = "vlbert.bert." + rest
            elif not tree_nested and rest.startswith("bert."):
                k = "vlbert." + rest[len("bert."):]
        out[k] = v
    return out


def load_torch_or_native_checkpoint(path):
    """Load a checkpoint file into a flat {flax.path: array} dict.

    Accepts: reference '.model' ({'state_dict': ...}), raw torch bin
    (pytorch_model.bin), tools/convert_checkpoint.py '.npz' output, or
    this framework's native msgpack checkpoints — classified by CONTENT
    (checkpoint_format), never by suffix alone.
    """
    fmt = checkpoint_format(path)
    if fmt == "npz":
        return load_npz_checkpoint(path)
    if fmt == "torch":
        return convert_torch_state_dict(load_torch_blob(path))
    # native msgpack
    from vlbert_tpu.training.checkpoint import flatten_params, load_checkpoint

    payload = load_checkpoint(path)
    return flatten_params(payload["params"].get("params", payload["params"]))


def fuse_qkv_params(flat):
    """Merge separate q/k/v projection tensors into fused 'qkv' entries for
    models built with fused_qkv=True (models/bert.py). Kernel layout: flax
    [in, out] concatenated on the output dim in (q, k, v) order — matching
    jnp.split(qkv, 3, axis=-1)."""
    out = {}
    pending = {}
    for k, v in flat.items():
        m = re.search(r"(.*attention\.self\.)(query|key|value)\.(kernel|bias)$", k)
        if not m:
            out[k] = v
            continue
        prefix, which, kind = m.groups()
        pending.setdefault((prefix, kind), {})[which] = v
    for (prefix, kind), parts in pending.items():
        if set(parts) != {"query", "key", "value"}:
            # incomplete triple: pass through untouched
            for which, v in parts.items():
                out[f"{prefix}{which}.{kind}"] = v
            continue
        axis = 1 if kind == "kernel" else 0
        out[f"{prefix}qkv.{kind}"] = np.concatenate(
            [parts["query"], parts["key"], parts["value"]], axis=axis)
    return out


def stack_layer_params(flat, num_layers):
    """Stack per-layer 'encoder.layer_{i}.' tensors into the scan layout
    'encoder.layers.layer.' with a leading [num_layers] axis
    (models/bert.py scan_layers=True)."""
    out = {}
    groups = {}
    for k, v in flat.items():
        m = re.search(r"^(.*?)layer_(\d+)\.(.*)$", k)
        if not m:
            out[k] = v
            continue
        prefix, idx, rest = m.groups()
        groups.setdefault((prefix, rest), {})[int(idx)] = v
    for (prefix, rest), items in groups.items():
        assert len(items) == num_layers, (prefix, rest, sorted(items))
        out[f"{prefix}layers.layer.{rest}"] = np.stack(
            [items[i] for i in range(num_layers)])
    return out


def mlm_transform_to_classifier(flat):
    """VQA 'mlm' classifier warm start (ref vqa module init_weight :97-111):
    map the BERT MLM prediction transform onto the classifier's transform.

    Input keys as produced by convert_bert_checkpoint ('mlm_head.transform.*');
    adds 'final_mlp.transform_dense.*' / 'final_mlp.transform_LayerNorm.*'.
    """
    mapping = {
        "mlm_head.transform.dense.kernel": "final_mlp.transform_dense.kernel",
        "mlm_head.transform.dense.bias": "final_mlp.transform_dense.bias",
        "mlm_head.transform.LayerNorm.scale": "final_mlp.transform_LayerNorm.scale",
        "mlm_head.transform.LayerNorm.bias": "final_mlp.transform_LayerNorm.bias",
    }
    out = dict(flat)
    for src, dst in mapping.items():
        # converters emit the head under the 'vlbert.' prefix (and native
        # pretrain checkpoints under 'vlbert.bert.'-less head paths); accept
        # any nesting of the source key
        for k in (src, "vlbert." + src, "vlbert.bert." + src):
            if k in flat:
                out[dst] = flat[k]
                break
    return out
