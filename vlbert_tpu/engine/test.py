"""test_net — inference drivers producing leaderboard files.

ref: vqa/function/test.py (answers json :74-81), vcr/function/test.py (csv
with per-choice probs :101-115), refcoco/function/test.py (pred-box json +
local IoU@0.5 accuracy :20-97).
"""

from __future__ import annotations

import csv
import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from vlbert_tpu.data.build import make_dataloader
from vlbert_tpu.data.tokenization import BertTokenizer
from vlbert_tpu.models.task_modules import build_module
from vlbert_tpu.parallel.mesh import make_mesh, shard_batch
from vlbert_tpu.training import checkpoint as ckpt_lib

logger = logging.getLogger(__name__)


def _load_params(config, state_params, ckpt_path):
    if ckpt_path.endswith((".model", ".bin", ".pt", ".pth")) \
            and not _is_native(ckpt_path):
        from vlbert_tpu.training.convert import (fuse_qkv_params,
                                                 load_torch_or_native_checkpoint)

        flat = load_torch_or_native_checkpoint(ckpt_path)
        if config.TPU.get("FUSED_QKV", False):
            flat = fuse_qkv_params(flat)
        new_params, loaded = ckpt_lib.partial_load(
            jax.device_get(state_params["params"]), flat)
        logger.info("loaded %d tensors from %s", len(loaded), ckpt_path)
        return {**state_params, "params": new_params}
    payload = ckpt_lib.load_checkpoint(ckpt_path)
    import flax.serialization

    params = flax.serialization.from_state_dict(
        jax.device_get(state_params), payload["params"])
    return params


def _is_native(path):
    try:
        with open(path, "rb") as f:
            head = f.read(2)
        # torch zip checkpoints start with PK; msgpack maps with 0x8n/0xde
        return head[:2] != b"PK" and head[0] >= 0x80
    except OSError:
        return False


def run_inference(config, task, ckpt_path, mode="test", output_dir="."):
    """Shared inference loop; returns list of per-example output dicts."""
    mesh = make_mesh(config.TPU.MESH_SHAPE, config.TPU.MESH_AXES)
    tokenizer = BertTokenizer.from_pretrained(config.NETWORK.BERT_MODEL_NAME)
    dtype = jnp.bfloat16 if config.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    model = build_module(config, task, dtype=dtype)
    loader = make_dataloader(config, task, mode, tokenizer)

    sample = next(iter(loader))
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}
    n_label = 0 if mode == "test" else 1
    init_batch = sample if mode == "test" else sample[:-1]
    params = model.init(init_rngs, *init_batch, train=False)
    params = _load_params(config, params, ckpt_path)

    infer = jax.jit(lambda p, *b: model.apply(p, *b, train=False))

    results = []
    with mesh:
        for batch in loader:
            b = shard_batch(batch if mode == "test" else batch[:-1], mesh)
            out = jax.device_get(infer(params, *b))
            results.append(out)
    return results, loader


def test_net_vqa(config, ckpt_path, answer_vocab, output_path, mode="test"):
    """VQA leaderboard json: [{'question_id', 'answer'}] (ref vqa test :74-81)."""
    results, loader = run_inference(config, "vqa", ckpt_path, mode)
    answers = []
    db = loader.dataset.database
    i = 0
    for out in results:
        logits = out["label_logits"]
        pred = np.argmax(logits, axis=1)
        for p in pred:
            if i < len(db):
                answers.append({"question_id": db[i].get("question_id", i),
                                "answer": answer_vocab[int(p)]})
            i += 1
    with open(output_path, "w") as f:
        json.dump(answers, f)
    logger.info("wrote %d answers to %s", len(answers), output_path)
    return answers


def test_net_vcr(config, ckpt_path, output_path, mode="test"):
    """VCR csv with per-choice probabilities (ref vcr test :101-115)."""
    results, loader = run_inference(config, "vcr", ckpt_path, mode)
    rows = []
    i = 0
    db = loader.dataset.database
    for out in results:
        logits = np.asarray(out["label_logits"], np.float32)
        probs = np.exp(logits - logits.max(1, keepdims=True))
        probs /= probs.sum(1, keepdims=True)
        for p in probs:
            if i < len(db):
                rows.append([db[i].get("annot_id", i)] + p.tolist())
            i += 1
    with open(output_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["annot_id"] + [f"answer_{k}" for k in range(probs.shape[1])])
        w.writerows(rows)
    logger.info("wrote %d rows to %s", len(rows), output_path)
    return rows


def test_net_refcoco(config, ckpt_path, output_path, mode="val"):
    """RefCOCO+ predicted boxes json + local IoU@0.5 accuracy
    (ref refcoco test :20-97)."""
    from vlbert_tpu.data.datasets.refcoco import bbox_iou

    results, loader = run_inference(config, "refcoco", ckpt_path, mode)
    db = loader.dataset.database
    preds = []
    n_correct, n_total = 0, 0
    i = 0
    for out in results:
        boxes = np.asarray(out["pred_boxes"], np.float32)
        for pb in boxes:
            if i < len(db):
                preds.append({"pred_box": pb.tolist()})
                gt = db[i].get("gt_box")
                if gt is not None:
                    iou = bbox_iou(pb[None], np.asarray(gt, np.float32))
                    n_correct += int(iou[0] > 0.5)
                    n_total += 1
            i += 1
    with open(output_path, "w") as f:
        json.dump(preds, f)
    acc = n_correct / max(n_total, 1)
    logger.info("RefCOCO local accuracy@0.5: %.4f (%d)", acc, n_total)
    return preds, acc
