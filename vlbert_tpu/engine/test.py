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
    def load_torch():
        from vlbert_tpu.training.convert import (align_vlbert_nesting,
                                                 fuse_qkv_params,
                                                 load_torch_or_native_checkpoint,
                                                 stack_layer_params)

        flat = load_torch_or_native_checkpoint(ckpt_path)
        params_host = jax.device_get(state_params["params"])
        flat = align_vlbert_nesting(flat, params_host)
        if config.TPU.get("FUSED_QKV", False):
            flat = fuse_qkv_params(flat)
        if config.TPU.get("SCAN_LAYERS", False):
            flat = stack_layer_params(
                flat, config.NETWORK.VLBERT.num_hidden_layers)
        new_params, loaded = ckpt_lib.partial_load(params_host, flat)
        logger.info("loaded %d tensors from %s", len(loaded), ckpt_path)
        return {**state_params, "params": new_params}

    def load_native():
        payload = ckpt_lib.load_checkpoint(ckpt_path)
        import flax.serialization

        return flax.serialization.from_state_dict(
            jax.device_get(state_params), payload["params"])

    from vlbert_tpu.training.convert import checkpoint_format

    # content classification shared with the train engine ('.model' is both
    # the reference torch format and this framework's native save; npz is
    # the converter output — load_torch_or_native_checkpoint handles both
    # npz and torch, returning flax-named flats for partial_load)
    if checkpoint_format(ckpt_path) == "native":
        try:
            return load_native()
        except Exception:
            # log before falling back: a genuinely corrupt native file
            # would otherwise surface as an unrelated torch.load error
            logger.warning("native-format load of %s failed; retrying as a "
                           "torch checkpoint", ckpt_path, exc_info=True)
            return load_torch()
    return load_torch()


def _n_labels(config, task, mode):
    if mode == "test":
        return 0
    if task == "vcr" and not isinstance(config.DATASET, list) \
            and config.DATASET.get("TASK") == "Q2AR":
        return 2      # answer_label + rationale_label
    return 1


def setup_inference(config, task, ckpt_path, mode="test"):
    """Build (model, params, jitted infer fn, loader, mesh) for a task.

    Test/val drivers run on ONE process (the reference runs rank-0 test
    with single-process DataParallel, vcr/train_end2end.py:51-56), so the
    mesh spans only this process's devices and the loader is unsharded —
    a global mesh + per-process loader shards would hang rank 0 on the
    collective batch assembly and mislabel every other row.
    """
    mesh = make_mesh(None, ("data",), devices=jax.local_devices())
    tokenizer = BertTokenizer.from_pretrained(config.NETWORK.BERT_MODEL_NAME)
    dtype = jnp.bfloat16 if config.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    model = build_module(config, task, dtype=dtype)
    loader = make_dataloader(config, task, mode, tokenizer,
                             num_replicas=1, rank=0)

    n_label = _n_labels(config, task, mode)
    sample = next(iter(loader))
    init_batch = sample if n_label == 0 else sample[:-n_label]
    if task == "vcr" and config.DATASET.get("TASK") == "QA2R" \
            and mode == "test":
        # conditioned text tensors are [B, A, C, T]; the model sees one
        # conditioning slice [B, C, T] at a time (ref vcr test.py:101-108)
        init_batch = _slice_conditioned(init_batch, 0)
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}
    params = jax.jit(
        lambda r: model.init(r, *init_batch, train=False))(init_rngs)
    params = _load_params(config, params, ckpt_path)

    infer = jax.jit(lambda p, *b: model.apply(p, *b, train=False))
    return model, params, infer, loader, mesh, n_label


def _slice_conditioned(batch, a_id):
    """Select conditioning-answer a_id from [B, A, C, T] text tensors
    (batch slots 5-8: input_ids, token_type_ids, tags, mask)."""
    out = list(batch)
    for k in (5, 6, 7, 8):
        out[k] = batch[k][:, a_id]
    return tuple(out)


def run_inference(config, task, ckpt_path, mode="test", output_dir="."):
    """Shared inference loop; returns list of per-example output dicts."""
    _, params, infer, loader, mesh, n_label = setup_inference(
        config, task, ckpt_path, mode)
    results = []
    with mesh:
        for batch in loader:
            b = shard_batch(batch if n_label == 0 else batch[:-n_label], mesh)
            out = jax.device_get(infer(params, *b))
            results.append(out)
    return results, loader


def test_net_vqa(config, ckpt_path, answer_vocab, output_path, mode="test"):
    """VQA leaderboard json: [{'question_id', 'answer'}] (ref vqa test :74-81)."""
    results, loader = run_inference(config, "vqa", ckpt_path, mode)
    answers = []
    db = loader.dataset.database
    # the dataset's vocab is the one the model indexed against; a separately
    # parsed file could silently desync the leaderboard answer strings
    answer_vocab = getattr(loader.dataset, "answer_vocab", answer_vocab) \
        or answer_vocab
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


def _softmax_np(logits):
    logits = np.asarray(logits, np.float32)
    p = np.exp(logits - logits.max(1, keepdims=True))
    return p / p.sum(1, keepdims=True)


def test_net_vcr(config, ckpt_path, output_path, mode="test"):
    """VCR leaderboard csv (ref vcr/function/test.py:90-135).

    Q2A: 4 columns ``answer_{i}``. QA2R test mode: 4 conditioned passes
    (one per candidate answer, ref :101-115) -> 16 columns
    ``rationale_conditioned_on_a{i}_{j}``. Also saves the raw prob matrix
    as .npy next to the csv (ref :118-121).
    """
    task = config.DATASET.TASK
    assert task in ("Q2A", "QA2R"), \
        f"leaderboard test supports Q2A/QA2R, got {task!r} (ref test.py:116)"
    conditioned = task == "QA2R" and mode == "test"

    _, params, infer, loader, mesh, n_label = setup_inference(
        config, "vcr", ckpt_path, mode)
    db = loader.dataset.database

    all_probs = []
    with mesh:
        for batch in loader:
            data = batch if n_label == 0 else batch[:-n_label]
            if conditioned:
                per_a = []
                for a_id in range(4):
                    b = shard_batch(_slice_conditioned(data, a_id), mesh)
                    out = jax.device_get(infer(params, *b))
                    per_a.append(_softmax_np(out["label_logits"]))
                # [B, 16]: blocks of 4 rationale probs per conditioning answer
                all_probs.append(np.concatenate(per_a, axis=1))
            else:
                b = shard_batch(data, mesh)
                out = jax.device_get(infer(params, *b))
                all_probs.append(_softmax_np(out["label_logits"]))
    probs = np.concatenate(all_probs, axis=0)[: len(db)]

    np.save(os.path.splitext(output_path)[0] + ".npy", probs)
    if conditioned:
        columns = [f"rationale_conditioned_on_a{i}_{j}"
                   for i in range(4) for j in range(4)]
    else:
        columns = [f"answer_{k}" for k in range(probs.shape[1])]
    rows = [[db[i].get("annot_id", i)] + probs[i].tolist()
            for i in range(len(probs))]
    with open(output_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["annot_id"] + columns)
        w.writerows(rows)
    logger.info("wrote %d rows to %s", len(rows), output_path)
    return rows


def do_test(args, config, task):
    """Post-training rank-0 test run behind --do-test
    (ref vcr/train_end2end.py:51-56: rank 0 runs test_net on the best
    checkpoint after training finishes)."""
    if jax.process_index() != 0:
        return None
    train_output = os.path.join(
        config.OUTPUT_PATH or getattr(args, "model_dir", "") or "./output",
        f"{task}_train")
    prefix = config.MODEL_PREFIX or "vlbert_tpu"
    ckpt = getattr(args, "ckpt", "") or os.path.join(
        train_output, f"{prefix}-best.model")
    result_path = getattr(args, "result_path", "") or train_output
    os.makedirs(result_path, exist_ok=True)
    name = getattr(args, "result_name", "") or "result"
    if task == "vcr":
        out = os.path.join(result_path,
                           f"{name}_test_{config.DATASET.TASK}.csv")
        return test_net_vcr(config, ckpt, out, mode="test")
    if task == "vqa":
        with open(config.DATASET.ANSWER_VOCAB_FILE) as f:
            vocab = [l.strip() for l in f if l.strip()]
        out = os.path.join(result_path, f"{name}_vqa2_test.json")
        return test_net_vqa(config, ckpt, vocab, out, mode="test")
    if task == "refcoco":
        out = os.path.join(result_path, f"{name}_refcoco_test.json")
        return test_net_refcoco(config, ckpt, out, mode="test")
    raise ValueError(f"--do-test unsupported for task {task!r}")


def merge_vcr_results(q2a_csv, qa2r_csv, output_path):
    """Join the Q2A and QA2R csvs on annot_id into the final leaderboard
    submission (ref vcr/function/test.py:138-147)."""
    import pandas as pd

    merged = pd.merge(pd.read_csv(q2a_csv), pd.read_csv(qa2r_csv),
                      on="annot_id")
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    merged.to_csv(output_path, index=False)
    logger.info("merged result csv saved to %s", output_path)
    return output_path


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
