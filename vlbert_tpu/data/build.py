"""Dataloader factory: cfg -> (transform, dataset, collator, loader).

ref: pretrain/data/build.py:43-127 (mode -> annotation file / batch size /
shuffle; DATASET_CATALOGS registry; make_dataloaders clones cfg per
sub-dataset for multitask pretraining).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from vlbert_tpu.data.datasets.coco_captions import COCOCaptionsDataset
from vlbert_tpu.data.datasets.conceptual_captions import (
    ConceptualCaptionsDataset, GeneralCorpusDataset, make_corpus_collate,
    make_pretrain_collate)
from vlbert_tpu.data.datasets.refcoco import RefCOCODataset, make_refcoco_collate
from vlbert_tpu.data.datasets.vcr import VCRDataset, make_vcr_collate
from vlbert_tpu.data.datasets.vqa import VQADataset, make_vqa_collate
from vlbert_tpu.data.loader import DataLoader, MultiTaskLoader
from vlbert_tpu.data.tokenization import BertTokenizer
from vlbert_tpu.data.transforms import build_transforms

DATASET_CATALOG = {
    "conceptual_captions": ConceptualCaptionsDataset,
    "coco_captions": COCOCaptionsDataset,  # live COCO json index
    "general_corpus": GeneralCorpusDataset,
    "vcr": VCRDataset,
    "vqa": VQADataset,
    "refcoco+": RefCOCODataset,
    "refcoco": RefCOCODataset,
}


def _mode_fields(cfg, mode):
    d = cfg.DATASET if not isinstance(cfg.DATASET, list) else cfg.DATASET[0]
    if mode == "train":
        return d.TRAIN_ANNOTATION_FILE, d.TRAIN_IMAGE_SET, cfg.TRAIN.BATCH_IMAGES, cfg.TRAIN.SHUFFLE
    if mode == "val":
        return d.VAL_ANNOTATION_FILE, d.VAL_IMAGE_SET, cfg.VAL.BATCH_IMAGES, cfg.VAL.SHUFFLE
    return d.TEST_ANNOTATION_FILE, d.TEST_IMAGE_SET, cfg.TEST.BATCH_IMAGES, cfg.TEST.SHUFFLE


def make_dataloader(cfg, task, mode="train", tokenizer=None, dataset_cfg=None,
                    num_replicas=None, rank=None, worker_share=1,
                    dataset_index=0):
    """Build one loader. Per-host input sharding replaces DistributedSampler
    (SURVEY §2.6): each JAX process loads its shard."""
    d = dataset_cfg if dataset_cfg is not None else cfg.DATASET
    if d.get("CACHE_MODE", False):
        # the reference also rejects it: `assert not cache_mode, 'currently
        # not support cache mode!'` (conceptual_captions.py:47)
        raise NotImplementedError(
            "DATASET.CACHE_MODE (whole-dataset RAM cache) is not supported, "
            "matching the reference's own assert")
    if d.get("QA2R_AUG", False):
        # reference: `assert not qa2r_aug, "Not implemented!"` (vcr.py:62)
        raise NotImplementedError("DATASET.QA2R_AUG is not implemented, "
                                  "matching the reference's own assert")
    ann_file, image_set, batch_images, shuffle = _mode_fields(cfg, mode)
    if isinstance(batch_images, (list, tuple)):
        # list-valued BATCH_IMAGES = per-sub-dataset batch sizes for the
        # multitask pretrain (ref pretrain/data/build.py:108-127); each
        # sub-loader takes its own entry
        batch_images = batch_images[min(dataset_index,
                                        len(batch_images) - 1)]
    # BATCH_IMAGES is per-device (reference: per-GPU, ref build.py:49-55);
    # one host process feeds all its local devices, and accumulation steps
    # arrive in the same host batch ([accum*micro] flat, reshaped by fit())
    batch_images = batch_images * jax.local_device_count()
    if mode == "train":
        batch_images *= max(int(cfg.TRAIN.GRAD_ACCUMULATE_STEPS), 1)
    num_replicas = num_replicas if num_replicas is not None else jax.process_count()
    rank = rank if rank is not None else jax.process_index()

    tokenizer = tokenizer or BertTokenizer.from_pretrained(
        cfg.NETWORK.BERT_MODEL_NAME)
    name = d.DATASET
    # uint8-on-the-wire path (ops/image_norm.py). The CC/COCO pretrain
    # datasets zero masked-RoI pixels in NORMALIZED space (ref
    # conceptual_captions.py:201-206), which uint8 can't express — they
    # keep host normalization when that path is active.
    device_norm = (cfg.TPU.get("DEVICE_IMAGE_NORM", True)
                   and not cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED)
    if name in ("conceptual_captions", "coco_captions") \
            and cfg.NETWORK.MASK_RAW_PIXELS:
        device_norm = False
    transform = build_transforms(cfg, mode, device_norm=device_norm)
    test_mode = mode == "test"
    ds_cls = DATASET_CATALOG[name]
    common = dict(
        ann_file=ann_file, image_set=image_set, root_path=d.ROOT_PATH,
        data_path=d.DATASET_PATH, tokenizer=tokenizer, transform=transform,
        test_mode=test_mode, zip_mode=d.ZIP_MODE,
        add_image_as_a_box=d.ADD_IMAGE_AS_A_BOX,
        seq_len=d.get("SEQ_LEN", 64),
    )
    max_text = cfg.TPU.MAX_TEXT_LEN
    max_boxes = cfg.TPU.MAX_BOXES

    if name in ("conceptual_captions", "coco_captions"):
        # zero-image fallback fill = rounded PIXEL_MEANS back in RGB order,
        # so the normalized fallback is ~0.0 (reference zeroes AFTER
        # normalization, ref conceptual_captions.py:122-128)
        means_bgr = cfg.NETWORK.PIXEL_MEANS or (102.9801, 115.9465, 122.7717)
        fill_rgb = tuple(int(round(float(m))) for m in means_bgr[::-1])
        ds = ds_cls(
            fallback_fill_rgb=fill_rgb,
            with_precomputed_visual_feat=cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED,
            mask_raw_pixels=cfg.NETWORK.MASK_RAW_PIXELS,
            with_rel_task=cfg.NETWORK.WITH_REL_LOSS,
            with_mlm_task=cfg.NETWORK.WITH_MLM_LOSS,
            with_mvrc_task=cfg.NETWORK.WITH_MVRC_LOSS, **common)
        collate = make_pretrain_collate(
            max_text, max_boxes, cfg.NETWORK.VLBERT.visual_region_classes,
            precomputed_dim=d.get("PRECOMPUTED_FEAT_DIM", 2048)
            if cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED else 0)
    elif name == "general_corpus":
        ds = ds_cls(ann_file=ann_file, tokenizer=tokenizer,
                    seq_len=d.get("SEQ_LEN", 64),
                    min_seq_len=d.get("MIN_SEQ_LEN", 64))
        collate = make_corpus_collate(max_text)
    elif name == "vcr":
        ds = ds_cls(task=d.TASK,
                    only_use_relevant_dets=d.ONLY_USE_RELEVANT_DETS,
                    mask_size=(d.MASK_SIZE, d.MASK_SIZE),
                    basic_align=d.BASIC_ALIGN, qa2r_noq=d.QA2R_NOQ,
                    cache_db=(rank == 0),  # ref build.py: only rank 0 writes
                    ignore_db_cache=d.get("IGNORE_DB_CACHE", True), **common)
        collate = make_vcr_collate(
            tokenizer, max_text, max_boxes,
            mask_size=(d.MASK_SIZE, d.MASK_SIZE),
            answer_first=cfg.NETWORK.get("ANSWER_FIRST", False),
            one_sent=cfg.NETWORK.get("QA_ONE_SENT", False),
            test_mode=test_mode, task=d.TASK)
    elif name == "vqa":
        ds = ds_cls(answer_vocab_file=d.ANSWER_VOCAB_FILE,
                    with_precomputed_visual_feat=cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED,
                    boxes=d.get("BOXES", "36"),
                    use_imdb=d.get("USE_IMDB", True), **common)
        collate = make_vqa_collate(
            tokenizer, max_text, max_boxes,
            precomputed_dim=d.get("PRECOMPUTED_FEAT_DIM", 2048)
            if cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED else 0,
            test_mode=test_mode)
    elif name in ("refcoco", "refcoco+"):
        boxes_field = {"train": "TRAIN_BOXES", "val": "VAL_BOXES",
                       "test": "TEST_BOXES"}[mode]
        ds = ds_cls(boxes=d.get(boxes_field, "gt"),
                    proposal_source=d.get("PROPOSAL_SOURCE", "official"),
                    **common)
        collate = make_refcoco_collate(tokenizer, max_text, max_boxes,
                                       test_mode=test_mode)
    else:
        raise ValueError(f"unknown dataset {name!r}")

    n_workers = cfg.NUM_WORKERS_PER_GPU * jax.local_device_count()
    # cap by host cores: on small hosts extra worker processes only add
    # IPC + context-switch cost (measured on 1 CPU: 0 workers 50 img/s vs
    # 4 workers 39 img/s, bench_host.py); single-core hosts use the
    # in-process thread path. worker_share (>1 for multitask sub-loaders
    # running concurrently) divides the core budget so the loaders don't
    # jointly oversubscribe the host.
    n_cpus = os.cpu_count() or 1
    n_workers = min(n_workers, max((n_cpus - 1) // max(worker_share, 1), 0))
    use_procs = cfg.TPU.get("PROCESS_WORKERS", True) and n_workers > 0
    return DataLoader(ds, batch_images, collate,
                      shuffle=shuffle and mode == "train",
                      num_replicas=num_replicas, rank=rank,
                      seed=max(cfg.RNG_SEED, 0),
                      drop_last=(mode == "train"),
                      prefetch=cfg.TPU.get("PREFETCH_DEPTH", 2),
                      # single-thread fallback: GIL caps thread scaling at
                      # ~1.5x anyway (bench_host.py) and >1 thread makes
                      # shared-RNG augmentation draw order nondeterministic
                      num_threads=1,
                      # fork-pool workers (reference: torch DataLoader
                      # NUM_WORKERS_PER_GPU processes); GIL-bound threads
                      # don't scale on this path — see data/loader.py
                      num_workers=n_workers if use_procs else 0,
                      aspect_grouping=(mode == "train"
                                       and cfg.TRAIN.ASPECT_GROUPING),
                      # decorrelates multitask sub-loaders' RNG streams
                      # (they share cfg.RNG_SEED and epoch)
                      loader_id=dataset_index)


def make_multitask_dataloader(cfg, task, mode="train", tokenizer=None):
    """Pretrain list-DATASET: master + aux loaders zipped
    (ref pretrain/data/build.py:108-127)."""
    assert isinstance(cfg.DATASET, list)
    loaders = []
    for i, ds_cfg in enumerate(cfg.DATASET):
        sub = cfg.clone()
        sub.DATASET = ds_cfg
        loaders.append(make_dataloader(sub, task, mode, tokenizer,
                                       dataset_cfg=ds_cfg,
                                       worker_share=len(cfg.DATASET),
                                       dataset_index=i))
    return MultiTaskLoader(loaders)
