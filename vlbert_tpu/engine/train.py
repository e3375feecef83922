"""train_net — the experiment driver (ref: vcr/function/train.py:37-339,
pretrain/function/train.py, parameterized by task instead of copied x4).

Flow preserved: logger + output dir, model build, loaders, optimizer with
LR x global-batch scaling + LR_MULT groups, partial-pretrain warm start with
prefix rewrite + NSP->binary-classifier surgery, AUTO_RESUME, metrics,
Speedometer, per-epoch validation + checkpointing. Distributed init is
jax.distributed (multi-host) + mesh sharding instead of NCCL DDP.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from vlbert_tpu.data.build import make_dataloader, make_multitask_dataloader
from vlbert_tpu.data.tokenization import BertTokenizer
from vlbert_tpu.models.task_modules import build_module
from vlbert_tpu.parallel.mesh import make_mesh
from vlbert_tpu.training import checkpoint as ckpt_lib
from vlbert_tpu.training.loop import create_train_state, fit

logger = logging.getLogger(__name__)


def setup_logger(output_path, rank=0):
    os.makedirs(output_path, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(output_path, f"train_rank{rank}.log")),
        ],
        force=True)


def nsp_to_binary_classifier_surgery(pretrain_flat, config):
    """ref vcr/function/train.py:215-222: final_mlp last layer initialized as
    rel-head row1 - row0 (NSP 'is-match' minus 'not-match')."""
    wkey = "vlbert.relationship_head.caption_image_relationship.kernel"
    bkey = "vlbert.relationship_head.caption_image_relationship.bias"
    if wkey in pretrain_flat and config.NETWORK.get("LOAD_REL_HEAD", False):
        w = np.asarray(pretrain_flat[wkey])       # [H, 2] (flax layout)
        b = np.asarray(pretrain_flat[bkey])       # [2]
        pretrain_flat["final_mlp.dense_1.kernel"] = (w[:, 1:2] - w[:, 0:1])
        pretrain_flat["final_mlp.dense_1.bias"] = (b[1:2] - b[0:1])
    return pretrain_flat


def segmb_init_surgery(flat, config):
    """Segment-B init (ref vcr/function/train.py:223-229, ON in every
    shipped VCR config): pretraining only used token-type 0 for text, VCR
    uses 0/1 — re-init the B row from the A row of the loaded checkpoint."""
    tt_key = "vlbert.token_type_embeddings.embedding"
    if config.NETWORK.get("PARTIAL_PRETRAIN_SEGMB_INIT", False) \
            and tt_key in flat:
        tt = np.array(flat[tt_key])
        tt[1] = tt[0]
        flat[tt_key] = tt
    return flat


def warm_start_paths(config):
    """Language + image warm-start checkpoint paths.

    ref: each task module ctor resolves BERT weights from
    NETWORK.BERT_PRETRAINED ('{prefix}-{epoch:04d}.model') or falls back to
    the BERT_MODEL_NAME archive dir's pytorch_model.bin
    (vcr/modules/resnet_vlbert_for_vcr.py:20-33), gated on
    VLBERT.from_scratch; FastRCNN resolves the ResNet checkpoint from
    NETWORK.IMAGE_PRETRAINED (common/fast_rcnn.py:39-40).
    """
    net = config.NETWORK
    lang = None
    # from_scratch exists only in the pretrain tree (ref pretrain config:88)
    if not net.VLBERT.get("from_scratch", False):
        if net.BERT_PRETRAINED:
            lang = "{}-{:04d}.model".format(net.BERT_PRETRAINED,
                                            int(net.BERT_PRETRAINED_EPOCH))
        elif os.path.isdir(net.BERT_MODEL_NAME):
            cand = os.path.join(net.BERT_MODEL_NAME, "pytorch_model.bin")
            if os.path.isfile(cand):
                lang = cand
    img = None
    if net.IMAGE_PRETRAINED:
        img = "{}-{:04d}.model".format(net.IMAGE_PRETRAINED,
                                       int(net.IMAGE_PRETRAINED_EPOCH))
        if not os.path.isfile(img) and os.path.isfile(net.IMAGE_PRETRAINED):
            img = net.IMAGE_PRETRAINED     # direct path (.model/.npz)
    return lang, img


def apply_warm_starts(state, config, logger=logger):
    """Load language (BERT) and image (ResNet) warm starts into the param
    tree; a later PARTIAL_PRETRAIN overrides overlapping keys, matching the
    reference's ctor-then-train_net order."""
    lang_path, img_path = warm_start_paths(config)
    if not lang_path and not img_path:
        return state
    from vlbert_tpu.training import convert as cvt

    def torch_flat(path, converter):
        # content-sniffed: '.model' is ambiguous between the reference's
        # torch format and this framework's native/npz saves
        if cvt.checkpoint_format(path) != "torch":
            return cvt.load_torch_or_native_checkpoint(path)
        flat, _ = converter(cvt.load_torch_blob(path))
        return flat

    params_host = jax.device_get(state.params["params"])
    if img_path:
        flat = torch_flat(img_path, cvt.convert_raw_resnet_checkpoint)
        params_host, loaded = ckpt_lib.partial_load(params_host, flat)
        logger.info("image warm start %s: %d tensors", img_path, len(loaded))
    if lang_path:
        flat = torch_flat(lang_path, cvt.convert_bert_checkpoint)
        flat = cvt.align_vlbert_nesting(flat, params_host)
        if config.TPU.get("FUSED_QKV", False):
            flat = cvt.fuse_qkv_params(flat)
        if config.TPU.get("SCAN_LAYERS", False):
            flat = cvt.stack_layer_params(
                flat, config.NETWORK.VLBERT.num_hidden_layers)
        params_host, loaded = ckpt_lib.partial_load(params_host, flat)
        logger.info("language warm start %s: %d tensors", lang_path,
                    len(loaded))
    return state.replace(params={**state.params, "params": params_host})


def apply_partial_pretrain(state, config):
    """PARTIAL_PRETRAIN warm start (ref vcr/function/train.py:199-232).

    PREFIX_CHANGES are written in REFERENCE torch naming (e.g.
    'vlbert->vlbert._module' for the TimeDistributed wrap,
    'vlbert.mvrc_head.transform->cnn_loss_reg.0'), and the reference
    applies them to the RAW checkpoint names BEFORE loading. For torch
    checkpoints we do exactly that (rename raw keys, then convert to flax
    paths); applying the reference-era rules to already-converted flax
    names would rename every key to a nonexistent path and load nothing.
    For native (flax-named) checkpoints the rules are translated into this
    framework's naming (the DDP/TimeDistributed renames become identities).
    """
    if not config.NETWORK.PARTIAL_PRETRAIN:
        return state
    from vlbert_tpu.training import convert as cvt

    path = config.NETWORK.PARTIAL_PRETRAIN
    prefix_changes = [tuple(pc.split("->")) for pc in
                      config.NETWORK.PARTIAL_PRETRAIN_PREFIX_CHANGES]
    # content-sniffed (checkpoint_format): this framework's own '.model'
    # (msgpack) and converter '.npz' files carry flax names and take the
    # translated rules; only real torch files take raw-name prefix changes
    if cvt.checkpoint_format(path) == "torch":
        sd = cvt.load_torch_blob(path)
        sd = cvt.apply_reference_prefix_changes(sd, prefix_changes)
        flat = cvt.convert_torch_state_dict(sd)
        load_changes = ()
    else:
        flat = cvt.load_torch_or_native_checkpoint(path)
        load_changes = cvt.translate_prefix_rules_for_native(prefix_changes)
    params_host = jax.device_get(state.params["params"])
    # align 'vlbert.' vs 'vlbert.bert.' nesting with the TARGET tree before
    # the surgeries (which key on the canonical task-style names)
    flat = cvt.align_vlbert_nesting(flat, params_host)
    if config.TPU.get("FUSED_QKV", False):
        flat = cvt.fuse_qkv_params(flat)
    flat = nsp_to_binary_classifier_surgery(flat, config)
    flat = segmb_init_surgery(flat, config)
    if config.NETWORK.get("CLASSIFIER_PRETRAINED", False) \
            and config.NETWORK.CLASSIFIER_TYPE == "mlm":
        flat = cvt.mlm_transform_to_classifier(flat)
    if config.TPU.get("SCAN_LAYERS", False):
        flat = cvt.stack_layer_params(
            flat, config.NETWORK.VLBERT.num_hidden_layers)
    new_params, loaded = ckpt_lib.partial_load(
        params_host, flat, prefix_changes=load_changes)
    logger.info("partial pretrain %s: loaded %d tensors", path, len(loaded))
    return state.replace(params={**state.params, "params": new_params})


def train_net(args, config, task):
    rank = jax.process_index()
    output_path = os.path.join(
        config.OUTPUT_PATH or args.model_dir or "./output",
        f"{task}_train")
    setup_logger(output_path, rank)
    logger.info("config: %s", dict(config))

    mesh = make_mesh(config.TPU.MESH_SHAPE, config.TPU.MESH_AXES)
    logger.info("mesh: %s over %d devices", mesh, jax.device_count())
    if config.TPU.get("RNG_IMPL"):
        jax.config.update("jax_default_prng_impl", config.TPU.RNG_IMPL)
    if config.TPU.get("COMPILE_CACHE_DIR"):
        cache_dir = os.path.expanduser(config.TPU.COMPILE_CACHE_DIR)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    tokenizer = BertTokenizer.from_pretrained(config.NETWORK.BERT_MODEL_NAME)
    # TRAIN.FP16 (reference: Apex AMP O2 + fixed loss scale 128,
    # vcr/function/train.py:322-328): the TPU-native equivalent is bf16 (no
    # loss scaling needed); TPU.FP16_PARITY_MODE opts into true fp16 compute
    # with the reference's static loss scale for parity experiments
    dtype_name = config.TPU.COMPUTE_DTYPE
    if config.TRAIN.FP16:
        if config.TPU.get("FP16_PARITY_MODE", False):
            dtype_name = "float16"
        elif dtype_name != "bfloat16":
            dtype_name = "bfloat16"
        if dtype_name == "bfloat16":
            logger.info("TRAIN.FP16 -> bf16 compute on TPU (no loss scale "
                        "needed); set TPU.FP16_PARITY_MODE for true fp16 + "
                        "static loss scale %s", config.TRAIN.FP16_LOSS_SCALE)
    dtype = {"bfloat16": jnp.bfloat16,
             "float16": jnp.float16}.get(dtype_name, jnp.float32)
    model = build_module(config, task, dtype=dtype, remat=config.TPU.REMAT)

    if task == "pretrain" and isinstance(config.DATASET, list):
        train_loader = make_multitask_dataloader(config, task, "train", tokenizer)
        val_loader = None
    else:
        train_loader = make_dataloader(config, task, "train", tokenizer)
        val_loader = make_dataloader(config, task, "val", tokenizer)

    steps_per_epoch = len(train_loader)
    sample = next(iter(train_loader))
    grad_accum = max(int(config.TRAIN.GRAD_ACCUMULATE_STEPS), 1)
    if grad_accum > 1:
        def split(x):
            if x is None:
                return None
            assert x.shape[0] % grad_accum == 0
            return x.reshape(grad_accum, x.shape[0] // grad_accum, *x.shape[1:])
        sample_init = jax.tree_util.tree_map(lambda x: x[0] if x is not None else None,
                                             jax.tree_util.tree_map(split, sample))
    else:
        sample_init = sample

    state, tx, sched, base_lr = create_train_state(model, sample_init, config,
                                                   steps_per_epoch)

    # startup parameter table (ref common/utils/misc.py:40-67, called from
    # every train.py task entry), split by the optimizer's trainable mask
    from vlbert_tpu.training.optim import trainable_mask
    from vlbert_tpu.utils.misc import summary_parameters

    if rank == 0:
        summary_parameters(state.params["params"],
                           trainable_mask(state.params["params"], config))

    model_prefix = os.path.join(output_path, config.MODEL_PREFIX or "vlbert_tpu")
    # Warm starts are skipped when a resumable checkpoint exists — the
    # resume restores every parameter anyway, and the torch loads cost
    # minutes of I/O per restart on large models. (The reference pays that
    # cost on every restart; skipping is behavior-identical.)
    if ckpt_lib.has_resumable_checkpoint(model_prefix, config):
        logger.info("resumable checkpoint found: skipping BERT/ResNet/"
                    "PARTIAL_PRETRAIN warm starts")
    else:
        # language (BERT) + image (ResNet) warm starts — ref module ctors
        state = apply_warm_starts(state, config)
        state = apply_partial_pretrain(state, config)
    state, begin_epoch, extra = ckpt_lib.smart_resume(
        model_prefix, state, config)

    if jax.process_count() > 1:
        # Multi-host agreement after per-host resume/warm-start decisions
        # (ref: rank-0 NCCL broadcast of begin_epoch, best-val, and params,
        # vcr/function/train.py:267-270,309-319). Without this, checkpoints
        # on per-host disks leave ranks with different params and epoch
        # counts — silently diverged "replicated" state and a hang at the
        # epoch barrier.
        from jax.experimental import multihost_utils as mhu

        begin_epoch = int(mhu.broadcast_one_to_all(np.int64(begin_epoch)))
        bv = extra.get("best_val")
        bv_b = float(mhu.broadcast_one_to_all(
            np.float64(bv if bv is not None else -np.inf)))
        extra = dict(extra)
        extra["best_val"] = None if np.isinf(bv_b) else bv_b
        state = mhu.broadcast_one_to_all(state)

    validation_fn = None
    if val_loader is not None:
        from vlbert_tpu.engine.val import make_validation_fn

        validation_fn = make_validation_fn(model, config, task, mesh)

    # background the serialize+write (seconds per epoch at base size) —
    # readers join the writer, and writes are atomic, so this is invisible
    # except as reclaimed step time; TPU.ASYNC_CHECKPOINT=false restores
    # the reference's fully synchronous save
    async_ckpt = bool(config.TPU.get("ASYNC_CHECKPOINT", True))

    def checkpoint_fn(st, epoch, extra_dict, is_best):
        # under PARTITION_MODE=fsdp/tp on a multi-host mesh the snapshot is
        # a COLLECTIVE gather — every rank must enter save_checkpoint; only
        # rank 0 writes. Pure-DP state (fully addressable OR fully
        # replicated — multi-host replicated arrays read from the local
        # shard) lets nonzero ranks skip entirely, the reference's
        # rank-0-saves semantics.
        if rank != 0 and not ckpt_lib.snapshot_needs_all_ranks(st):
            return
        # -best.model mirrors only the best-val epoch (ref checkpoint.py:
        # 10-25 keyed on validation_monitor.best_epoch); without
        # validation, every save is "best" (nothing else to rank by).
        # The mirror copy runs inside the async writer — mirroring must
        # not force a join back to synchronous saves every epoch.
        mirror = is_best or validation_fn is None
        ckpt_lib.save_checkpoint(
            model_prefix, epoch, st, extra=extra_dict,
            async_write=async_ckpt,
            mirror_best_to=model_prefix if mirror else None,
            write=(rank == 0))

    writer = None
    if getattr(args, "log_dir", None) and rank == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(log_dir=args.log_dir)
        except ImportError:
            logger.warning("tensorboard writer unavailable")

    try:
        state = fit(model, config, task, train_loader, steps_per_epoch,
                    val_loader=val_loader, mesh=mesh, state=state, tx=tx,
                    checkpoint_fn=checkpoint_fn, validation_fn=validation_fn,
                    begin_epoch=begin_epoch, writer=writer,
                    profile_dir=getattr(args, "profile_dir", None),
                    best_val=extra.get("best_val"),
                    plateau_state=extra.get("plateau"),
                    sched=sched, base_lr=base_lr)
    except BaseException:
        # a crash mid-epoch must not abandon the daemon ckpt-writer — the
        # just-saved checkpoint is what AUTO_RESUME needs after this very
        # failure; join it, but never mask the original exception
        try:
            ckpt_lib.wait_for_pending_save()
        except Exception:
            logger.exception("async checkpoint write failed during unwind")
        raise
    ckpt_lib.wait_for_pending_save()     # surface in-flight write failures
    if writer is not None:
        writer.close()
    return state
