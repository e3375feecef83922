"""Optimizers, LR schedules, param groups — optax chains matching the
reference semantics.

ref:
  * optimizer selection + base LR = cfg.TRAIN.LR x global batch
    (vcr/function/train.py:113-141)
  * vendored AdamW: decoupled weight decay, betas (0.9, 0.999), eps 1e-6,
    correct_bias (common/nlp/bert/optimization.py:107-187)
  * WarmupMultiStepLR 'step' (common/lr_scheduler.py:10-52)
  * WarmupLinearSchedule 'triangle' (common/nlp/bert/optimization.py:49-62)
  * 'plateau' stepped on the host from val metric (common/trainer.py:95-98)
    — exposed as a mutable lr_scale in the train state
  * per-parameter LR multipliers by substring match TRAIN.LR_MULT
    (vcr/function/train.py:119-123)
  * frozen parameters (BN affine/stats, frozen stages, frozen word/pos
    embeddings) — requires_grad=False in the reference — realized as a final
    update mask so neither gradient nor weight decay touches them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------- schedules

def make_lr_schedule(config, steps_per_epoch):
    """Return optax schedule in units of optimizer steps.

    For 'plateau' the schedule is constant; the host multiplies lr_scale.
    """
    t = config.TRAIN
    accum = max(int(t.GRAD_ACCUMULATE_STEPS), 1)
    batch_size = t.BATCH_IMAGES
    if isinstance(batch_size, (list, tuple)):
        batch_size = sum(batch_size)
    world = getattr(config, "_world_size", None) or jax.device_count()
    base_lr = t.LR * world * batch_size * accum     # ref :113-118

    warmup_iters = t.WARMUP_STEPS if t.WARMUP else 0
    warmup_factor = t.WARMUP_FACTOR
    warmup_method = t.WARMUP_METHOD

    # NOTE: steps_per_epoch arrives in OPTIMIZER steps (the loader folds
    # GRAD_ACCUMULATE_STEPS into each host batch and the train step scans
    # the microbatches), which is also the unit of the schedule counter.
    # The reference divides len(train_loader) by accum to get the same unit
    # (vcr/function/train.py:295-298) — dividing AGAIN here would shrink
    # every horizon accum-fold (triangle would decay to 0 a quarter of the
    # way through a 4-accum run).
    if t.LR_SCHEDULE == "step":
        milestones = [int(e * steps_per_epoch) for e in t.LR_STEP]

        def sched(step):
            lr = base_lr
            # warmup (ref common/lr_scheduler.py:33-47)
            if warmup_iters > 0:
                alpha = jnp.minimum(step / warmup_iters, 1.0)
                if warmup_method == "linear":
                    wf = warmup_factor * (1 - alpha) + alpha
                else:  # constant
                    wf = jnp.where(step < warmup_iters, warmup_factor, 1.0)
                lr = lr * wf
            for m in milestones:
                lr = lr * jnp.where(step >= m, t.LR_FACTOR, 1.0)
            return lr

        return sched, base_lr

    if t.LR_SCHEDULE == "triangle":
        t_total = int(t.END_EPOCH * steps_per_epoch)

        def sched(step):
            # ref optimization.py:49-62
            if warmup_iters > 0:
                warm = step / jnp.maximum(warmup_iters, 1)
            else:
                warm = jnp.ones_like(step, jnp.float32) + 0.0
            decay = jnp.maximum(
                (t_total - step) / jnp.maximum(t_total - warmup_iters, 1.0),
                0.0)
            return base_lr * jnp.where(step < warmup_iters, warm, decay)

        return sched, base_lr

    if t.LR_SCHEDULE == "plateau":
        return (lambda step: jnp.asarray(base_lr, jnp.float32)), base_lr

    raise ValueError(f"unsupported LR_SCHEDULE {t.LR_SCHEDULE!r}")


# ------------------------------------------------------------- param groups

from vlbert_tpu.utils.misc import path_str as _path_str  # noqa: E402 — one
# rendering shared with the startup parameter table (utils/misc.py)


def lr_mult_tree(params, lr_mult_rules):
    """Per-leaf multiplier tree from [(substring, mult), ...] rules
    (first match wins; default 1.0) — ref vcr/function/train.py:119-123."""

    def mult(path, _):
        s = _path_str(path)
        for key, m in lr_mult_rules:
            if key in s:
                return float(m)
        return 1.0

    return jax.tree_util.tree_map_with_path(mult, params)


def trainable_mask(params, config):
    """False = frozen (no update, no weight decay).

    Frozen in the reference:
      * FrozenBatchNorm running stats always (buffers);
      * BN scale/bias when IMAGE_FROZEN_BN (common/fast_rcnn.py:88-100);
      * backbone stages in IMAGE_FROZEN_BACKBONE_STAGES (resnet.py:217-236)
        — also stop_gradient'd in the module;
      * word_embeddings when VLBERT.word_embedding_frozen (vl_bert :80-84);
      * position_embeddings when pos_embedding_frozen (vl_bert :342-344);
      * visual_scale_* when NETWORK.BLIND (vcr module fix_params :111-114).
    """
    net = config.NETWORK
    frozen_stage_names = set()
    for s in net.IMAGE_FROZEN_BACKBONE_STAGES:
        if s == 1:
            frozen_stage_names.update({"conv1", "bn1"})
        elif 2 <= s <= 4:
            frozen_stage_names.add(f"layer{s - 1}")
        elif s == 5:
            frozen_stage_names.add("roi_head")

    word_frozen = bool(net.VLBERT.word_embedding_frozen)
    pos_frozen = bool(net.VLBERT.get("pos_embedding_frozen", False))
    blind = bool(net.BLIND)
    frozen_bn = bool(net.IMAGE_FROZEN_BN)

    def rule(path, _):
        s = _path_str(path)
        parts = s.split("/")
        bn_names = ("bn1", "bn2", "bn3", "downsample_bn")
        # FrozenBatchNorm stats are never trainable
        if parts[-1] in ("mean", "var") and any(b in parts for b in bn_names):
            return False
        if frozen_bn and ("backbone" in parts or "roi_head" in parts) \
                and any(b in parts for b in bn_names):
            return False
        if "backbone" in parts:
            # the module directly under 'backbone' names the stage:
            # conv1/bn1 = stem (stage 1), layerK = stage K+1
            child = parts[parts.index("backbone") + 1]
            if child in frozen_stage_names:
                return False
        if "roi_head" in frozen_stage_names and "roi_head" in parts:
            return False
        if word_frozen and "word_embeddings" in s and "special" not in s:
            return False
        if pos_frozen and "position_embeddings" in s:
            return False
        if blind and ("visual_scale_text" in s or "visual_scale_object" in s):
            return False
        return True

    return jax.tree_util.tree_map_with_path(rule, params)


def lr_group_rules(config):
    """[(substring, mult), ...] — TRAIN.LR_MULT plus the visual-scale
    special groups (ref vcr/function/config.py:127-128). First match wins;
    anything unmatched is the implicit default group (mult 1.0).

    Also the source for the per-group LR TensorBoard scalars
    (ref common/trainer.py:160-167 logs LR/Group_{i} per param group)."""
    t = config.TRAIN
    lr_rules = list(t.LR_MULT)
    for key, name in (("VISUAL_SCALE_TEXT_LR_MULT", "visual_scale_text"),
                      ("VISUAL_SCALE_OBJECT_LR_MULT", "visual_scale_object")):
        mult = t.get(key, 1.0)
        if mult != 1.0:
            lr_rules.insert(0, (name, mult))
    return lr_rules


# ---------------------------------------------------------------- optimizer

def _scale_by_tree(mult_tree):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return (jax.tree_util.tree_map(lambda u, m: u * m, updates, mult_tree),
                state)

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_plateau():
    """Multiplies updates by a host-mutable scalar living in the opt state.

    The 'plateau' schedule (ref common/trainer.py:95-98 +
    torch ReduceLROnPlateau) is stepped on the host from the validation
    metric; the host rewrites this leaf between epochs via
    ``set_plateau_scale`` (driven by ``ReduceLROnPlateau.step`` in the
    training loop).
    """

    def init_fn(params):
        return {"plateau_scale": jnp.asarray(1.0, jnp.float32)}

    def update_fn(updates, state, params=None):
        s = state["plateau_scale"]
        return (jax.tree_util.tree_map(lambda u: u * s, updates), state)

    return optax.GradientTransformation(init_fn, update_fn)


class ReduceLROnPlateau:
    """Host-side plateau detector with torch's semantics at the reference's
    settings (ref vcr/function/train.py:281-292: mode='max',
    factor=LR_FACTOR, patience=1, threshold=1e-4 'rel', cooldown=2,
    min_lr=0). ``step(metric)`` returns the current LR scale; the caller
    rewrites the ``plateau_scale`` opt-state leaf when it changes."""

    def __init__(self, factor, patience=1, threshold=1e-4, cooldown=2,
                 mode="max"):
        assert mode == "max"
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.best = float("-inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0
        self.scale = 1.0

    def _is_better(self, value):
        # threshold_mode='rel', mode='max': exactly torch's rule
        return value > self.best * (1.0 + self.threshold)

    def step(self, value):
        if self._is_better(value):
            self.best = value
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.scale *= self.factor
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.scale

    def state_dict(self):
        return {k: getattr(self, k) for k in
                ("best", "num_bad_epochs", "cooldown_counter", "scale")}

    def load_state_dict(self, d):
        for k, v in d.items():
            setattr(self, k, v)


def _is_plateau_leaf(path):
    return any(str(getattr(p, "key", getattr(p, "name", ""))) ==
               "plateau_scale" for p in path)


def get_plateau_scale(opt_state):
    out = [None]

    def find(path, leaf):
        if _is_plateau_leaf(path):
            out[0] = leaf
        return leaf

    jax.tree_util.tree_map_with_path(find, opt_state)
    return out[0]


def set_plateau_scale(opt_state, scale):
    """Rewrite the plateau_scale leaf, preserving its sharding (a plain
    host array here would change the jit input signature and force a full
    train-step recompile)."""

    def repl(path, leaf):
        if _is_plateau_leaf(path):
            new = jnp.asarray(scale, jnp.float32)
            if hasattr(leaf, "sharding"):
                new = jax.device_put(new, leaf.sharding)
            return new
        return leaf

    return jax.tree_util.tree_map_with_path(repl, opt_state)


def _mask_updates(mask_tree):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return (jax.tree_util.tree_map(
            lambda u, m: u * jnp.asarray(m, u.dtype), updates, mask_tree),
            state)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(config, params, steps_per_epoch):
    """Build the optax chain + (schedule, base_lr).

    Update rule layout (applied left to right):
      clip -> [coupled-wd for SGD/Adam] -> moment transform ->
      [decoupled-wd for AdamW] -> lr-mult tree -> -lr(step) ->
      [plateau scale] -> trainable mask.
    The plateau factor lives as the ``plateau_scale`` leaf of the
    _scale_by_plateau opt-state (see below); the host rewrites it between
    epochs via set_plateau_scale (training/loop.py).
    """
    t = config.TRAIN
    sched, base_lr = make_lr_schedule(config, steps_per_epoch)
    lr_rules = lr_group_rules(config)
    mults = lr_mult_tree(params, lr_rules)
    mask = trainable_mask(params, config)

    chain = []
    if t.CLIP_GRAD_NORM and t.CLIP_GRAD_NORM > 0:
        chain.append(optax.clip_by_global_norm(t.CLIP_GRAD_NORM))

    # The reference constructs its optimizer over requires_grad=True params
    # only (vcr/function/train.py:125-135): frozen leaves (word table,
    # frozen stages, BN affine) carry no moment state there. Parity of the
    # TRAINED values needs only the update mask (add_decayed_weights(mask)
    # + the final _mask_updates — frozen grads are zeros anyway), so
    # whether moments are also masked out of the opt-state pytree is a pure
    # HBM-vs-speed trade, exposed as TPU.MASKED_OPT_STATE. Dense moments
    # (default) measured 2.2x faster at B=4 under buffer donation on v5e;
    # masked saves ~190 MB of fp32 (mu, nu) at base scale. See the knob's
    # doc in utils/config.py and tools/profile_step.py for the A/B.
    if getattr(config.TPU, "MASKED_OPT_STATE", False):
        def moments(inner):
            return optax.masked(inner, mask)
    else:
        def moments(inner):
            return inner

    if t.OPTIMIZER == "SGD":
        if t.WD:
            chain.append(optax.add_decayed_weights(t.WD, mask=mask))
        chain.append(moments(optax.trace(decay=t.MOMENTUM)))
    elif t.OPTIMIZER == "Adam":
        if t.WD:
            chain.append(optax.add_decayed_weights(t.WD, mask=mask))
        chain.append(moments(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)))
    elif t.OPTIMIZER == "AdamW":
        chain.append(moments(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-6)))
        if t.WD:
            chain.append(optax.add_decayed_weights(t.WD, mask=mask))
    else:
        raise ValueError(f"unsupported optimizer {t.OPTIMIZER!r}")

    chain.append(_scale_by_tree(mults))
    chain.append(optax.scale_by_schedule(lambda step: -sched(step)))
    if t.LR_SCHEDULE == "plateau":
        chain.append(_scale_by_plateau())
    chain.append(_mask_updates(mask))
    return optax.chain(*chain), sched, base_lr
