"""Metrics — functional (sum, count) accumulators with reference semantics.

ref: common/metrics/eval_metric.py (EvalMetric base with sum_metric/num_inst
and NCCL allreduce on get, :47-52), common/metrics/{vcr,vqa,refcoco,
pretrain}_metrics.py, composite_eval_metric.py.

TPU-native: each metric is a pure function (outputs, batch) -> (sum, num)
computed INSIDE the jitted step on global (sharded) arrays, so the cross-
device reduction falls out of the partitioner — no explicit allreduce. The
host accumulates python floats across batches and divides on get().
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ------------------------------------------------------------ device parts

def _sample_valid(outputs, B):
    """Per-sample validity [B]: 1 for real samples, 0 for the loader's
    wrap-padding duplicates (only validation batches carry 'valid' —
    training counts every sample, as the reference does). Falls back to
    all-ones when the metric's batch dim differs from the loader batch
    (e.g. the multitask aux stream)."""
    v = outputs.get("valid")
    if v is None or v.shape[0] != B:
        return jnp.ones((B,), jnp.float32), float(B)
    vf = v.astype(jnp.float32)
    return vf, jnp.sum(vf)


def vcr_accuracy(outputs):
    """ref: vcr_metrics.py:24-33 (handles per-choice sigmoid logits too —
    logits here are always [B, C] after the module reshapes)."""
    logits = outputs["label_logits"]
    label = outputs["label"]
    vf, n = _sample_valid(outputs, logits.shape[0])
    correct = (jnp.argmax(logits, axis=1) == label).astype(jnp.float32)
    return jnp.sum(correct * vf), n


def vcr_rationale_accuracy(outputs):
    """Q2AR rationale accuracy (ref vcr_metrics.py Accuracy on the rationale
    stream; single-model Q2AR emits both logit sets)."""
    logits = outputs["rationale_logits"]
    label = outputs["rationale_label"]
    vf, n = _sample_valid(outputs, logits.shape[0])
    correct = (jnp.argmax(logits, axis=1) == label).astype(jnp.float32)
    return jnp.sum(correct * vf), n


def vcr_joint_accuracy(outputs):
    """Q->AR joint = answer AND rationale both correct
    (ref vcr_metrics.py JointAccuracy :67-78, vcr/val.py:200-210)."""
    a_ok = jnp.argmax(outputs["label_logits"], axis=1) == outputs["label"]
    r_ok = (jnp.argmax(outputs["rationale_logits"], axis=1)
            == outputs["rationale_label"])
    vf, n = _sample_valid(outputs, a_ok.shape[0])
    correct = (a_ok & r_ok).astype(jnp.float32)
    return jnp.sum(correct * vf), n


def vqa_soft_accuracy(outputs):
    """ref: vqa_metrics.py:20-31 — soft score of the argmax answer."""
    logits = outputs["label_logits"]
    label = outputs["label"]
    vf, n = _sample_valid(outputs, logits.shape[0])
    idx = jnp.argmax(logits, axis=1)
    score = jnp.take_along_axis(label, idx[:, None], axis=1)[:, 0]
    return jnp.sum(score.astype(jnp.float32) * vf), n


def refcoco_accuracy(outputs):
    """ref: refcoco_metrics.py:17-31 — argmax region is a positive region."""
    logits = outputs["label_logits"]
    label = outputs["label"]
    vf, n = _sample_valid(outputs, logits.shape[0])
    idx = jnp.argmax(logits, axis=1)
    hit = jnp.take_along_axis(label, idx[:, None], axis=1)[:, 0] > 0.5
    return jnp.sum(hit.astype(jnp.float32) * vf), n


def refcoco_cls_accuracy(outputs):
    """ref: refcoco_metrics.py ClsAccuracy — per-region binary accuracy over
    valid slots (label >= 0)."""
    logits = outputs["label_logits"]
    label = outputs["label"]
    vf, _ = _sample_valid(outputs, label.shape[0])
    valid = (label >= 0) & (vf[:, None] > 0)
    pred = logits > 0
    correct = (pred == (label > 0.5)) & valid
    return (jnp.sum(correct.astype(jnp.float32)),
            jnp.sum(valid.astype(jnp.float32)))


def refcoco_cls_pos_accuracy(outputs):
    """ref: refcoco_metrics.py ClsPosAccuracy — accuracy over POSITIVE
    regions only."""
    logits = outputs["label_logits"]
    label = outputs["label"]
    vf, _ = _sample_valid(outputs, label.shape[0])
    pos = (label > 0.5) & (vf[:, None] > 0)
    correct = (logits > 0) & pos
    return (jnp.sum(correct.astype(jnp.float32)),
            jnp.sum(pos.astype(jnp.float32)))


def refcoco_cls_pos_fraction(outputs):
    """ref: refcoco_metrics.py ClsPosFraction — fraction of valid regions
    that are positive."""
    label = outputs["label"]
    vf, _ = _sample_valid(outputs, label.shape[0])
    valid = (label >= 0) & (vf[:, None] > 0)
    pos = (label > 0.5) & (vf[:, None] > 0)
    return (jnp.sum(pos.astype(jnp.float32)),
            jnp.sum(valid.astype(jnp.float32)))


def relationship_accuracy(outputs):
    """ref: pretrain_metrics.py:20-31."""
    logits = outputs["relationship_logits"]
    label = outputs["relationship_label"]
    vf, n = _sample_valid(outputs, logits.shape[0])
    correct = (jnp.argmax(logits, axis=1) == label).astype(jnp.float32)
    return jnp.sum(correct * vf), n


def mlm_accuracy(outputs, logits_key="mlm_logits_wvc", label_key="mlm_label_wvc"):
    """ref: pretrain_metrics.py MLMAccuracy — over positions with label != -1."""
    logits = outputs[logits_key]
    label = outputs[label_key]
    vf, _ = _sample_valid(outputs, label.shape[0])
    valid = (label != -1) & (vf[:, None] > 0)
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == label) & valid
    return (jnp.sum(correct.astype(jnp.float32)),
            jnp.sum(valid.astype(jnp.float32)))


def mvrc_accuracy(outputs):
    """ref: pretrain_metrics.py MVRCAccuracy — argmax match on rows whose
    soft label distribution is valid (sums to ~1)."""
    logits = outputs["mvrc_logits"]
    label = outputs["mvrc_label"]
    vf, _ = _sample_valid(outputs, label.shape[0])
    valid = (jnp.abs(jnp.sum(label, axis=-1) - 1.0) < 0.1) \
        & (vf[:, None] > 0)
    pred = jnp.argmax(logits, axis=-1)
    tgt = jnp.argmax(label, axis=-1)
    correct = (pred == tgt) & valid
    return (jnp.sum(correct.astype(jnp.float32)),
            jnp.sum(valid.astype(jnp.float32)))


def loss_logger(outputs, key):
    """ref: LossLogger in each metrics file — running mean of a loss output."""
    v = outputs[key]
    return jnp.sum(v.astype(jnp.float32)), 1


# ValidationMonitor's named host metric per task (ref vcr/function/
# train.py:257 'Acc', vqa :256 'SoftAcc', refcoco :245 'RefAcc',
# pretrain :279 MLM accuracy)
HOST_METRIC_NAME = {"vcr": "Acc", "vqa": "SoftAcc", "refcoco": "RefAcc",
                    "pretrain": "MLMAcc"}


def host_metric_name(task, config=None):
    if task == "pretrain" and config is not None \
            and not config.NETWORK.WITH_MLM_LOSS:
        # MLMAcc doesn't exist without the MLM task: best-checkpoint
        # selection would compare -inf forever (never mirroring -best.model,
        # and plateau would cut the LR every patience window)
        if config.NETWORK.WITH_MVRC_LOSS:
            return "MVRCAcc"
        if config.NETWORK.WITH_REL_LOSS:
            return "RelAcc"
    return HOST_METRIC_NAME[task]


TASK_METRICS = {
    "vcr": {"Acc": vcr_accuracy},
    "vqa": {"SoftAcc": vqa_soft_accuracy},
    "refcoco": {"RefAcc": refcoco_accuracy, "ClsAcc": refcoco_cls_accuracy,
                "ClsPosAcc": refcoco_cls_pos_accuracy,
                "ClsPosFrac": refcoco_cls_pos_fraction},
    "pretrain": {
        "MLMAcc": mlm_accuracy,
        "MVRCAcc": mvrc_accuracy,
    },
}


def device_metrics(task, config, outputs):
    """Compute all (sum, num) pairs for a task inside jit."""
    out = {}
    for name, fn in TASK_METRICS[task].items():
        if name == "MLMAcc" and "mlm_logits_wvc" not in outputs:
            continue
        if name == "MVRCAcc" and "mvrc_logits" not in outputs:
            continue
        out[name] = fn(outputs)
    if task == "vcr" and "rationale_logits" in outputs \
            and "rationale_label" in outputs:
        out["RationaleAcc"] = vcr_rationale_accuracy(outputs)
        out["JointAcc"] = vcr_joint_accuracy(outputs)
    if task == "pretrain" and config.NETWORK.WITH_REL_LOSS \
            and "relationship_logits" in outputs:
        out["RelAcc"] = relationship_accuracy(outputs)
    if task == "pretrain" and "mlm_logits_aux" in outputs:
        out["MLMAccAUX"] = mlm_accuracy(outputs, "mlm_logits_aux",
                                        "mlm_label_aux")
    for output_name, display_name in config.TRAIN.LOSS_LOGGERS:
        if output_name in outputs:
            out[display_name] = loss_logger(outputs, output_name)
    return out


class HostAccumulator:
    """Host-side running sums (EvalMetric.reset/update/get equivalent)."""

    def __init__(self):
        self.sums = {}
        self.nums = {}

    def reset(self):
        self.sums.clear()
        self.nums.clear()

    def update(self, device_out):
        for k, (s, n) in device_out.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(s)
            self.nums[k] = self.nums.get(k, 0) + float(n)

    def get(self):
        return {k: (self.sums[k] / self.nums[k] if self.nums[k] else float("nan"))
                for k in self.sums}

    def format(self):
        return ", ".join(f"{k}={v:.4f}" for k, v in sorted(self.get().items()))
