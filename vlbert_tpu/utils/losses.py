"""Loss functions matching the reference's torch semantics exactly.

All computed in fp32 regardless of model compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels):
    """Mean CE over all entries (torch F.cross_entropy default)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    return jnp.mean(nll)


def cross_entropy_ignore_index(logits, labels, ignore_index=-1):
    """torch F.cross_entropy(..., ignore_index=-1): mean over valid entries.

    Returns 0 when no entry is valid (torch returns NaN; the reference never
    hits that case because every batch has masked tokens).
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def soft_cross_entropy(logits, soft_labels):
    """ref: common/utils/misc.py:124-151 — soft-target CE, with a per-row
    validity mask: rows whose soft labels do not sum to ~1 are ignored
    (|sum - 1| >= 0.1 -> invalid). Mean over valid rows; 0 if none.
    """
    logits = logits.astype(jnp.float32)
    soft_labels = soft_labels.astype(jnp.float32)
    valid = jnp.abs(jnp.sum(soft_labels, axis=-1) - 1.0) < 0.1
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.sum(soft_labels * logp, axis=-1)
    per_row = jnp.where(valid, per_row, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(per_row) / denom


def bce_with_logits(logits, targets, weight=None):
    """torch F.binary_cross_entropy_with_logits (mean reduction)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # numerically stable: max(x,0) - x*t + log(1 + exp(-|x|))
    loss = (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    if weight is not None:
        loss = loss * weight.astype(jnp.float32)
    return jnp.mean(loss)


def bce_with_logits_masked(logits, targets, mask):
    """BCE averaged over mask-selected entries only (reference applies BCE to
    boolean-indexed tensors, e.g. refcoco logits[box_mask])."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    loss = (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)


def cross_entropy_ignore_index_batch_first(logits, labels, ignore_index=-1):
    """MLM_LOSS_NORM_IN_BATCH_FIRST variant (ref pretrain module :168-174):
    per-example mean over that example's valid tokens, then mean over
    examples that have any valid token; both denominators get the
    reference's +1e-4 smoothing.
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    num = jnp.sum(valid, axis=1).astype(jnp.float32)              # [B]
    per_ex = jnp.sum(nll, axis=1) / (num + 1e-4)
    num_has = jnp.sum(num != 0).astype(jnp.float32)
    return jnp.sum(per_ex) / (num_has + 1e-4)


def soft_cross_entropy_batch_first(logits, soft_labels):
    """MVRC_LOSS_NORM_IN_BATCH_FIRST variant (ref pretrain module :183-190):
    row valid if |sum(soft)-1| < 0.1; per-example mean over valid rows, then
    mean over examples with any valid row (+1e-4 smoothing, as reference).
    logits/soft_labels: [B, O, C].
    """
    logits = logits.astype(jnp.float32)
    soft_labels = soft_labels.astype(jnp.float32)
    valid = jnp.abs(jnp.sum(soft_labels, axis=-1) - 1.0) < 0.1    # [B, O]
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.sum(soft_labels * logp, axis=-1)
    per_row = jnp.where(valid, per_row, 0.0)
    num = jnp.sum(valid, axis=1).astype(jnp.float32)              # [B]
    per_ex = jnp.sum(per_row, axis=1) / (num + 1e-4)
    num_has = jnp.sum(num != 0).astype(jnp.float32)
    return jnp.sum(per_ex) / (num_has + 1e-4)
