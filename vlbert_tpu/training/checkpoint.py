"""Checkpoint save / load / auto-resume.

ref: common/callbacks/epoch_end_callbacks/checkpoint.py:10-25 (save
{state_dict, optimizer, validation_monitor} per epoch + '-best.model' copy),
common/utils/load.py:20-54 (smart_resume + AUTO_RESUME downward scan),
:57-81 (smart_partial_load: ignore non-matching keys, report).

Format: msgpack via flax.serialization, file naming preserved:
``{prefix}-{epoch:04d}.model`` and ``{prefix}-best.model``.
"""

from __future__ import annotations

import logging
import os
import shutil
import threading

import flax.serialization
import jax
import numpy as np

logger = logging.getLogger(__name__)

# at most one in-flight background writer (per process); every reader /
# next writer joins it first, so async saves are invisible to callers —
# except that a background write FAILURE surfaces at the next join point
# (next save / mirror / load / end-of-fit) instead of immediately
_pending_save: threading.Thread | None = None
_pending_error: list = []


def wait_for_pending_save():
    """Join the in-flight async checkpoint write; re-raise its failure.

    The reference's synchronous torch.save raises in place; an async write
    failure (ENOSPC, permissions) must not vanish into a daemon thread —
    it is re-raised here, one join point after the fact.
    """
    global _pending_save
    if _pending_save is not None:
        _pending_save.join()
        _pending_save = None
    if _pending_error:
        e = _pending_error.pop()
        _pending_error.clear()
        raise RuntimeError(f"async checkpoint write failed: {e!r}") from e


def _atomic_copy(src, dst):
    tmp = dst + ".tmp"
    shutil.copyfile(src, tmp)
    os.replace(tmp, dst)


def _to_host(tree):
    """device_get that also handles cross-host sharded state.

    Under TPU.PARTITION_MODE=fsdp/tp on a multi-host mesh, a leaf's shards
    live on other hosts' devices and plain device_get raises; gather them
    first. The gather is COLLECTIVE: when state is not fully addressable,
    every rank must call save_checkpoint (engine/train.py does, passing
    write=rank==0 so only rank 0 touches the filesystem)."""
    def get(x):
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.is_fully_replicated):
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        # fully-replicated multi-host arrays read from the local shard —
        # no collective needed (the multi-host pure-DP case)
        return jax.device_get(x)

    return jax.tree_util.tree_map(get, tree)


def snapshot_needs_all_ranks(tree):
    """True when a checkpoint snapshot of ``tree`` requires a collective
    gather (some leaf is sharded across hosts and not fully replicated) —
    in that case every rank must enter save_checkpoint."""
    return any(isinstance(x, jax.Array) and not x.is_fully_addressable
               and not x.is_fully_replicated
               for x in jax.tree_util.tree_leaves(tree))


def save_checkpoint(prefix, epoch, state, extra=None, async_write=False,
                    mirror_best_to=None, write=True):
    """Save params+opt_state+step (+extra dict) to {prefix}-{epoch:04d}.model.

    The device->host snapshot is always synchronous (the caller's next
    train step donates/overwrites the device buffers). With
    ``async_write`` the msgpack serialize + file write — seconds of wall
    time for base-size params that the reference's torch.save spends
    inside the epoch loop (ref checkpoint.py:10-25) — happens in a
    background thread instead, overlapping the next epoch's compute.
    Writes go to a temp file + atomic os.replace either way, so a
    preemption mid-write can never leave a torn {epoch}.model for
    AUTO_RESUME to trip over. ``mirror_best_to`` additionally copies the
    finished file to {mirror_best_to}-best.model INSIDE the writer (also
    atomically), so best-epoch mirroring doesn't force a join. A failed
    background write raises at the next join point (wait_for_pending_save /
    next save / any load) rather than disappearing.
    """
    global _pending_save
    wait_for_pending_save()
    payload = {
        "params": flax.serialization.to_state_dict(_to_host(state.params)),
        "opt_state": flax.serialization.to_state_dict(
            _to_host(state.opt_state)),
        "step": int(state.step),
        "extra": extra or {},
    }
    path = f"{prefix}-{epoch:04d}.model"
    if not write:          # non-writing rank: participated in the (possibly
        return path        # collective) snapshot above; skip the filesystem
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _write_file():
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(payload))
        os.replace(tmp, path)
        logger.info("saved checkpoint %s", path)
        if mirror_best_to is not None:
            best = f"{mirror_best_to}-best.model"
            _atomic_copy(path, best)
            logger.info("mirrored best checkpoint to %s", best)

    def _guarded_write():
        try:
            _write_file()
        except BaseException as e:  # noqa: BLE001 — re-raised at next join
            logger.exception("async checkpoint write failed for %s", path)
            _pending_error.append(e)

    if async_write:
        _pending_save = threading.Thread(
            target=_guarded_write, name="ckpt-writer", daemon=True)
        _pending_save.start()
    else:
        _write_file()
    return path


def mirror_best(prefix, epoch_path):
    wait_for_pending_save()              # epoch_path may still be writing
    best = f"{prefix}-best.model"
    _atomic_copy(epoch_path, best)       # -best.model can't be torn either
    logger.info("mirrored best checkpoint to %s", best)
    return best


def _reconcile_masked_opt_state(target, payload):
    """Migrate an opt_state state-dict across the masked-moments format
    change, in EITHER direction.

    Round 3 wrapped the Adam/momentum transforms in ``optax.masked``
    (frozen params carry no moment state, matching the reference's
    requires_grad=True-only optimizer): the moment state gained an
    ``inner_state`` level (MaskedState) and frozen leaves' (mu, nu) became
    empty MaskedNode dicts. Later in round 3 the DEFAULT flipped back to
    dense moments (TPU.MASKED_OPT_STATE=false — the masked pytree
    interacts pathologically with buffer donation at small batch; see
    utils/config.py). Both checkpoint formats restore onto both targets:

    * dense payload -> masked target: insert the missing ``inner_state``
      level, drop moments the target no longer tracks (frozen params,
      whose updates were mask-zeroed — behavior-identical);
    * masked payload -> dense target: strip the ``inner_state`` level,
      keep the target's freshly-initialized zeros for frozen-leaf moments
      the payload never stored (their grads are zero, so zeros are exactly
      what a dense run would have accumulated).

    Identity when formats already agree.
    """
    if isinstance(target, dict) and not target:
        return {}                      # MaskedNode: frozen leaf, no state
    if isinstance(target, dict) and isinstance(payload, dict):
        if "inner_state" in target and "inner_state" not in payload:
            return {"inner_state":
                    _reconcile_masked_opt_state(target["inner_state"],
                                                payload)}
        if "inner_state" in payload and "inner_state" not in target:
            return _reconcile_masked_opt_state(target,
                                               payload["inner_state"])
        # keys missing from either side pass through unchanged so
        # from_state_dict still raises loudly on genuine mismatches
        out = {}
        for k, pv in payload.items():
            out[k] = (_reconcile_masked_opt_state(target[k], pv)
                      if k in target else pv)
        for k, tv in target.items():
            if k not in out:           # masked-era frozen subtree absent
                out[k] = tv            # from payload: keep init zeros
        return out
    if isinstance(payload, dict) and not payload:
        return target                  # MaskedNode payload -> dense leaf
    return payload


def load_checkpoint(path, state=None):
    wait_for_pending_save()              # read-after-async-write safety
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    if state is None:
        return payload
    import jax.numpy as jnp

    params = flax.serialization.from_state_dict(
        jax.device_get(state.params), payload["params"])
    target_opt = jax.device_get(state.opt_state)
    opt_sd = _reconcile_masked_opt_state(
        flax.serialization.to_state_dict(target_opt), payload["opt_state"])
    opt_state = flax.serialization.from_state_dict(target_opt, opt_sd)
    new_state = state.replace(params=params, opt_state=opt_state,
                              step=jnp.asarray(payload["step"], jnp.int32))
    return new_state, payload.get("extra", {})


def auto_resume(prefix, state, end_epoch):
    """Scan from end_epoch downward for the newest checkpoint
    (ref: common/utils/load.py:32-54). Returns (state, begin_epoch, extra)."""
    for epoch in range(end_epoch - 1, -1, -1):
        path = f"{prefix}-{epoch:04d}.model"
        if os.path.exists(path):
            state, extra = load_checkpoint(path, state)
            logger.info("auto-resumed from %s (begin_epoch=%d)", path, epoch + 1)
            return state, epoch + 1, extra
    return state, 0, {}


def flatten_params(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = tree
    return out


def partial_load(params, pretrain_flat, prefix_changes=()):
    """smart_partial_load semantics (ref: common/utils/load.py:57-81):
    load keys that exist with matching shapes, report mismatches.

    params: flax param dict (mutated copy returned)
    pretrain_flat: {dot.path: np.ndarray}
    prefix_changes: [(old_prefix, new_prefix), ...] applied first
                    (ref vcr/function/train.py:202-214)
    """
    renamed = {}
    for k, v in pretrain_flat.items():
        for old, new in prefix_changes:
            if k.startswith(old):
                k = new + k[len(old):]
                break
        renamed[k] = v

    flat = flatten_params(params)
    loaded, missing, shape_mismatch = [], [], []
    new_flat = dict(flat)
    for k, v in renamed.items():
        if k in flat:
            if tuple(flat[k].shape) == tuple(np.shape(v)):
                new_flat[k] = np.asarray(v, dtype=np.asarray(flat[k]).dtype)
                loaded.append(k)
            else:
                shape_mismatch.append((k, tuple(np.shape(v)), tuple(flat[k].shape)))
        else:
            missing.append(k)
    if missing:
        logger.warning("partial_load: %d keys not in model (e.g. %s)",
                       len(missing), missing[:5])
    if shape_mismatch:
        logger.warning("partial_load: shape mismatches: %s", shape_mismatch[:5])
    logger.info("partial_load: loaded %d/%d keys", len(loaded), len(flat))

    # unflatten back
    def unflatten(flat_d):
        root = {}
        for k, v in flat_d.items():
            parts = k.split(".")
            d = root
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = v
        return root

    return unflatten(new_flat), loaded


def smart_resume(prefix, state, config):
    """Explicit + auto resume (ref: common/utils/load.py:20-54):
    TRAIN.RESUME loads {prefix}-{BEGIN_EPOCH-1:04d}.model; otherwise
    AUTO_RESUME scans downward. Returns (state, begin_epoch, extra)."""
    t = config.TRAIN
    if t.RESUME:
        if t.BEGIN_EPOCH < 1:
            raise ValueError(
                "TRAIN.RESUME requires TRAIN.BEGIN_EPOCH >= 1 (the epoch to "
                "resume INTO; the checkpoint {prefix}-{BEGIN_EPOCH-1:04d}"
                ".model is loaded) — got BEGIN_EPOCH="
                f"{t.BEGIN_EPOCH}")
        epoch = t.BEGIN_EPOCH - 1
        path = f"{prefix}-{epoch:04d}.model"
        state, extra = load_checkpoint(path, state)
        logger.info("resumed from %s", path)
        return state, t.BEGIN_EPOCH, extra
    if t.AUTO_RESUME:
        return auto_resume(prefix, state, t.END_EPOCH)
    return state, t.BEGIN_EPOCH, {}


def has_resumable_checkpoint(prefix, config):
    """True iff smart_resume would restore a checkpoint — used to skip the
    (expensive, immediately-overwritten) warm-start loads on restart."""
    t = config.TRAIN
    if t.RESUME:
        return os.path.exists(f"{prefix}-{t.BEGIN_EPOCH - 1:04d}.model")
    if t.AUTO_RESUME:
        return any(os.path.exists(f"{prefix}-{e:04d}.model")
                   for e in range(t.END_EPOCH - 1, -1, -1))
    return False
