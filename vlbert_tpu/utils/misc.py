"""Startup parameter summary (ref common/utils/misc.py:40-67
``summary_parameters``): a per-parameter name/dtype/shape/#params table
plus trainable / non-trainable / total counts, logged once at model build.

The reference splits by ``requires_grad``; here the split comes from the
same ``trainable_mask`` tree the optimizer uses (training/optim.py), so the
table reports exactly what the update rule will and won't touch — frozen
BN stats, frozen backbone stages, frozen word/position embeddings.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

logger = logging.getLogger(__name__)


def path_str(path):
    """Canonical pytree-path -> 'a/b/c' name. The SAME rendering is used by
    the optimizer's LR_MULT / trainable-mask matching (training/optim.py
    imports this), so the startup table's names are exactly the names those
    rules match against."""
    return "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                    for p in path)


def _rows(params, trainable):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    tflat = (jax.tree_util.tree_flatten_with_path(trainable)[0]
             if trainable is not None else None)
    rows = []
    for i, (path, leaf) in enumerate(flat):
        name = path_str(path)
        is_trainable = bool(tflat[i][1]) if tflat is not None else True
        rows.append((name, str(np.dtype(leaf.dtype)), tuple(leaf.shape),
                     int(np.prod(leaf.shape, dtype=np.int64)), is_trainable))
    return rows


def summary_parameters(params, trainable=None, log=None):
    """Log the parameter table; returns (n_trainable, n_frozen, n_total).

    params: the model param pytree (e.g. ``state.params["params"]``).
    trainable: matching bool pytree (optim.trainable_mask) or None = all.
    """
    log = log or logger
    rows = _rows(params, trainable)
    cols = [[r[0] for r in rows], [r[1] for r in rows],
            [str(r[2]) for r in rows], [str(r[3]) for r in rows]]
    widths = [max((len(c) for c in col), default=4) + 2 for col in cols]
    fmt = "|" + "|".join(f"{{:{w}s}}" for w in widths) + "| {}"
    sep = "-" * (sum(widths) + len(widths) + 13)

    log.info(">> Trainable Parameters:")
    log.info(sep)
    log.info(fmt.format("Name", "Dtype", "Shape", "#Params", "Trainable"))
    log.info(sep)
    for name, dtype, shape, count, is_t in rows:
        log.info(fmt.format(name, dtype, str(shape), str(count),
                            "yes" if is_t else "FROZEN"))
    log.info(sep)

    n_trainable = sum(r[3] for r in rows if r[4])
    n_total = sum(r[3] for r in rows)
    n_frozen = n_total - n_trainable
    log.info(">> %-25s\t%.2f\tM", "# TrainableParams:", n_trainable / 1e6)
    log.info(">> %-25s\t%.2f\tM", "# NonTrainableParams:", n_frozen / 1e6)
    log.info(">> %-25s\t%.2f\tM", "# TotalParams:", n_total / 1e6)
    return n_trainable, n_frozen, n_total
