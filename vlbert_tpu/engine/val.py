"""do_validation (ref: vcr/function/val.py:7, common/callbacks/
validation_monitor.py:5-46): run inference over the val loader, compute
metrics with the label columns from the batch."""

from __future__ import annotations

import jax

from vlbert_tpu.parallel.mesh import shard_batch
from vlbert_tpu.training import metrics as metrics_lib

# per-task mapping: which trailing batch entries are labels, and the output
# key each one feeds (ref DATASET.LABEL_INDEX_IN_BATCH)
TASK_LABELS = {
    "vcr": {"label": -1},
    "vqa": {"label": -1},
    "refcoco": {"label": -1},
    "pretrain": {},
}


def make_validation_fn(model, config, task, mesh):
    label_map = TASK_LABELS[task]
    if task == "vcr" and not isinstance(config.DATASET, list) \
            and config.DATASET.get("TASK") == "Q2AR":
        # Q2AR batches carry both labels (answer, rationale); the module
        # consumes them for the joint metric (ref vcr/val.py:200-210)
        label_map = {"label": -2, "rationale_label": -1}
    n_labels = len(label_map)

    def eval_step(params, model_inputs, labels, valid):
        outputs = dict(model.apply(params, *model_inputs, train=False))
        outputs.update(labels)
        outputs["valid"] = valid   # mask wrap-padding duplicates
        return metrics_lib.device_metrics(task, config, outputs)

    jit_eval = jax.jit(eval_step)

    def validation_fn(state, val_loader):
        acc = metrics_lib.HostAccumulator()
        pairs = val_loader.iter_with_valid() \
            if hasattr(val_loader, "iter_with_valid") \
            else ((b, None) for b in val_loader)
        with mesh:
            for batch, valid in pairs:
                if valid is None:
                    import numpy as np

                    first = next(x for x in batch if x is not None)
                    valid = np.ones(np.shape(first)[0], bool)
                batch = shard_batch(tuple(batch) + (valid,), mesh)
                batch, valid = batch[:-1], batch[-1]
                if n_labels:
                    model_inputs = batch[:-n_labels]
                    labels = {k: batch[idx] for k, idx in label_map.items()}
                else:
                    model_inputs, labels = batch, {}
                dm = jit_eval(state.params, model_inputs, labels, valid)
                acc.update(jax.device_get(dm))
        return acc.get()

    return validation_fn
