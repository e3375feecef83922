"""Device mesh + sharding rules.

Replaces the reference's NCCL DDP stack (torch.distributed init, DDP wrap,
param broadcast, DistributedSampler, metric allreduce — ref:
vcr/function/train.py:72-86,309-319, pretrain/data/samplers/distributed.py,
common/metrics/eval_metric.py:47-52) with a single-program jit over a
`jax.sharding.Mesh`:

  * batch arrays are sharded on the leading axis over the 'data' mesh axis,
  * params/optimizer state are replicated (pure DP) or sharded over 'model'
    (TP, for the large configs) by a simple rule set,
  * gradient averaging, metric sums, and init-time "broadcast" fall out of
    XLA's partitioner — there is no explicit collective in user code.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape=None, axis_names=("data",), devices=None):
    """Build a Mesh. mesh_shape [] / None = all devices on the first axis."""
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = [len(devices)]
    axis_names = tuple(axis_names)[: len(mesh_shape)]
    arr = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(arr, axis_names)


def batch_sharding(mesh, batch_dim=0):
    """Shard the batch axis over 'data', replicate the rest."""
    spec = [None] * batch_dim + ["data"]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, batch_dim=0):
    """Turn a HOST-LOCAL batch (pytree of np arrays) into global arrays
    sharded on the batch dim over the 'data' mesh axis.

    batch_dim=1 for gradient-accumulation layouts [accum, micro, ...] —
    the accumulation axis is scanned per device, the micro axis is the
    data-parallel one.

    Single process: a plain sharded device_put. Multi-process (the
    reference's NCCL DDP world, ref vcr/function/train.py:72-86 +
    DistributedSampler per-rank shards): each process holds only its shard
    of the global batch, so the global array must be assembled with
    ``jax.make_array_from_process_local_data`` — the per-host shards become
    one global array whose addressable pieces live on each host's devices;
    no data crosses DCN.
    """
    sh = batch_sharding(mesh, batch_dim)
    # decide by the MESH, not the global process count: a rank-0-only eval
    # over jax.local_devices() must use plain device_put even in a
    # multi-host job (make_array_from_process_local_data is collective and
    # would hang the one participating process)
    multiprocess = len({d.process_index for d in mesh.devices.flat}) > 1

    def put(x):
        if x is None:
            return None
        if multiprocess:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def fsdp_sharding_rules(mesh, tree, min_size=2**13):
    """ZeRO-3-style state sharding over the 'data' axis.

    Every float leaf with >= min_size elements is sharded on its largest
    'data'-divisible dimension; small or indivisible leaves (and scalars
    like the step counter) stay replicated. Applied to the whole
    TrainState, the Adam moments shard identically to their params (the
    pytree paths mirror). XLA's partitioner inserts the all-gather before
    each use and the reduce-scatter after the backward — no collectives in
    user code (the "How to Scale Your Model" FSDP recipe).

    On a 2-D (data, model) mesh this composes with tensor parallelism:
    big kernels first take param_sharding_rules' 'model' placement, then
    FSDP claims the largest still-unsharded divisible dim for 'data' —
    the standard TP-within / FSDP-across hybrid.

    Why: pure DP replicates params + fp32 Adam moments on every chip
    (~4.5 GB for VL-BERT-large + AdamW); over a v5e-8 data axis FSDP cuts
    that to ~0.6 GB/chip, freeing HBM for activations/batch. Compute is
    unchanged — only where the state lives between steps.
    """
    dp = mesh.shape.get("data", 1)
    rep = replicated(mesh)
    base = param_sharding_rules(mesh, tree)   # 'model' placement (or rep)
    if dp == 1:
        return base

    def rule(_path, leaf, tp_sh):
        shape = getattr(leaf, "shape", None)
        if (shape is None or len(shape) == 0
                or not jax.numpy.issubdtype(
                    getattr(leaf, "dtype", np.int32), np.floating)
                or int(np.prod(shape)) < min_size):
            return tp_sh
        spec = list(tp_sh.spec) + [None] * (len(shape) - len(tp_sh.spec))
        cands = [(ext, i) for i, ext in enumerate(shape)
                 if spec[i] is None and ext % dp == 0]
        if not cands:
            return tp_sh
        _, dim = max(cands)
        spec[dim] = "data"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, tree, base)


def param_sharding_rules(mesh, params):
    """Sharding for the param tree (TP building block; the training loop
    itself runs pure DP — SURVEY §2.6 marks TP as an optional extra).

    Pure DP: everything replicated. With a 'model' axis in the mesh, large
    matmul weights (attention/FFN kernels) are sharded over it on their
    output dim — enough to fit VL-BERT-large activations+optimizer state on
    small chips; XLA inserts the all-gathers/reduce-scatters. Covers all
    three encoder layouts: separate q/k/v, fused 'qkv', and scan-stacked
    [L, in, out] kernels.
    """
    if "model" not in mesh.axis_names or mesh.shape.get("model", 1) == 1:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: rep, params)

    mdl = mesh.shape["model"]
    COL = ("intermediate", "query", "key", "value", "qkv")   # output-sharded
    ROW = ("output_dense",)                                  # input-sharded

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(n) for n in names)
        if "kernel" not in joined:
            return replicated(mesh)
        col = any(t in joined for t in COL)
        row = any(t in joined for t in ROW)
        if leaf.ndim == 2:
            if col and leaf.shape[-1] % mdl == 0:
                return NamedSharding(mesh, P(None, "model"))
            if row and leaf.shape[0] % mdl == 0:
                return NamedSharding(mesh, P("model", None))
        elif leaf.ndim == 3:      # scan-stacked: [L, in, out]
            if col and leaf.shape[-1] % mdl == 0:
                return NamedSharding(mesh, P(None, None, "model"))
            if row and leaf.shape[1] % mdl == 0:
                return NamedSharding(mesh, P(None, "model", None))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)
