"""Real multi-PROCESS data parallelism: 2 jax processes (TCP rendezvous)
over an 8-device CPU mesh, each feeding only its host-local data shard.

This is the test the reference's NCCL DDP story maps to (ref
vcr/function/train.py:72-86: init_process_group + DistributedSampler): the
global batch is assembled from per-process shards with
``jax.make_array_from_process_local_data`` inside ``shard_batch``, gradients
are averaged across processes implicitly by jit, and params stay identical
on every host after a step.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)   # 4 local x 2 processes = 8
proc_id = int(sys.argv[1])
coord = sys.argv[2]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)

import numpy as np
import jax.numpy as jnp
from vlbert_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from vlbert_tpu.data.loader import ShardedSampler

assert jax.process_count() == 2
assert jax.device_count() == 8 and jax.local_device_count() == 4

mesh = make_mesh(None, ("data",))

# --- per-host input shard (DistributedSampler semantics) ----------------
N = 16
global_data = np.arange(N, dtype=np.float32) * 0.5          # deterministic
sampler = ShardedSampler(N, shuffle=False, num_replicas=2, rank=proc_id)
local_idx = sampler.indices()
assert len(local_idx) == 8                                   # N / 2 hosts
local_batch = global_data[local_idx]                         # [8] host-local

batch = shard_batch({"x": local_batch}, mesh)
assert batch["x"].shape == (N,)                              # GLOBAL shape

# --- global reduction sees both hosts' data -----------------------------
rep = replicated(mesh)
total = jax.jit(lambda b: jnp.sum(b["x"]), out_shardings=rep)(batch)
expected = float(global_data.sum())
got = float(jax.device_get(total))
assert abs(got - expected) < 1e-5, (got, expected)

# --- one DP train step: grads averaged over the GLOBAL batch ------------
w0 = jnp.asarray(3.0)
w0 = jax.device_put(w0, rep)

def loss_fn(w, b):
    return jnp.mean((w - b["x"]) ** 2)

@jax.jit
def step(w, b):
    g = jax.grad(loss_fn)(w, b)
    return w - 0.1 * g

w1 = float(jax.device_get(step(w0, batch)))
# analytic: grad = 2*(w - mean(global_data))
expected_w1 = 3.0 - 0.1 * 2.0 * (3.0 - float(global_data.mean()))
assert abs(w1 - expected_w1) < 1e-5, (w1, expected_w1)

print(f"RESULT {proc_id} {got:.6f} {w1:.8f}", flush=True)
"""


def test_two_process_data_parallel(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), coord],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=280)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-3000:]}"
    results = [line for rc, out, _ in outs
               for line in out.splitlines() if line.startswith("RESULT")]
    assert len(results) == 2
    # both processes computed identical global sum and identical params
    vals = {tuple(r.split()[2:]) for r in results}
    assert len(vals) == 1, results


_TRAIN_NET_WORKER = r"""
import os, sys, types, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)   # 2 local x 2 processes = 4
proc_id = int(sys.argv[1])
coord = sys.argv[2]
fixture_root = sys.argv[3]
out_root = sys.argv[4]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
assert jax.process_count() == 2 and jax.device_count() == 4

sys.path.insert(0, os.environ["VLBERT_REPO"])
from tests.test_entrypoints import _tiny_vqa_cfg
from vlbert_tpu.engine.train import train_net

data_dir = os.path.join(fixture_root, "vqa")
vocab_dir = os.path.join(fixture_root, "bert")
import pathlib
cfg = _tiny_vqa_cfg(pathlib.Path(out_root), data_dir, vocab_dir)
cfg.OUTPUT_PATH = out_root
cfg.TRAIN.END_EPOCH = 1
cfg.TRAIN.BATCH_IMAGES = 2       # x2 local devices x2 hosts = 8 global
cfg.TPU.PARTITION_MODE = os.environ.get("VLBERT_PMODE", "dp")
args = types.SimpleNamespace(model_dir=out_root, log_dir=None)
state = train_net(args, cfg, "vqa")

import numpy as np
from vlbert_tpu.training.checkpoint import flatten_params, _to_host
# _to_host gathers cross-host FSDP shards (collective; both ranks here)
flat = flatten_params(_to_host(state.params["params"]))
digest = float(sum(np.float64(np.sum(np.float64(v))) for v in flat.values()))
print(f"RESULT {proc_id} {int(state.step)} {digest:.10e}", flush=True)
"""


import pytest


@pytest.mark.parametrize("pmode", ["dp", "fsdp"])
def test_two_process_train_net(tmp_path, pmode):
    """The PRODUCTION driver end-to-end on 2 processes: per-host loader
    shards, multiprocess global-batch assembly inside fit(), collective
    validation, rank-0 checkpointing — params must be bit-identical on both
    hosts afterwards. pmode=fsdp additionally shards the TrainState across
    the two PROCESSES (leaves not fully addressable), exercising the
    collective checkpoint snapshot (snapshot_needs_all_ranks ->
    process_allgather on every rank, write on rank 0)."""
    from tests.test_entrypoints import _write_vqa_fixture

    _write_vqa_fixture(tmp_path, n=16)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    script = tmp_path / "worker_train.py"
    script.write_text(_TRAIN_NET_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["VLBERT_REPO"] = repo
    env["VLBERT_PMODE"] = pmode
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    out_root = tmp_path / "out"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), coord, str(tmp_path),
         str(out_root)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out[-2000:]}\n{err[-4000:]}"
    results = [line for rc, out, _ in outs
               for line in out.splitlines() if line.startswith("RESULT")]
    assert len(results) == 2, outs
    # both hosts: same step count and bit-identical parameter digest
    sigs = {tuple(r.split()[2:]) for r in results}
    assert len(sigs) == 1, results
    # rank 0 wrote the checkpoint
    ckpts = [f for f in os.listdir(out_root / "vqa_train")
             if f.endswith(".model")]
    assert any(f.endswith("-0000.model") for f in ckpts), ckpts
