"""Integrated host->device training measurement (VERDICT r3 missing #3).

bench.py times the DEVICE with pre-staged inputs; bench_host.py times the
LOADER alone. This tool runs the real thing end-to-end on the chip:
``engine/train.py:train_net`` -> fork-pool/thread loader -> decode ->
transform -> collate -> ``shard_batch`` -> jitted train step, i.e. the
same integrated loop the reference's Speedometer times
(ref common/callbacks/batch_end_callbacks/speedometer.py:47-72).

Workload: the shipped ``cfgs/vcr/base_q2a_v5e_bf16.yaml`` (e2e ResNet-101,
B=16, bf16) over a synthetic VCR fixture of distinct 640x640 JPEGs, with
SCALES/buckets pinned to the bench graph (608px canvas, 36 boxes, 48 text)
so the device-side step is directly comparable to BENCH's
``train_step_b16`` img/s.

Captures the Speedometer windows (samples/s + the four phases: Data =
loader wait, Tran = H2D dispatch, Step = jit dispatch, Sync = the
LOG_FREQUENT fetch barrier that drains the queued H2D + compute backlog)
from the training log, drops the compile window, and writes
``results/integrated_train.json``:

  * sustained_img_per_s      — steady-state integrated rate
  * data_fraction            — fraction of wall spent waiting on the host
  * device_img_per_s         — implied device-only rate (batch / non-data)
  * vs_bench_device_rate     — sustained / BENCH train_step_b16 rate
  * h2d_probe                — measured host->device bandwidth (blocking
    device_put of the batch's uint8 image tensor); over this rig's
    TUNNELED device plugin this is a network hop, not local PCIe — the
    probe separates environment cost from framework cost
  * projected_img_per_s_local_host — what the same loop sustains with
    local-PCIe H2D (transfer hidden behind compute): data + device step
  * cores_needed_for_device_rate — host cores required to feed the chip,
    from the measured per-core source rate (this rig has ONE vCPU; a real
    v5e TPU-VM host has 100+)

Run: python tools/integrated_train_bench.py [--steps 55] [--batch 16]
"""

import argparse
import json
import logging
import os
import re
import sys
import tempfile
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# bench.py's published device-only rate for the same graph (B=16, 608px,
# 36 boxes, 4x48 text); refreshed each round from BENCH_r{N}/results —
# round 4: 170.5 img/s after the bits16-dropout + rbg fix
# (results/xla_flag_probe.json "baseline")
BENCH_B16_IMG_PER_S = 170.5


class _SpeedoCapture(logging.Handler):
    """Parses Speedometer lines from vlbert_tpu.training.loop."""

    RE = re.compile(r"Speed: ([\d.]+) samples/sec.*"
                    r"Data: ([\d.]+)s Tran: ([\d.]+)s Step: ([\d.]+)s "
                    r"Sync: ([\d.]+)s")

    def __init__(self):
        super().__init__()
        self.windows = []

    def emit(self, record):
        m = self.RE.search(record.getMessage())
        if m:
            self.windows.append({"img_per_s": float(m.group(1)),
                                 "data_s_per_batch": float(m.group(2)),
                                 "tran_s_per_batch": float(m.group(3)),
                                 "step_s_per_batch": float(m.group(4)),
                                 "sync_s_per_batch": float(m.group(5))})


def build_fixture(d, n):
    """Synthetic VCR train/val fixture with distinct square JPEGs sized so
    the eval transform yields exactly the 608x608 bench canvas."""
    import numpy as np

    from bench_host import _make_fixture, _write_vocab

    vocab = _write_vocab(d)
    _make_fixture(d, n=n, w=640, h=640)
    os.replace(os.path.join(d, "ann.jsonl"), os.path.join(d, "train.jsonl"))
    with open(os.path.join(d, "train.jsonl")) as f:
        rows = f.read().splitlines()
    with open(os.path.join(d, "val.jsonl"), "w") as f:
        f.write("\n".join(rows[:8]))
    vdir = os.path.join(d, "bert")
    os.makedirs(vdir, exist_ok=True)
    os.replace(vocab, os.path.join(vdir, "vocab.txt"))
    return d, vdir


def run(steps=55, batch=16, log_frequent=10):
    from vlbert_tpu.engine.train import train_net
    from vlbert_tpu.utils.config import load_config

    tmp = tempfile.mkdtemp(prefix="vlbert_integrated_")
    data_dir, vocab_dir = build_fixture(tmp, n=steps * batch)

    cfg = load_config("vcr", os.path.join(
        REPO, "cfgs/vcr/base_q2a_v5e_bf16.yaml"))
    cfg.OUTPUT_PATH = os.path.join(tmp, "out")
    cfg.LOG_FREQUENT = log_frequent
    cfg.NETWORK.PARTIAL_PRETRAIN = ""      # no trained ckpts in this env
    cfg.NETWORK.IMAGE_PRETRAINED = ""
    cfg.NETWORK.BERT_MODEL_NAME = vocab_dir
    d = cfg.DATASET
    d.DATASET_PATH = data_dir
    d.ROOT_PATH = data_dir
    d.TRAIN_ANNOTATION_FILE = "train.jsonl"
    d.VAL_ANNOTATION_FILE = "val.jsonl"
    d.IGNORE_DB_CACHE = True
    cfg.TRAIN.BATCH_IMAGES = batch
    cfg.TRAIN.END_EPOCH = 1
    # pin the image/box/text buckets to the bench graph so device_img_per_s
    # is apples-to-apples with BENCH train_step_b16
    cfg.SCALES = [608, 608]
    cfg.TPU.MAX_BOXES = 36
    cfg.TPU.MAX_TEXT_LEN = 48

    cap = _SpeedoCapture()
    logging.getLogger("vlbert_tpu.training.loop").addHandler(cap)
    args = types.SimpleNamespace(model_dir=cfg.OUTPUT_PATH, log_dir=None)
    try:
        train_net(args, cfg, "vcr")
    finally:
        logging.getLogger("vlbert_tpu.training.loop").removeHandler(cap)

    if len(cap.windows) < 2:
        raise RuntimeError(f"too few Speedometer windows: {cap.windows}")
    steady = cap.windows[1:]           # window 0 contains the jit compile
    sus = sum(w["img_per_s"] for w in steady) / len(steady)
    # per-batch wall from the speed; phase seconds are per-batch averages
    wall = batch / max(sus, 1e-9)

    def avg(key):
        return sum(w[key] for w in steady) / len(steady)

    data_s = avg("data_s_per_batch")
    tran_s = avg("tran_s_per_batch")
    step_s = avg("step_s_per_batch")
    sync_s = avg("sync_s_per_batch")
    data_frac = data_s / max(wall, 1e-9)
    # Tran (H2D dispatch) + Step (async step dispatch) + Sync (the
    # LOG_FREQUENT fetch barrier that drains the queued H2D + compute
    # backlog) together are the device-side share of the wall
    dev_rate = batch / max(wall - data_s, 1e-9)
    host_rate = batch / max(data_s, 1e-9) if data_s > 1e-4 else None
    n_cpus = os.cpu_count() or 1

    h2d = _h2d_probe(batch)
    device_step_s = batch / BENCH_B16_IMG_PER_S
    # what the same loop sustains when H2D is local-PCIe-fast (>= 8 GB/s:
    # sub-3ms/batch, hidden behind compute): host + device only
    projected = batch / max(data_s + device_step_s, 1e-9)
    out = {
        "config": "cfgs/vcr/base_q2a_v5e_bf16.yaml "
                  "(SCALES->608, boxes->36, text->48: the bench graph)",
        "batch": batch,
        "steps_measured": len(steady) * log_frequent,
        "host_cpus": n_cpus,
        "sustained_img_per_s": round(sus, 2),
        "data_s_per_batch": round(data_s, 4),
        "tran_s_per_batch": round(tran_s, 4),
        "step_s_per_batch": round(step_s, 4),
        "sync_s_per_batch": round(sync_s, 4),
        "data_fraction": round(data_frac, 4),
        "device_img_per_s_implied": round(dev_rate, 2),
        "bench_train_step_b16_img_per_s": BENCH_B16_IMG_PER_S,
        "vs_bench_device_rate": round(sus / BENCH_B16_IMG_PER_S, 4),
        "h2d_probe": h2d,
        "projected_img_per_s_local_host": round(projected, 2),
        "vs_bench_device_rate_projected": round(
            projected / BENCH_B16_IMG_PER_S, 4),
        "windows": cap.windows,
    }
    if host_rate is not None:
        # the host sources images at host_rate while the consumer sleeps in
        # next(); cores needed scales linearly (workers are embarrassingly
        # parallel decode+transform+tokenize)
        out["host_source_img_per_s_per_core"] = round(host_rate / n_cpus, 2)
        out["cores_needed_for_device_rate"] = round(
            dev_rate / (host_rate / n_cpus), 2)
    return out


def _h2d_probe(batch, img=608, k=4):
    """Measure this rig's host->device transfer bandwidth directly: a
    blocking ``device_put`` of the batch's uint8 image tensor (its dominant
    wire payload). On a real TPU-VM host this is a local PCIe/DMA copy
    (>= 8 GB/s); over this rig's tunneled device plugin it is a network
    round-trip — the probe quantifies the gap so the integrated artifact
    can separate environment cost from framework cost."""
    import time

    import jax
    import numpy as np

    x = np.random.randint(0, 255, (batch, img, img, 3), np.uint8)
    jax.device_put(x).block_until_ready()          # warm path
    t0 = time.time()
    for _ in range(k):
        jax.device_put(x).block_until_ready()
    dt = (time.time() - t0) / k
    mb = x.nbytes / 2**20
    return {"bytes_per_batch": x.nbytes,
            "s_per_batch": round(dt, 4),
            "mb_per_s": round(mb / max(dt, 1e-9), 1)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=55)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args(argv)
    out = run(steps=args.steps, batch=args.batch)
    path = os.path.join(REPO, "results", "integrated_train.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
