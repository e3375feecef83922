"""Shared CLI for the task entry points (ref: vcr/train_end2end.py:11-48).

Preserved flags: --cfg, --model-dir, --log-dir, --do-test; --dist now means
multi-host jax.distributed instead of NCCL process groups.
"""

from __future__ import annotations

import argparse
import os


def _apply_env_device_overrides():
    """VLBERT_TPU_NUM_CPU_DEVICES=N forces an N-device virtual CPU platform
    (XLA_FLAGS is ineffective where sitecustomize imports jax at startup)."""
    n = os.environ.get("VLBERT_TPU_NUM_CPU_DEVICES")
    if n:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", int(n))
        except RuntimeError:
            pass


def parse_args(task, description):
    _apply_env_device_overrides()
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--cfg", type=str, required=True,
                        help="path to experiment yaml")
    parser.add_argument("--model-dir", type=str, default="",
                        help="root path to store checkpoints")
    parser.add_argument("--log-dir", type=str, default=None)
    parser.add_argument("--dist", action="store_true",
                        help="multi-host: calls jax.distributed.initialize()")
    parser.add_argument("--do-test", action="store_true",
                        help="run test after training")
    parser.add_argument("--ckpt", type=str, default="",
                        help="(test) checkpoint path; default <prefix>-best.model")
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--result-path", type=str, default="./results")
    parser.add_argument("--result-name", type=str, default="result")
    args, rest = parser.parse_known_args()
    return args


def maybe_init_distributed(args):
    if args.dist:
        import jax

        jax.distributed.initialize()
