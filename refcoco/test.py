"""RefCOCO+ test entry: pred boxes json + local accuracy (ref: refcoco/test.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from vlbert_tpu.engine.cli import maybe_init_distributed, parse_args
from vlbert_tpu.engine.test import test_net_refcoco
from vlbert_tpu.utils.config import load_config


def main():
    args = parse_args("refcoco", "Test VL-BERT (RefCOCO+) on TPU")
    maybe_init_distributed(args)
    config = load_config("refcoco", args.cfg)
    os.makedirs(args.result_path, exist_ok=True)
    out = os.path.join(args.result_path, f"{args.result_name}.json")
    ckpt = args.ckpt or os.path.join(args.model_dir, "vlbert_tpu-best.model")
    _, acc = test_net_refcoco(config, ckpt, out, mode=args.split)
    print(f"RefCOCO accuracy@0.5: {acc:.4f}")


if __name__ == "__main__":
    main()
