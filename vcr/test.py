"""VCR test entry: per-choice probability csv (ref: vcr/test.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from vlbert_tpu.engine.cli import maybe_init_distributed, parse_args
from vlbert_tpu.engine.test import test_net_vcr
from vlbert_tpu.utils.config import load_config


def main():
    args = parse_args("vcr", "Test VL-BERT (VCR) on TPU")
    maybe_init_distributed(args)
    config = load_config("vcr", args.cfg)
    os.makedirs(args.result_path, exist_ok=True)
    out = os.path.join(args.result_path, f"{args.result_name}.csv")
    ckpt = args.ckpt or os.path.join(args.model_dir, "vlbert_tpu-best.model")
    test_net_vcr(config, ckpt, out, mode=args.split)


if __name__ == "__main__":
    main()
