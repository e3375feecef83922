"""vqa training entry point (ref: vqa/train_end2end.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from vlbert_tpu.engine.cli import maybe_init_distributed, parse_args
from vlbert_tpu.engine.train import train_net
from vlbert_tpu.utils.config import load_config


def main():
    args = parse_args("vqa", "Train VL-BERT (vqa) on TPU")
    maybe_init_distributed(args)
    config = load_config("vqa", args.cfg)
    state = train_net(args, config, "vqa")
    if args.do_test:
        # rank-0 post-training test (ref vcr/train_end2end.py:51-56)
        from vlbert_tpu.engine.test import do_test

        do_test(args, config, "vqa")
    return state


if __name__ == "__main__":
    main()
