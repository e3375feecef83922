"""VQA test entry: leaderboard answers json (ref: vqa/test.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from vlbert_tpu.engine.cli import maybe_init_distributed, parse_args
from vlbert_tpu.engine.test import test_net_vqa
from vlbert_tpu.utils.config import load_config


def main():
    args = parse_args("vqa", "Test VL-BERT (VQA) on TPU")
    maybe_init_distributed(args)
    config = load_config("vqa", args.cfg)
    with open(config.DATASET.ANSWER_VOCAB_FILE) as f:
        answer_vocab = [l.strip() for l in f if l.strip()]
    os.makedirs(args.result_path, exist_ok=True)
    out = os.path.join(args.result_path, f"{args.result_name}.json")
    ckpt = args.ckpt or os.path.join(args.model_dir, "vlbert_tpu-best.model")
    test_net_vqa(config, ckpt, answer_vocab, out, mode=args.split)


if __name__ == "__main__":
    main()
