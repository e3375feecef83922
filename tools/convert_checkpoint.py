"""Convert a reference torch checkpoint to this framework's format.

Usage:
  python tools/convert_checkpoint.py IN.model OUT.npz [--report]

Accepts reference '.model' files ({'state_dict': ...} with module./
TimeDistributed/gamma-beta era names), raw pytorch_model.bin BERT weights,
or any torch state_dict. Writes a flat .npz of {flax.dot.path: array} that
training/checkpoint.partial_load consumes directly, and engine drivers load
via --ckpt.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--report", action="store_true",
                    help="print every mapped/skipped tensor")
    args = ap.parse_args()

    import torch

    from vlbert_tpu.training.convert import (convert_bert_checkpoint,
                                             convert_state_dict)

    blob = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    if any(k.startswith(("bert.", "roberta.")) for k in sd):
        flat, skipped = convert_bert_checkpoint(sd)
    else:
        flat, skipped = convert_state_dict(sd)

    if args.report:
        for k in sorted(flat):
            print(f"  {k}  {tuple(flat[k].shape)}")
        for s in skipped:
            print(f"  SKIPPED {s}")
    np.savez(args.dst, **flat)
    # np.savez appends '.npz' when absent — report the REAL output path
    dst = args.dst if args.dst.endswith(".npz") else args.dst + ".npz"
    print(f"converted {len(flat)} tensors ({len(skipped)} skipped) -> {dst}")


if __name__ == "__main__":
    main()
