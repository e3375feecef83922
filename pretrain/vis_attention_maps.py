"""Attention-map dump entry (ref: pretrain/vis_attention_maps.py +
pretrain/function/vis.py:110-142): forward-only pass over the val set,
dumping per-example attention probabilities [layers, heads, L, L] as .npy
plus token-name sidecars for notebook browsing (see viz/README.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vlbert_tpu.engine.cli import parse_args
from vlbert_tpu.data.build import make_dataloader
from vlbert_tpu.data.tokenization import BertTokenizer
from vlbert_tpu.models.task_modules import (
    ResNetVLBERTForPretrainingMultitask, build_module)
from vlbert_tpu.utils.config import load_config


def main():
    args = parse_args("pretrain", "Dump VL-BERT attention maps")
    config = load_config("pretrain", args.cfg)
    if isinstance(config.DATASET, list):
        config.DATASET = config.DATASET[0]
    tokenizer = BertTokenizer.from_pretrained(config.NETWORK.BERT_MODEL_NAME)
    module = build_module(config, "pretrain", dtype=jnp.float32)
    loader = make_dataloader(config, "pretrain", "val", tokenizer)

    sample = next(iter(loader))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = module.init(rngs, *sample, train=False)
    if args.ckpt:
        from vlbert_tpu.engine.test import _load_params

        variables = _load_params(config, variables, args.ckpt)

    vis = jax.jit(lambda v, image, boxes, im_info, text: module.apply(
        v, image, boxes, im_info, text,
        method=ResNetVLBERTForPretrainingMultitask.attention_vis))

    out_dir = args.result_path
    os.makedirs(out_dir, exist_ok=True)
    index = 0
    for batch in loader:
        image, boxes, im_info, text = batch[:4]
        probs = np.asarray(jax.device_get(
            vis(variables, image, boxes, im_info, text)), np.float32)
        T, O = text.shape[1], boxes.shape[1]
        for b in range(probs.shape[0]):
            np.save(os.path.join(out_dir, f"{index}_attention_probs.npy"),
                    probs[b])
            toks = tokenizer.convert_ids_to_tokens(
                [int(t) for t in text[b] if t > 0])
            names = (toks + ["[PAD]"] * (T - len(toks))
                     + [f"box_{i}" for i in range(O)] + ["[END]"])
            with open(os.path.join(out_dir, f"{index}_tokens.json"), "w") as f:
                json.dump(names, f)
            index += 1
    print(f"dumped {index} attention maps to {out_dir}")


if __name__ == "__main__":
    main()
