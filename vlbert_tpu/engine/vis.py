"""Attention-map visualization: dump per-example attention probabilities.

ref: pretrain/function/vis.py:110-142 + pretrain/modules/
resnet_vlbert_for_attention_vis.py:14-60 — a forward-only pass that returns
every layer's attention probs, dumped as per-image .npy files for notebook
browsing (viz/VISUALIZATION.md). Here the probs come straight out of the
encoder's ``output_attention_probs`` path; the dump format is
{output_dir}/{index}_attention_probs.npy with shape [layers, heads, L, L]
plus a {index}_tokens.json sidecar naming each position
(text tokens | box_i | END).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def attention_probs_fn(model_vlbert):
    """Build a jittable fn returning stacked per-layer attention probs."""

    def fn(params, text_ids, text_types, text_visual, text_mask,
           obj_vl, box_mask):
        _, _, probs = model_vlbert.apply(
            params, text_ids, text_types, text_visual, text_mask,
            obj_vl, box_mask, deterministic=True,
            output_attention_probs=True)
        return jnp.stack(probs, axis=1)      # [B, layers, heads, L, L]

    return fn


def dump_attention_maps(model_vlbert, params, batches, tokenizer,
                        output_dir):
    """Run the vis forward over batches and write .npy + token sidecars."""
    os.makedirs(output_dir, exist_ok=True)
    fn = jax.jit(attention_probs_fn(model_vlbert))
    index = 0
    for (text_ids, text_types, text_visual, text_mask, obj_vl,
         box_mask) in batches:
        probs = np.asarray(jax.device_get(
            fn(params, text_ids, text_types, text_visual, text_mask,
               obj_vl, box_mask)), np.float32)
        B, _, _, L, _ = probs.shape
        T = text_ids.shape[1]
        O = obj_vl.shape[1]
        for b in range(B):
            np.save(os.path.join(output_dir,
                                 f"{index}_attention_probs.npy"), probs[b])
            toks = tokenizer.convert_ids_to_tokens(
                [int(t) for t in np.asarray(text_ids[b])])
            names = ([t if m else "[PAD]"
                      for t, m in zip(toks, np.asarray(text_mask[b]))]
                     + [f"box_{i}" if np.asarray(box_mask[b])[i] else "[PAD]"
                        for i in range(O)]
                     + ["[END]"])
            with open(os.path.join(output_dir, f"{index}_tokens.json"),
                      "w") as f:
                json.dump(names, f)
            index += 1
    return index
