"""Single-query serving path + latency measurement.

BASELINE.json's headline includes "p50 VQA query latency tracked". This
module provides the production serving shape: a pre-compiled batch-1
inference function over static buckets, host-side tokenization/assembly, and
a latency probe reporting p50/p90/p99 over distinct queries.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from vlbert_tpu.data.collate import assemble_qa_text


def _walk_mappings(node):
    """Yield every mapping node in a pytree (pre-order)."""
    if isinstance(node, dict) or hasattr(node, "items"):
        yield node
        for v in node.values():
            yield from _walk_mappings(v)


class VQAServer:
    """Holds compiled inference for one static (max_text, max_boxes) bucket.

    ``quantize="int8"`` stores matmul kernels in HBM as per-channel int8
    (ops/quant.py) and dequantizes inside the jitted program — weight
    traffic halves vs bf16, which is what batch-1 latency is made of.
    """

    def __init__(self, model, params, tokenizer, answer_vocab,
                 max_text=64, max_boxes=108, feat_dim=2048, quantize=None,
                 quantize_min_size=4096):
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode: {quantize!r}")
        self.model = model
        self.quantize = quantize
        self.quantize_min_size = quantize_min_size
        self.tokenizer = tokenizer
        self.answer_vocab = answer_vocab
        self.max_text = max_text
        self.max_boxes = max_boxes
        self.feat_dim = feat_dim
        if quantize == "int8":
            from vlbert_tpu.ops.quant import dequantize_params

            def infer(qp, *b):
                return model.apply(dequantize_params(qp), *b,
                                   train=False)["label_logits"]
            self._infer = jax.jit(infer)
        else:
            self._infer = jax.jit(
                lambda p, *b: model.apply(p, *b, train=False)["label_logits"])
        self.params = params  # property: quantizes + stages on device

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, value):
        if value is not None and self.quantize == "int8":
            from vlbert_tpu.ops.quant import is_quantized_leaf, quantize_params
            if not any(is_quantized_leaf(n) for n in _walk_mappings(value)):
                value = jax.device_put(quantize_params(
                    jax.device_get(value),
                    min_size=self.quantize_min_size))
        self._params = value

    def preprocess(self, question, boxes, features, im_w, im_h):
        """Host-side: tokenize + assemble + pad one query."""
        q_ids = self.tokenizer.convert_tokens_to_ids(
            self.tokenizer.tokenize(question))
        ids, types, _tags, tmask, ans_pos = assemble_qa_text(
            q_ids, [0] * len(q_ids), [self.tokenizer.mask_id], [0],
            self.max_text, self.tokenizer.cls_id, self.tokenizer.sep_id)
        n = min(len(boxes), self.max_boxes)
        box_buf = np.full((self.max_boxes, 4 + self.feat_dim), -2.0,
                          np.float32)
        box_buf[:n, :4] = boxes[:n]
        box_buf[:n, 4:] = features[:n]
        box_mask = np.zeros(self.max_boxes, bool)
        box_mask[:n] = True
        im_info = np.asarray([im_w, im_h, 1.0, 1.0], np.float32)
        return (None, box_buf[None], box_mask[None], im_info[None],
                ids[None], types[None], tmask[None],
                np.asarray([ans_pos - 1], np.int32))

    def query(self, question, boxes, features, im_w, im_h):
        batch = self.preprocess(question, boxes, features, im_w, im_h)
        logits = np.asarray(jax.device_get(self._infer(self.params, *batch)))
        return self.answer_vocab[int(np.argmax(logits[0]))]

    def measure_latency(self, queries, warmup=3, fetch=False):
        """p50/p90/p99 ms over distinct preprocessed queries.

        ``fetch=True`` times through a full logits device_get instead of
        block_until_ready — what a real serving call pays (and the only
        reliable completion barrier on tunneled device plugins, where
        block_until_ready has been observed returning early)."""
        batches = [self.preprocess(*q) for q in queries]
        for b in batches[:warmup]:
            jax.block_until_ready(self._infer(self.params, *b))
        lat = []
        for b in batches:
            t0 = time.perf_counter()
            out = self._infer(self.params, *b)
            if fetch:
                np.asarray(jax.device_get(out))
            else:
                jax.block_until_ready(out)
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.asarray(lat)
        return {"p50_ms": float(np.percentile(lat, 50)),
                "p90_ms": float(np.percentile(lat, 90)),
                "p99_ms": float(np.percentile(lat, 99)),
                "n": len(lat)}
