"""Single-query serving path + latency measurement.

BASELINE.json's headline includes "p50 VQA query latency tracked" and its
tracked configs include "RefCOCO+ VL-BERT-base inference on one val image
with ground-truth boxes". This module provides the production serving
shape for both: a pre-compiled batch-1 inference function over static
buckets, host-side tokenization/assembly, and a latency probe reporting
p50/p90/p99 over distinct queries plus an RTT-cancelled device-compute
slope.
"""

from __future__ import annotations

import functools
import time

import jax
import numpy as np

from vlbert_tpu.data.collate import (assemble_expression_text,
                                     assemble_qa_text, pad_to)


def _walk_mappings(node):
    """Yield every mapping node in a pytree (pre-order)."""
    if isinstance(node, dict) or hasattr(node, "items"):
        yield node
        for v in node.values():
            yield from _walk_mappings(v)


def _jit_infer(model, quantize, select):
    """Compile batch-1 inference; int8 mode dequantizes INSIDE the program
    (XLA fuses convert+scale into the matmul operand load — weight HBM
    traffic halves vs bf16, which is what batch-1 latency is made of)."""
    if quantize == "int8":
        from vlbert_tpu.ops.quant import dequantize_params

        def infer(qp, *b):
            return select(model.apply(dequantize_params(qp), *b,
                                      train=False))
    else:
        def infer(p, *b):
            return select(model.apply(p, *b, train=False))
    return jax.jit(infer)


class _QuantizableServer:
    """Shared server plumbing: int8 weight staging + latency probes.

    Subclasses set ``self._infer`` (a jitted ``(params, *batch) -> out``)
    before assigning ``self.params``; ``out`` may be an array or a pytree.
    """

    def _init_common(self, model, params, quantize, quantize_min_size):
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode: {quantize!r}")
        self.model = model
        self.quantize = quantize
        self.quantize_min_size = quantize_min_size
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

    def measure_latency(self, queries, warmup=3, fetch=False):
        """p50/p90/p99 ms over distinct preprocessed queries.

        ``fetch=True`` times through a full output device_get instead of
        block_until_ready — what a real serving call pays (and the only
        reliable completion barrier on tunneled device plugins, where
        block_until_ready has been observed returning early)."""
        fetch_np = (lambda o: jax.tree_util.tree_map(
            np.asarray, jax.device_get(o)))
        batches = [self.preprocess(*q) for q in queries]
        for b in batches[:warmup]:
            out = self._infer(self.params, *b)
            if fetch:
                # warm the SAME completion path as the measurement: the
                # first device_get on a tunneled plugin pays a one-time
                # transfer-path setup (observed: ~35 s!) that would land in
                # the p99 if warmup only block_until_ready'd
                fetch_np(out)
            else:
                jax.block_until_ready(out)
        lat = []
        for b in batches:
            t0 = time.perf_counter()
            out = self._infer(self.params, *b)
            if fetch:
                fetch_np(out)
            else:
                jax.block_until_ready(out)
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.asarray(lat)
        return {"p50_ms": float(np.percentile(lat, 50)),
                "p90_ms": float(np.percentile(lat, 90)),
                "p99_ms": float(np.percentile(lat, 99)),
                "n": len(lat)}

    def measure_device_compute(self, queries, k1=8, k2=24, reps=3):
        """Slope-timed device compute per query (ms), RTT-cancelled.

        p50 through a fetch includes the host<->device round trip (~35 ms
        on the tunneled test rig), which swamps sub-millisecond device
        compute and hides serving optimizations like int8 weights. This
        probe pre-stages the preprocessed queries on device, chains k
        dispatches into one scalar via dataflow (the terminal value fetch
        provably waits for all k), and reports (t(k2)-t(k1))/(k2-k1) —
        per-query device time with the constant RTT cancelled. Same
        methodology as bench.py's slope timing.

        Per-DISPATCH slope timing is unusable on the tunneled plugin: each
        dispatch is a network call with multi-ms jitter, so a k2-k1 = 16
        dispatch delta (~8 ms of device work) drowns in RTT noise —
        observed live: the same server measured 0.47, 0.82 and 1.55
        ms/query across runs, inverting the int8-vs-bf16 verdict, with
        single-capture slope spreads of [0.01, 2.8] ms. This probe instead
        chains the k inferences INSIDE one jitted program (``lax.scan``
        over the k pre-staged queries): one dispatch + one scalar fetch
        per sample, so each sample pays the RTT exactly once and
        (t(k2)-t(k1))/(k2-k1) is pure device time. The median of ``reps``
        samples is reported with the min/max spread.

        Serialization note (ADVICE r3): inside the scan the k inferences
        are strictly sequential on the device, so this is isolated
        per-query device latency, not pipelined throughput.
        """
        import jax.numpy as jnp

        staged = [self.preprocess(*q) for q in queries]

        def stack_k(k):
            reps_q = [staged[j % len(staged)] for j in range(k)]
            return jax.device_put(jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *reps_q))

        infer = self._infer  # jitted callable; traces through under jit

        @functools.partial(jax.jit, static_argnums=())
        def chained(params, stacked):
            def body(c, q):
                out = infer(params, *q)
                return c + sum(l.sum().astype(jnp.float32)
                               for l in jax.tree_util.tree_leaves(out)), None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), stacked)
            return c

        s1, s2 = stack_k(k1), stack_k(k2)

        def run(stacked):
            t0 = time.perf_counter()
            float(chained(self.params, stacked))   # fetch = barrier
            return time.perf_counter() - t0

        run(s1); run(s2)             # compile both chain lengths
        slopes = []
        for _ in range(max(1, reps)):
            t1, t2 = run(s1), run(s2)
            slopes.append((t2 - t1) / (k2 - k1) * 1e3)
        return {"device_ms_per_query": round(float(np.median(slopes)), 4),
                "slope_spread_ms": [round(min(slopes), 4),
                                    round(max(slopes), 4)],
                "k1": k1, "k2": k2, "reps": len(slopes)}


class VQAServer(_QuantizableServer):
    """Holds compiled inference for one static (max_text, max_boxes) bucket.

    ``quantize="int8"`` stores matmul kernels in HBM as per-channel int8
    (ops/quant.py) and dequantizes inside the jitted program — weight
    traffic halves vs bf16, which is what batch-1 latency is made of.
    """

    def __init__(self, model, params, tokenizer, answer_vocab,
                 max_text=64, max_boxes=108, feat_dim=2048, quantize=None,
                 quantize_min_size=4096):
        self.tokenizer = tokenizer
        self.answer_vocab = answer_vocab
        self.max_text = max_text
        self.max_boxes = max_boxes
        self.feat_dim = feat_dim
        self._infer = _jit_infer(model, quantize,
                                 lambda out: out["label_logits"])
        self._init_common(model, params, quantize, quantize_min_size)

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


class RefCOCOServer(_QuantizableServer):
    """Single-image referring-expression grounding (BASELINE.json tracked
    config: "RefCOCO+ VL-BERT-base inference on one val image with
    ground-truth boxes" — ref refcoco/test.py + refcoco/function/test.py).

    Runs the FULL end-to-end path on device: raw image through the
    ResNet-101 + ROIAlign backbone, [CLS] expr [SEP] text, per-candidate
    grounding logits, argmax box rescaled to original image coords
    (models/task_modules.py ResNetVLBERTForRefCOCO, not-train branch).
    Preprocessing reuses the eval transform pipeline verbatim
    (data/transforms.build_transforms), so serving sees exactly the tensors
    the test entrypoint would produce; static (orientation, max_boxes,
    max_text) buckets keep one compile per bucket.
    """

    def __init__(self, model, params, tokenizer, transform,
                 max_text=24, max_boxes=16, add_image_as_a_box=True,
                 quantize=None, quantize_min_size=4096):
        self.tokenizer = tokenizer
        self.transform = transform
        self.max_text = max_text
        self.max_boxes = max_boxes
        self.add_image_as_a_box = add_image_as_a_box
        self._infer = _jit_infer(
            model, quantize,
            lambda out: {"label_logits": out["label_logits"],
                         "pred_boxes": out["pred_boxes"]})
        self._init_common(model, params, quantize, quantize_min_size)

    def preprocess(self, image, boxes, expression):
        """image: uint8/float RGB [H0,W0,3]; boxes: [N,4] candidate boxes in
        ORIGINAL image coords (gt boxes for the tracked config); expression:
        the referring phrase. Mirrors data/datasets/refcoco.py test mode."""
        image = np.asarray(image)
        h0, w0 = image.shape[:2]
        boxes = np.asarray(boxes, np.float32).copy()
        if self.add_image_as_a_box:
            boxes = np.concatenate(
                [np.asarray([[0, 0, w0 - 1, h0 - 1]], np.float32), boxes], 0)
        s = {"image": image, "boxes": boxes, "masks": None,
             "im_info": np.asarray([w0, h0, 1.0, 1.0], np.float32),
             "flipped": False}
        if self.transform is not None:
            s = self.transform(s)
        image, boxes, im_info = s["image"], s["boxes"], s["im_info"]
        w, h = float(im_info[0]), float(im_info[1])
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w - 1)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h - 1)

        expr_ids = self.tokenizer.convert_tokens_to_ids(
            self.tokenizer.tokenize(expression))
        ids, tmask = assemble_expression_text(
            expr_ids, self.max_text, self.tokenizer.cls_id,
            self.tokenizer.sep_id)
        n = min(len(boxes), self.max_boxes)
        box_buf = pad_to(boxes, (self.max_boxes, 4), -2.0, np.float32)
        box_mask = np.zeros(self.max_boxes, bool)
        box_mask[:n] = True
        return (image[None], box_buf[None], box_mask[None],
                np.asarray(im_info, np.float32)[None],
                ids[None], tmask[None])

    def query(self, image, boxes, expression):
        """Returns a consistent triple over the CALLER's candidate list:
        {"box": [4] the best candidate box in ORIGINAL coords,
         "best_index": its index into the caller's list,
         "candidate_scores": [N] sigmoid scores,
         "image_box_score": score of the prepended whole-image box (or None)}.

        Note a deliberate difference from the reference eval
        (refcoco/function/test.py:20-97 argmaxes over ALL slots including
        the prepended whole-image box): serving picks from the caller's
        candidates only, so "box" always corresponds to "best_index"
        (ADVICE r3). The whole-image score is exposed so callers can detect
        "the model preferred the whole image" themselves."""
        batch = self.preprocess(image, boxes, expression)
        out = jax.device_get(self._infer(self.params, *batch))
        logits = np.asarray(out["label_logits"])[0]
        off = 1 if self.add_image_as_a_box else 0
        n = min(len(boxes), self.max_boxes - off)
        cand = logits[off:off + n]
        best = int(np.argmax(cand))
        return {"box": np.asarray(boxes[best], np.float32),
                "best_index": best,
                "candidate_scores": 1.0 / (1.0 + np.exp(-cand)),
                "image_box_score": float(1.0 / (1.0 + np.exp(-logits[0])))
                if self.add_image_as_a_box else None}
