"""Weight-only int8 quantization for serving.

TPU-native serving optimization with no reference counterpart (the
reference serves fp32/fp16 eager torch): matmul weights are stored in HBM
as per-output-channel symmetric int8 and dequantized *inside* the jitted
inference program. XLA fuses the ``convert(int8->bf16) * scale`` into the
matmul's operand load, so weight HBM traffic halves vs bf16 (4x vs fp32)
while the MXU still computes in bf16. Batch-1 serving is weight-bandwidth
bound, so this directly cuts single-query latency.

Measured accuracy impact (what the evidence actually shows — see
results/int8_base_scale.json, tools/int8_accuracy.py, and
tests/test_serve.py::test_int8_base_scale_argmax_stability): at base scale
(768x12x30522, random-weight checkpoints) per-channel int8 perturbs VQA
logits by <= 0.035 max (logit std 0.45) and RefCOCO+ logits by <= 0.013,
with zero argmax flips beyond the 2*delta top-2-margin bound on either
head (raw flips occur only at near-ties whose top-2 margin is smaller
than what ANY perturbation of the measured size could preserve — such
ties also flip with backend reduction order and say nothing about int8). Real-data accuracy deltas would
need trained checkpoints + datasets, which this environment does not have;
the ±0.3% parity budget is therefore supported mechanically (small bounded
logit noise, stable argmax), not proven on benchmark data.

Scope: leaves named ``kernel`` with ndim >= 2 (Dense [in, out] and conv
[kh, kw, in, out] kernels), scale computed over all axes but the last.
Embedding tables are NOT quantized by default: their consumer is a gather,
and XLA is not guaranteed to commute the dequant through it — a
materialized dequantized vocab table would cost more bandwidth than it
saves. Biases / LayerNorm / small leaves stay in full precision (they are
noise in both bytes and FLOPs).

Host-side quantization is numpy; the dequant path is jax and traces into
the serving program.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

# Sentinel key marking a quantized leaf inside the params pytree. A
# quantized leaf is the dict {_Q8: int8 values, _Q8_SCALE: f32 scale}
# (nested dicts are ordinary pytrees, so the quantized tree passes through
# jit / device_put unchanged).
_Q8 = "__int8_q__"
_Q8_SCALE = "__int8_scale__"


def quantize_leaf(w: np.ndarray) -> dict:
    """Per-output-channel symmetric int8: scale over all axes but the last.

    q = clip(rint(w / scale), -127, 127), scale = amax / 127 (symmetric, no
    zero point — transformer kernels are near zero-mean, and symmetric
    quantization keeps the dequant a single fused multiply).
    """
    w = np.asarray(w)
    reduce_axes = tuple(range(w.ndim - 1))
    amax = np.max(np.abs(w), axis=reduce_axes, keepdims=True)
    scale = (np.maximum(amax, 1e-12) / 127.0).astype(np.float32)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {_Q8: q, _Q8_SCALE: scale}


def is_quantized_leaf(node: Any) -> bool:
    return isinstance(node, Mapping) and _Q8 in node


def dequantize_leaf(node: Mapping, dtype=jnp.float32) -> jnp.ndarray:
    """jax-traceable dequant; fuses into the consuming matmul under jit."""
    return node[_Q8].astype(dtype) * node[_Q8_SCALE].astype(dtype)


def _should_quantize(key: str, leaf: np.ndarray, min_size: int) -> bool:
    return (key == "kernel" and getattr(leaf, "ndim", 0) >= 2
            and leaf.size >= min_size
            and np.issubdtype(np.asarray(leaf).dtype, np.floating))


def quantize_params(params: Any, min_size: int = 4096) -> Any:
    """Replace matmul kernels in a params pytree with int8 leaf dicts.

    Host-side (numpy) — run once at server load. ``min_size`` skips tiny
    kernels where quantization saves nothing but costs a fusion.
    """
    def walk(node):
        if isinstance(node, Mapping):
            return {k: (quantize_leaf(np.asarray(v))
                        if not isinstance(v, Mapping)
                        and _should_quantize(k, v, min_size)
                        else walk(v))
                    for k, v in node.items()}
        return node

    return walk(params)


def dequantize_params(params: Any, dtype=jnp.float32) -> Any:
    """Inverse of quantize_params, traceable: int8 leaves -> dtype arrays.

    Call INSIDE the jitted inference function so the dequant fuses into
    each matmul and the int8 representation is what lives in HBM. Default
    dtype is float32: the model's own dtype policy re-casts at each use
    site (e.g. to bf16), and XLA fuses the whole int8->f32->bf16 chain into
    the matmul operand load either way.
    """
    def walk(node):
        if is_quantized_leaf(node):
            return dequantize_leaf(node, dtype)
        if isinstance(node, Mapping):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def quantized_bytes(params: Any) -> dict:
    """Byte accounting: how much HBM the quantized tree saves."""
    q_bytes = full_bytes = 0
    def walk(node):
        nonlocal q_bytes, full_bytes
        if is_quantized_leaf(node):
            q_bytes += node[_Q8].size + node[_Q8_SCALE].size * 4
            full_bytes += node[_Q8].size * 4
            return
        if isinstance(node, Mapping):
            for v in node.values():
                walk(v)
            return
        if node is None:
            return
        nbytes = node.size * np.dtype(node.dtype).itemsize
        q_bytes += nbytes
        full_bytes += nbytes

    walk(params)
    return {"quantized_bytes": int(q_bytes), "fp32_bytes": int(full_bytes)}
