"""BERT encoder core in Flax, numerically matching the reference's vendored
post-LN BERT (ref: external/pytorch_pretrained_bert/modeling.py:114-500).

TPU-first choices:
  * compute dtype is configurable (bf16 by default at the framework level);
    LayerNorm statistics and softmax always accumulate in fp32,
  * attention is a single fused einsum path XLA maps onto the MXU; a Pallas
    flash-attention kernel can be swapped in via ``ops.attention``,
  * optional ``jax.checkpoint`` rematerialization per layer,
  * static shapes only: padding is handled by the additive -10000 mask
    (ref: common/visual_linguistic_bert.py:119-127), identical math to the
    reference so masked positions contribute ~0 attention weight.

Parameter tree mirrors the torch module names (``attention.self.query`` ...)
so checkpoint conversion (training/convert.py) is a mechanical rename.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlbert_tpu.ops.dropout import Dropout, dropout_apply

ACT2FN = {
    # exact erf gelu (ref: modeling.py:114-120), NOT the tanh approximation
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "swish": jax.nn.swish,
}


def bert_dense(features, initializer_range, dtype, name=None):
    """nn.Linear equivalent with BERT's truncated-normal-ish init.

    The reference uses normal(std=initializer_range) (ref:
    common/visual_linguistic_bert.py:14-25); we match that.
    """
    return nn.Dense(
        features=features,
        kernel_init=nn.initializers.normal(stddev=initializer_range),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class BertLayerNorm(nn.Module):
    """TF-style LayerNorm, eps inside sqrt (ref: modeling.py:222-235).

    Always computed in fp32 regardless of the surrounding compute dtype.
    """

    epsilon: float = 1e-12
    out_dtype: Any = None
    scale_init_value: float = 1.0   # visual_ln_* initialize scale to a
                                    # learned constant (ref vl_bert :72-74)

    @nn.compact
    def __call__(self, x):
        out_dtype = self.out_dtype or x.dtype
        dim = x.shape[-1]
        scale = self.param(
            "scale",
            lambda rng, s: jnp.full(s, self.scale_init_value, jnp.float32),
            (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(out_dtype)


class BertSelfAttention(nn.Module):
    """Multi-head self-attention (ref: modeling.py:268-319).

    With ``fused`` set, the whole QK^T+bias+softmax(+prob-dropout)+V
    pipeline runs as one Pallas kernel (ops/attention.py):
    ``fused_attention`` when deterministic / rate 0, and
    ``fused_attention_dropout`` in training (the mask is applied to the
    probs in VMEM; 'bits16' masks are bit-identical to the XLA path).
    The output-probs (vis) path and ``DROPOUT_IMPL='ref'`` strict-parity
    runs keep the unfused XLA pipeline.
    """

    num_heads: int
    hidden_size: int
    dropout_rate: float
    initializer_range: float
    dtype: Any = jnp.float32
    fused: bool = False
    fused_qkv: bool = False
    attn_remat: bool = False

    @nn.compact
    def __call__(self, hidden, attention_bias, deterministic=True,
                 output_attention_probs=False):
        head_dim = self.hidden_size // self.num_heads
        if self.fused_qkv:
            # one [H, 3H] projection instead of three [H, H] matmuls; the
            # converter fuses reference q/k/v kernels via fuse_qkv_params
            qkv = bert_dense(3 * self.hidden_size, self.initializer_range,
                             self.dtype, "qkv")(hidden)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = bert_dense(self.hidden_size, self.initializer_range, self.dtype, "query")(hidden)
            k = bert_dense(self.hidden_size, self.initializer_range, self.dtype, "key")(hidden)
            v = bert_dense(self.hidden_size, self.initializer_range, self.dtype, "value")(hidden)

        B, L, _ = hidden.shape
        q = q.reshape(B, L, self.num_heads, head_dim)
        k = k.reshape(B, L, self.num_heads, head_dim)
        v = v.reshape(B, L, self.num_heads, head_dim)

        fused_ok = (self.fused and not output_attention_probs
                    and attention_bias.ndim == 4
                    and attention_bias.shape[1] == 1
                    and attention_bias.shape[2] == 1)
        if fused_ok and (deterministic or self.dropout_rate == 0.0):
            from vlbert_tpu.ops.attention import fused_attention

            ctx = fused_attention(q, k, v, attention_bias)
            return ctx.reshape(B, L, self.hidden_size).astype(self.dtype)
        if fused_ok:
            # training: dropout applied to the probs INSIDE the kernel —
            # the fp32 [B,H,L,L] probs never reach HBM fwd or bwd. Mask
            # semantics track the process dropout impl: 'bits16' masks are
            # bit-identical to the XLA path below (same make_rng key),
            # 'pallas' uses the in-kernel hardware PRNG on TPU. 'ref'
            # (strict bernoulli parity) keeps the XLA path.
            from vlbert_tpu.ops import dropout as dropout_mod
            impl = dropout_mod.DEFAULT_IMPL
            if impl != "ref":
                from vlbert_tpu.ops.attention import fused_attention_dropout

                key = self.make_rng("dropout")
                hw = impl == "pallas" and dropout_mod._on_tpu()
                ctx = fused_attention_dropout(
                    q, k, v, attention_bias, key,
                    float(self.dropout_rate), hw)
                return ctx.reshape(B, L, self.hidden_size).astype(self.dtype)

        if output_attention_probs:
            # vis path: probs must survive to the caller, so no remat
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(head_dim)
            scores = scores + attention_bias.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1)
            probs_out = probs
            probs = Dropout(rate=self.dropout_rate)(
                probs, deterministic=deterministic)
            probs = probs.astype(self.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(self.dtype),
                             preferred_element_type=jnp.float32)
            return ctx.reshape(B, L, self.hidden_size).astype(self.dtype), \
                probs_out

        # dropout key drawn OUTSIDE the remat boundary so the backward
        # regenerates the identical mask from the (tiny) saved key
        dropout_key = None
        if not deterministic and self.dropout_rate > 0.0:
            dropout_key = self.make_rng("dropout")

        def _core(q, k, v, bias, key):
            # scores in fp32 for a numerically stable softmax
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(head_dim)
            scores = scores + bias.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1)
            if key is not None:
                probs = dropout_apply(probs, key, self.dropout_rate)
            probs = probs.astype(self.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(self.dtype),
                              preferred_element_type=jnp.float32)

        core = _core
        if self.attn_remat:
            # flash-attention MEMORY behavior without the kernel: save only
            # (q, k, v, bias, key), regenerate scores/probs/mask in the
            # backward (~650 MB fewer residuals at VQA B=64). Measured
            # SLOWER on v5e (VQA B=64: 79.2 vs 69.7 ms/step): XLA's
            # softmax-backward re-materializes the [B,H,L,L] probs in HBM
            # anyway (it cannot tile the recompute like a real flash
            # kernel), so the fwd-probs store is merely replaced by a
            # bwd-probs store and the recompute is pure overhead. Off by
            # default (TPU.ATTN_REMAT); the knob remains for memory-bound
            # configs where activations, not time, are the constraint.
            core = jax.checkpoint(
                _core, policy=jax.checkpoint_policies.nothing_saveable)
        ctx = core(q, k, v, attention_bias, dropout_key)
        return ctx.reshape(B, L, self.hidden_size).astype(self.dtype)


class BertAttention(nn.Module):
    """Self-attention + residual projection block (ref: modeling.py:322-349)."""

    num_heads: int
    hidden_size: int
    attention_dropout: float
    hidden_dropout: float
    initializer_range: float
    dtype: Any = jnp.float32
    fused: bool = False
    fused_qkv: bool = False
    attn_remat: bool = False

    @nn.compact
    def __call__(self, x, attention_bias, deterministic=True,
                 output_attention_probs=False):
        attn = BertSelfAttention(
            self.num_heads, self.hidden_size, self.attention_dropout,
            self.initializer_range, self.dtype, self.fused, self.fused_qkv,
            attn_remat=self.attn_remat,
            name="self")(
                x, attention_bias, deterministic, output_attention_probs)
        probs = None
        if output_attention_probs:
            attn, probs = attn
        h = bert_dense(self.hidden_size, self.initializer_range, self.dtype,
                       "output_dense")(attn)
        h = Dropout(rate=self.hidden_dropout)(h, deterministic=deterministic)
        h = BertLayerNorm(name="output_LayerNorm")(h + x)
        if output_attention_probs:
            return h, probs
        return h


class BertLayer(nn.Module):
    """One transformer block: attention -> FFN, both post-LN
    (ref: modeling.py:352-397)."""

    num_heads: int
    hidden_size: int
    intermediate_size: int
    hidden_act: str
    attention_dropout: float
    hidden_dropout: float
    initializer_range: float
    dtype: Any = jnp.float32
    fused: bool = False
    fused_qkv: bool = False
    attn_remat: bool = False

    @nn.compact
    def __call__(self, x, attention_bias, deterministic=True,
                 output_attention_probs=False):
        attn_out = BertAttention(
            self.num_heads, self.hidden_size, self.attention_dropout,
            self.hidden_dropout, self.initializer_range, self.dtype,
            self.fused, self.fused_qkv, attn_remat=self.attn_remat,
            name="attention")(x, attention_bias, deterministic,
                              output_attention_probs)
        probs = None
        if output_attention_probs:
            attn_out, probs = attn_out
        inter = bert_dense(self.intermediate_size, self.initializer_range,
                           self.dtype, "intermediate_dense")(attn_out)
        inter = ACT2FN[self.hidden_act](inter)
        out = bert_dense(self.hidden_size, self.initializer_range, self.dtype,
                         "output_dense")(inter)
        out = Dropout(rate=self.hidden_dropout)(out, deterministic=deterministic)
        out = BertLayerNorm(name="output_LayerNorm")(out + attn_out)
        if output_attention_probs:
            return out, probs
        return out


class _BertLayerScanBody(nn.Module):
    """(carry, out) adapter around BertLayer for nn.scan."""

    num_heads: int
    hidden_size: int
    intermediate_size: int
    hidden_act: str
    attention_dropout: float
    hidden_dropout: float
    initializer_range: float
    dtype: Any = jnp.float32
    fused: bool = False
    fused_qkv: bool = False
    deterministic: bool = True
    attn_remat: bool = False

    @nn.compact
    def __call__(self, x, attention_bias):
        out = BertLayer(
            self.num_heads, self.hidden_size, self.intermediate_size,
            self.hidden_act, self.attention_dropout, self.hidden_dropout,
            self.initializer_range, self.dtype, self.fused, self.fused_qkv,
            attn_remat=self.attn_remat,
            name="layer")(x, attention_bias, self.deterministic, False)
        return out, None


class BertEncoder(nn.Module):
    """Stack of BertLayers (ref: modeling.py:400-421).

    Returns the final hidden states; per-layer outputs / attention probs are
    returned only when requested (attention-vis path,
    ref: pretrain/modules/resnet_vlbert_for_attention_vis.py).

    ``scan_layers`` traces ONE layer and runs it under ``nn.scan`` with
    stacked params ``layers/... [L, ...]`` — measured 11x faster XLA
    compilation for a 24-layer encoder grad (2.4 vs 26.2 s; python tracing
    is somewhat slower, so the win matters where XLA compilation dominates,
    e.g. remote-compile environments). Converter support:
    training/convert.stack_layer_params. The scan path supports the plain
    forward only (no per-layer outputs).
    """

    num_layers: int
    num_heads: int
    hidden_size: int
    intermediate_size: int
    hidden_act: str
    attention_dropout: float
    hidden_dropout: float
    initializer_range: float
    dtype: Any = jnp.float32
    remat: bool = False
    fused: bool = False
    fused_qkv: bool = False
    scan_layers: bool = False
    attn_remat: bool = False

    @nn.compact
    def __call__(self, x, attention_bias, deterministic=True,
                 output_all_encoded_layers=False,
                 output_attention_probs=False):
        if self.scan_layers and not (output_all_encoded_layers
                                     or output_attention_probs):
            body = _BertLayerScanBody
            if self.remat:
                body = nn.remat(_BertLayerScanBody, prevent_cse=False)
            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,),
                length=self.num_layers,
            )
            out, _ = scan(
                self.num_heads, self.hidden_size, self.intermediate_size,
                self.hidden_act, self.attention_dropout, self.hidden_dropout,
                self.initializer_range, self.dtype, self.fused,
                self.fused_qkv, deterministic,
                attn_remat=self.attn_remat, name="layers")(
                    x, attention_bias)
            return out

        layer_cls = BertLayer
        if self.remat and not output_attention_probs:
            layer_cls = nn.remat(BertLayer, static_argnums=(3, 4))
        all_layers = []
        all_probs = []
        for i in range(self.num_layers):
            layer = layer_cls(
                self.num_heads, self.hidden_size, self.intermediate_size,
                self.hidden_act, self.attention_dropout, self.hidden_dropout,
                self.initializer_range, self.dtype, self.fused,
                self.fused_qkv, attn_remat=self.attn_remat,
                name=f"layer_{i}")
            x = layer(x, attention_bias, deterministic, output_attention_probs)
            if output_attention_probs:
                x, probs = x
                all_probs.append(probs)
            if output_all_encoded_layers:
                all_layers.append(x)
        if output_all_encoded_layers:
            out = all_layers
        else:
            out = x
        if output_attention_probs:
            return out, all_probs
        return out


class BertPooler(nn.Module):
    """Tanh projection of the [CLS] position (ref: modeling.py:424-436)."""

    hidden_size: int
    initializer_range: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        first = hidden[:, 0]
        pooled = bert_dense(self.hidden_size, self.initializer_range,
                            self.dtype, "dense")(first)
        return jnp.tanh(pooled)


class BertPredictionHeadTransform(nn.Module):
    """dense + act + LN transform before the MLM decoder
    (ref: modeling.py:439-453)."""

    hidden_size: int
    hidden_act: str
    initializer_range: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        h = bert_dense(self.hidden_size, self.initializer_range, self.dtype,
                       "dense")(hidden)
        h = ACT2FN[self.hidden_act](h)
        return BertLayerNorm(name="LayerNorm")(h)


class BertLMPredictionHead(nn.Module):
    """MLM head with the decoder tied to the word-embedding matrix
    (ref: modeling.py:456-472). The embedding matrix is passed at call time.
    """

    hidden_size: int
    vocab_size: int
    hidden_act: str
    initializer_range: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, word_embedding_matrix):
        h = BertPredictionHeadTransform(
            self.hidden_size, self.hidden_act, self.initializer_range,
            self.dtype, name="transform")(hidden)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.vocab_size,), jnp.float32)
        logits = jnp.einsum("...d,vd->...v", h,
                            word_embedding_matrix.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        return logits + bias
