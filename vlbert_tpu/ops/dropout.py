"""Dropout with integer-threshold masks — the train-step RNG hot path.

The reference uses torch ``nn.Dropout`` everywhere (e.g. external/
pytorch_pretrained_bert/modeling.py:301,341,379 — attention probs + two
hidden dropouts per encoder layer). On TPU the equivalent
``jax.random.bernoulli`` is a measured step-time hazard: each mask element
costs a 32-bit PRNG word *plus* an int->float->compare chain, and the
attention-probs mask alone is B*H*L*L elements. Measured on v5e at the VQA
fine-tune step (B=64, T=32, 12 layers): threefry bernoulli masks cost
33 ms/step on top of a 59.7 ms dropout-free step (MFU 0.39 -> 0.26).

This module keeps torch-dropout semantics (keep prob ``1-rate``, kept
values scaled by ``1/(1-rate)``) but builds the mask by comparing raw
uint16 random bits against an integer threshold:

  * half the PRNG words of a uint32 bernoulli draw,
  * no int->float conversion pass — one integer compare,
  * keep probability quantized to 1/65536 granularity (max abs error
    2**-17 ~= 7.6e-6 vs the exact rate; the 1/(1-rate) scale uses the
    exact rate). Statistically indistinguishable from the reference for
    any training purpose.

The PRNG itself comes from the key's implementation, so the process-wide
``TPU.RNG_IMPL`` knob (engine/train.py:195; 'rbg' = XLA RngBitGenerator,
the fast TPU generator) composes with this: rbg+bits16 removes ~90% of the
measured mask cost vs threefry+bernoulli.

``impl``:
  * 'bits16' (default): uint16 threshold compare as above,
  * 'pallas': TPU-only kernel using the hardware PRNG
    (``pltpu.prng_random_bits``) — bits are generated *in VMEM* inside an
    elementwise kernel (no generator output ever touches HBM) and the
    backward pass regenerates the identical mask from the saved 32-bit
    seed instead of storing mask residuals. Threshold granularity 1/2**32.
    Falls back to 'bits16' off-TPU (this JAX build has no interpret-mode
    lowering for ``prng_seed``) and for inner dims too large for a VMEM
    block.
  * 'ref': exact ``jax.random.bernoulli`` (bit-identical to flax
    ``nn.Dropout`` with the same key — kept for A/B and strict-parity runs).

The default is process-global (set from ``config.TPU.DROPOUT_IMPL`` by
``models.task_modules.build_module``); a per-module ``impl=`` attribute
overrides it. Module auto-naming matches ``nn.Dropout`` (class name
``Dropout``), so RNG fold-in paths and param trees are unchanged and the
two impls draw from identical per-site streams.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# process-global default; build_module sets this from config.TPU.DROPOUT_IMPL
DEFAULT_IMPL = "bits16"

# max elements per VMEM block for the pallas impl (bits uint32 + x + out,
# bf16/fp32: <= ~3 MB/block — far under the ~16 MB VMEM budget)
_PALLAS_BLOCK_ELEMS = 256 * 1024


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def _dropout_kernel(seed_ref, x_ref, o_ref, *, thresh, scale):
    # decorrelate blocks by folding the grid index into the seed; the same
    # (seed, block) pair regenerates the same bits in the backward pass
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = bits >= jnp.uint32(thresh)
    x = x_ref[...]
    o_ref[...] = jnp.where(keep, x * jnp.asarray(scale, x.dtype),
                           jnp.zeros((), x.dtype))


def _pallas_apply(x, seed, rate):
    """Apply the hardware-PRNG dropout transform (used by fwd AND bwd —
    d(dropout)/dx is the same mask*scale map applied to the cotangent)."""
    shape = x.shape
    n = shape[-1] if x.ndim else 1
    x2 = x.reshape(-1, n)                 # leading-dim collapse: layout-free
    m = x2.shape[0]
    rows = max(1, min(m, _PALLAS_BLOCK_ELEMS // max(n, 1)))
    if rows < m:
        # mosaic requires the block sublane dim be a multiple of 8 unless it
        # equals the array dim; the padded tail block is masked by pallas
        rows = max(8, rows // 8 * 8)
    grid = -(-m // rows)
    # drop iff bits < round(rate * 2**32): P(keep) within 2**-33 of 1-rate
    thresh = min(int(round(float(rate) * 4294967296.0)), 4294967295)
    out = pl.pallas_call(
        functools.partial(_dropout_kernel, thresh=thresh,
                          scale=1.0 / (1.0 - float(rate))),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((rows, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    )(seed, x2)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hw_dropout(x, seed, rate):
    """Hardware-PRNG dropout. ``seed``: [1] int32; ``rate``: static float.

    The backward pass regenerates the mask from ``seed`` — no mask or
    random-bits residual is stored between fwd and bwd.
    """
    return _pallas_apply(x, seed, rate)


def _hw_fwd(x, seed, rate):
    return _pallas_apply(x, seed, rate), seed


def _hw_bwd(rate, seed, g):
    return _pallas_apply(g, seed, rate), None


hw_dropout.defvjp(_hw_fwd, _hw_bwd)

try:  # pallas imports at module scope so CPU-only envs still import us
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:             # pragma: no cover
    pl = pltpu = None


def dropout_apply(x, key, rate, impl=None):
    """Pure-function dropout: the module body without the flax plumbing.

    Exists so rematerialized blocks (e.g. the attention core in
    models/bert.py) can regenerate the identical mask from ``key`` in the
    backward pass instead of storing mask residuals — the caller draws
    ``key`` via ``make_rng`` OUTSIDE the remat boundary and closes over it.
    """
    rate = float(rate)
    if rate == 0.0:
        return x
    if rate == 1.0:
        return jnp.zeros_like(x)
    impl = impl or DEFAULT_IMPL
    if impl == "pallas":
        # TPU-only: no interpret-mode prng_seed lowering in this JAX
        # build; giant inner dims can't fit one VMEM block row
        if (pl is None or not _on_tpu()
                or x.ndim == 0 or x.shape[-1] > _PALLAS_BLOCK_ELEMS):
            impl = "bits16"
        else:
            seed = jax.random.bits(key, (1,), jnp.uint32)
            return hw_dropout(x, seed.astype(jnp.int32), rate)
    if impl == "ref":
        # exactly flax nn.Dropout: bernoulli mask + division by the
        # keep prob (x/p and x*(1/p) differ in the last ulp)
        keep_prob = 1.0 - rate
        keep = jax.random.bernoulli(key, keep_prob, x.shape)
        return jax.lax.select(keep, x / keep_prob, jnp.zeros_like(x))
    elif impl == "bits16":
        # drop iff bits < round(rate * 2**16): P(keep) is within
        # 2**-17 of (1 - rate); no float conversion of the bits.
        # (Measured on v5e, VQA step B=64: generating HALF as many
        # uint32 words into a flat buffer and bitcasting to uint16
        # pairs is 2.1x SLOWER overall — the 1D->4D relayout swamps
        # the saved generator work. Shaped uint16 generation wins.)
        thresh = int(round(rate * 65536.0))
        bits = jax.random.bits(key, x.shape, dtype=jnp.uint16)
        keep = bits >= jnp.uint16(thresh)
    else:
        raise ValueError(f"unknown dropout impl {impl!r}")
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jax.lax.select(keep, x * scale, jnp.zeros_like(x))


class Dropout(nn.Module):
    """Drop-in replacement for ``flax.linen.Dropout`` (rate semantics)."""

    rate: float
    impl: Optional[str] = None        # None -> module-level DEFAULT_IMPL
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        key = self.make_rng(self.rng_collection)
        return dropout_apply(x, key, self.rate, self.impl)
