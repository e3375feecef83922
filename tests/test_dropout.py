"""ops/dropout.py — the integer-threshold dropout that replaces
jax.random.bernoulli masks on the train-step hot path.

The reference's dropout is torch nn.Dropout (keep prob 1-rate, kept values
scaled 1/(1-rate), e.g. external/pytorch_pretrained_bert/modeling.py:301).
These tests pin: torch semantics, the documented 1/65536 keep-prob
quantization bound, bit-compat of the 'ref' impl with flax nn.Dropout, and
that the model default ('bits16') is wired through build_module.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vlbert_tpu.ops.dropout as dropout_lib
from vlbert_tpu.ops.dropout import Dropout


class _Wrap(nn.Module):
    rate: float
    impl: str = None

    @nn.compact
    def __call__(self, x, deterministic):
        return Dropout(rate=self.rate, impl=self.impl)(
            x, deterministic=deterministic)


def _apply(rate, x, key, impl=None, deterministic=False):
    return _Wrap(rate, impl).apply({}, x, deterministic,
                                   rngs={"dropout": key})


def test_deterministic_is_identity():
    x = jnp.arange(24.0).reshape(4, 6)
    y = _apply(0.5, x, jax.random.PRNGKey(0), deterministic=True)
    assert (y == x).all()


def test_rate_zero_and_one():
    x = jnp.ones((8, 8))
    assert (_apply(0.0, x, jax.random.PRNGKey(0)) == x).all()
    assert (_apply(1.0, x, jax.random.PRNGKey(0)) == 0).all()


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_keep_fraction_and_scale(rate):
    x = jnp.ones((256, 512), jnp.float32)
    y = _apply(rate, x, jax.random.PRNGKey(3))
    keep = float((y != 0).mean())
    # binomial std over 131072 samples ~ 0.0014; 5 sigma
    assert abs(keep - (1.0 - rate)) < 0.007
    kept = np.asarray(y)[np.asarray(y) != 0]
    np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-6)
    # E[y] preserved to the quantization bound
    assert abs(float(y.mean()) - 1.0) < 0.01


def test_ref_impl_bit_matches_flax_dropout():
    """impl='ref' must be indistinguishable from nn.Dropout: same key,
    same module auto-name ('Dropout_0'), same mask."""

    class Flax(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dropout(rate=0.3)(x, deterministic=False)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 64)),
                    jnp.float32)
    key = jax.random.PRNGKey(7)
    a = _apply(0.3, x, key, impl="ref")
    b = Flax().apply({}, x, rngs={"dropout": key})
    assert (a == b).all()


def test_bits16_quantization_bound():
    """P(keep) = 1 - round(rate*65536)/65536 — error < 2**-16."""
    for rate in (0.1, 0.25, 1e-6, 0.9):
        q = 1.0 - round(rate * 65536) / 65536.0
        assert abs(q - (1.0 - rate)) <= 2.0 ** -16


def test_same_key_same_mask_across_calls():
    x = jnp.ones((16, 128))
    key = jax.random.PRNGKey(11)
    y1 = _apply(0.4, x, key)
    y2 = _apply(0.4, x, key)
    assert (y1 == y2).all()
    y3 = _apply(0.4, x, jax.random.PRNGKey(12))
    assert not (y1 == y3).all()


def test_grad_masked_like_forward():
    x = jnp.ones((64, 64), jnp.float32)
    key = jax.random.PRNGKey(5)
    y = _apply(0.5, x, key)
    g = jax.grad(lambda x: _apply(0.5, x, key).sum())(x)
    assert ((np.asarray(y) != 0) == (np.asarray(g) != 0)).all()


def test_build_module_sets_process_default():
    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.utils.config import default_config

    cfg = default_config("vqa")
    cfg.MODULE = "ResNetVLBERT"
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    prev = dropout_lib.DEFAULT_IMPL
    try:
        cfg.TPU.DROPOUT_IMPL = "ref"
        build_module(cfg, "vqa")
        assert dropout_lib.DEFAULT_IMPL == "ref"
        cfg.TPU.DROPOUT_IMPL = "bits16"
        build_module(cfg, "vqa")
        assert dropout_lib.DEFAULT_IMPL == "bits16"
    finally:
        dropout_lib.DEFAULT_IMPL = prev


def test_bfloat16_passthrough_dtype():
    x = jnp.ones((8, 256), jnp.bfloat16)
    y = _apply(0.1, x, jax.random.PRNGKey(1))
    assert y.dtype == jnp.bfloat16


def _on_tpu():
    return jax.devices()[0].platform in ("tpu", "axon")


def test_pallas_impl_falls_back_off_tpu():
    # this suite runs on the CPU backend: impl='pallas' must transparently
    # take the bits16 path (no interpret-mode prng_seed in this JAX build)
    # and produce the exact bits16 output for the same key
    x = jnp.ones((16, 133), jnp.float32)
    key = jax.random.PRNGKey(3)
    if _on_tpu():
        pytest.skip("fallback path is the off-TPU branch")
    y = _apply(0.25, x, key, impl="pallas")
    yb = _apply(0.25, x, key, impl="bits16")
    assert (np.asarray(y) == np.asarray(yb)).all()


@pytest.mark.skipif(not _on_tpu(), reason="hardware-PRNG kernel is TPU-only")
def test_pallas_impl_on_tpu():
    # torch-dropout semantics + fwd/bwd mask agreement (the backward
    # REGENERATES the mask from the seed — nothing is stored)
    x = jnp.ones((256, 133), jnp.float32)
    key = jax.random.PRNGKey(7)
    rate = 0.1
    y = _apply(rate, x, key, impl="pallas")
    y2 = _apply(rate, x, key, impl="pallas")
    assert (np.asarray(y) == np.asarray(y2)).all(), "same key, same mask"
    kept = np.asarray(y) != 0
    assert abs(kept.mean() - (1 - rate)) < 0.02
    np.testing.assert_allclose(np.asarray(y)[kept], 1.0 / (1 - rate),
                               rtol=1e-6)
    g = jax.grad(lambda x: _apply(rate, x, key, impl="pallas").sum())(x)
    assert ((np.asarray(g) != 0) == kept).all(), "bwd regenerated same mask"
