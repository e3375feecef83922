"""Fused Pallas attention vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from vlbert_tpu.ops.attention import _xla_attention, fused_attention


def _case(rng, B=2, L=37, H=4, D=16):
    q = rng.normal(size=(B, L, H, D)).astype(np.float32)
    k = rng.normal(size=(B, L, H, D)).astype(np.float32)
    v = rng.normal(size=(B, L, H, D)).astype(np.float32)
    mask = np.ones((B, L), np.float32)
    mask[0, 30:] = 0.0
    bias = ((1.0 - mask) * -10000.0)[:, None, None, :]
    return map(jnp.asarray, (q, k, v, bias))


def test_fused_matches_xla(rng):
    q, k, v, bias = _case(rng)
    ours = np.asarray(fused_attention(q, k, v, bias))
    ref, _ = _xla_attention(q, k, v, bias)
    np.testing.assert_allclose(ours, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_backward(rng):
    q, k, v, bias = _case(rng, B=1, L=20, H=2, D=8)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, bias)[0] ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_encoder_fused_flag_matches(rng):
    from vlbert_tpu.models.bert import BertEncoder

    HID, HEADS, L, B = 32, 4, 11, 2
    x = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[1, 8:] = 0
    bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :])

    kw = dict(num_layers=2, num_heads=HEADS, hidden_size=HID,
              intermediate_size=64, hidden_act="gelu",
              attention_dropout=0.0, hidden_dropout=0.0,
              initializer_range=0.02)
    enc_x = BertEncoder(fused=False, **kw)
    enc_f = BertEncoder(fused=True, **kw)
    params = enc_x.init(jax.random.PRNGKey(0), x, bias)
    out_x = np.asarray(enc_x.apply(params, x, bias))
    out_f = np.asarray(enc_f.apply(params, x, bias))
    live = mask.astype(bool)
    np.testing.assert_allclose(out_f[live], out_x[live], rtol=1e-4, atol=1e-5)


def _xla_dropout_attention(q, k, v, bias, key, rate):
    """The exact XLA training composition from models/bert.py _core
    (bits16 dropout on the fp32 probs)."""
    from vlbert_tpu.ops.dropout import dropout_apply

    _, p = _xla_attention(q, k, v, bias)
    pd = dropout_apply(p, key, rate, impl="bits16").astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", pd, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def test_fused_dropout_matches_xla_bits16(rng):
    """fused_attention_dropout(hw=False) mask is bit-identical to the XLA
    bits16 path under the same key: outputs must match in fp32."""
    from vlbert_tpu.ops.attention import fused_attention_dropout

    q, k, v, bias = _case(rng)
    key = jax.random.PRNGKey(7)
    ours = np.asarray(fused_attention_dropout(q, k, v, bias, key, 0.1, False))
    ref = np.asarray(_xla_dropout_attention(q, k, v, bias, key, 0.1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    # deterministic replay: same key -> same output
    again = np.asarray(fused_attention_dropout(q, k, v, bias, key, 0.1, False))
    np.testing.assert_array_equal(ours, again)
    # different key -> different mask (sanity that dropout is active)
    other = np.asarray(fused_attention_dropout(
        q, k, v, bias, jax.random.PRNGKey(8), 0.1, False))
    assert not np.allclose(ours, other)


def test_fused_dropout_backward_matches_xla(rng):
    """The backward kernel recomputes probs + the identical mask from
    (q, k, v, bias, key): grads must equal the XLA composition's."""
    from vlbert_tpu.ops.attention import fused_attention_dropout

    q, k, v, bias = _case(rng, B=2, L=29, H=3, D=16)
    key = jax.random.PRNGKey(11)

    def loss_fused(q, k, v, bias):
        o = fused_attention_dropout(q, k, v, bias, key, 0.25, False)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v, bias):
        o = _xla_dropout_attention(q, k, v, bias, key, 0.25)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_encoder_fused_training_matches_xla(rng):
    """Full encoder, train mode (attention dropout ACTIVE): fused=True and
    fused=False draw the same per-site rng keys and the bits16 masks are
    bit-identical, so outputs and grads must match."""
    from vlbert_tpu.models.bert import BertEncoder

    HID, HEADS, L, B = 32, 4, 11, 2
    x = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[1, 8:] = 0
    bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :])

    kw = dict(num_layers=2, num_heads=HEADS, hidden_size=HID,
              intermediate_size=64, hidden_act="gelu",
              attention_dropout=0.3, hidden_dropout=0.1,
              initializer_range=0.02)
    enc_x = BertEncoder(fused=False, **kw)
    enc_f = BertEncoder(fused=True, **kw)
    params = enc_x.init(jax.random.PRNGKey(0), x, bias)
    rngs = {"dropout": jax.random.PRNGKey(3)}

    def loss(enc, xx):
        return jnp.sum(enc.apply(params, xx, bias, deterministic=False,
                                 rngs=rngs) ** 2)

    v0, g0 = jax.value_and_grad(lambda xx: loss(enc_x, xx))(x)
    v1, g1 = jax.value_and_grad(lambda xx: loss(enc_f, xx))(x)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)


def test_fused_dropout_ref_impl_keeps_xla_path(rng):
    """DROPOUT_IMPL='ref' (strict bernoulli parity) must bypass the fused
    kernel: encoder output matches the unfused encoder exactly."""
    from vlbert_tpu.models.bert import BertEncoder
    from vlbert_tpu.ops import dropout as dropout_mod

    HID, HEADS, L, B = 32, 4, 9, 2
    x = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)
    bias = jnp.zeros((B, 1, 1, L), jnp.float32)
    kw = dict(num_layers=1, num_heads=HEADS, hidden_size=HID,
              intermediate_size=64, hidden_act="gelu",
              attention_dropout=0.3, hidden_dropout=0.0,
              initializer_range=0.02)
    enc_x = BertEncoder(fused=False, **kw)
    enc_f = BertEncoder(fused=True, **kw)
    params = enc_x.init(jax.random.PRNGKey(0), x, bias)
    rngs = {"dropout": jax.random.PRNGKey(4)}
    old = dropout_mod.DEFAULT_IMPL
    dropout_mod.DEFAULT_IMPL = "ref"
    try:
        out_x = np.asarray(enc_x.apply(params, x, bias, deterministic=False,
                                       rngs=rngs))
        out_f = np.asarray(enc_f.apply(params, x, bias, deterministic=False,
                                       rngs=rngs))
    finally:
        dropout_mod.DEFAULT_IMPL = old
    np.testing.assert_array_equal(out_f, out_x)


def test_fused_qkv_matches_separate(rng):
    """fused_qkv encoder == separate-projection encoder after fuse_qkv_params."""
    from vlbert_tpu.models.bert import BertEncoder
    from vlbert_tpu.training.checkpoint import flatten_params, partial_load
    from vlbert_tpu.training.convert import fuse_qkv_params

    HID, HEADS, L, B = 32, 4, 11, 2
    kw = dict(num_layers=2, num_heads=HEADS, hidden_size=HID,
              intermediate_size=64, hidden_act="gelu",
              attention_dropout=0.0, hidden_dropout=0.0,
              initializer_range=0.02)
    enc_sep = BertEncoder(**kw)
    enc_fused = BertEncoder(fused_qkv=True, **kw)

    x = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)
    bias = jnp.zeros((B, 1, 1, L), jnp.float32)
    p_sep = enc_sep.init(jax.random.PRNGKey(0), x, bias)
    p_fused = enc_fused.init(jax.random.PRNGKey(1), x, bias)

    flat = flatten_params(jax.device_get(p_sep["params"]))
    fused_flat = fuse_qkv_params(flat)
    new_params, loaded = partial_load(jax.device_get(p_fused["params"]),
                                      fused_flat)
    n_all = len(flatten_params(jax.device_get(p_fused["params"])))
    assert len(loaded) == n_all

    out_sep = np.asarray(enc_sep.apply(p_sep, x, bias))
    out_fused = np.asarray(enc_fused.apply({"params": new_params}, x, bias))
    np.testing.assert_allclose(out_fused, out_sep, rtol=1e-5, atol=1e-6)


def test_scan_encoder_matches_unrolled(rng):
    """scan_layers encoder with stacked params == unrolled encoder."""
    from vlbert_tpu.models.bert import BertEncoder
    from vlbert_tpu.training.checkpoint import flatten_params, partial_load
    from vlbert_tpu.training.convert import stack_layer_params

    HID, HEADS, L, B, NL = 32, 4, 9, 2, 3
    kw = dict(num_layers=NL, num_heads=HEADS, hidden_size=HID,
              intermediate_size=64, hidden_act="gelu",
              attention_dropout=0.0, hidden_dropout=0.0,
              initializer_range=0.02)
    enc = BertEncoder(**kw)
    enc_scan = BertEncoder(scan_layers=True, **kw)

    x = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)
    bias = jnp.zeros((B, 1, 1, L), jnp.float32)
    p = enc.init(jax.random.PRNGKey(0), x, bias)
    p_scan = enc_scan.init(jax.random.PRNGKey(1), x, bias)

    flat = flatten_params(jax.device_get(p["params"]))
    stacked = stack_layer_params(flat, NL)
    new_params, loaded = partial_load(jax.device_get(p_scan["params"]),
                                      stacked)
    assert len(loaded) == len(flatten_params(jax.device_get(p_scan["params"])))

    out = np.asarray(enc.apply(p, x, bias))
    out_scan = np.asarray(enc_scan.apply({"params": new_params}, x, bias))
    np.testing.assert_allclose(out_scan, out, rtol=1e-5, atol=1e-6)


def test_attn_remat_matches_plain(rng):
    """TPU.ATTN_REMAT saves only (q,k,v,bias,key) and regenerates the
    attention core (scores/softmax/dropout-mask) in the backward. Same
    params + same dropout rng stream must therefore give the same output
    and grads with remat on/off — in eval AND train (dropout active)
    mode, since the dropout key is drawn OUTSIDE the remat boundary and
    the replayed jax.random.bits(key) mask is deterministic."""
    from vlbert_tpu.models.bert import BertEncoder

    HID, HEADS, L, B = 32, 4, 11, 2
    x = jnp.asarray(rng.normal(size=(B, L, HID)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[1, 8:] = 0
    bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :])

    kw = dict(num_layers=2, num_heads=HEADS, hidden_size=HID,
              intermediate_size=64, hidden_act="gelu",
              attention_dropout=0.3, hidden_dropout=0.0,
              initializer_range=0.02)
    enc = BertEncoder(attn_remat=False, **kw)
    enc_r = BertEncoder(attn_remat=True, **kw)
    params = enc.init(jax.random.PRNGKey(0), x, bias)

    for det in (True, False):
        rngs = {} if det else {"dropout": jax.random.PRNGKey(5)}

        def loss(module, xx):
            return jnp.sum(module.apply(params, xx, bias, deterministic=det,
                                        rngs=rngs) ** 2)

        v0, g0 = jax.value_and_grad(lambda xx: loss(enc, xx))(x)
        v1, g1 = jax.value_and_grad(lambda xx: loss(enc_r, xx))(x)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-5, atol=1e-6)


def test_fused_dropout_hw_prng_interpret(rng):
    """The hw=True (TPU hardware PRNG) variant under pallas interpret mode:
    deterministic replay, key sensitivity, and — via finite differences —
    that the backward kernel regenerates the IDENTICAL mask from the
    (seed, block) pair (a mask mismatch between fwd and bwd would show up
    as a gradient error far beyond fd tolerance, since the fwd is smooth
    in (q, k, v, bias) for a fixed mask).

    REQUIRES jax_default_matmul_precision='highest' (conftest sets it):
    under DEFAULT precision TPU fp32 matmuls run as bf16 passes, whose
    ~1e-2 relative noise swamps the eps-sized secant of the fd probe —
    verified on-chip 2026-08-20: every variant (incl. rate~0 and the
    XLA-parity-proven bits16) 'fails' fd under default precision and
    passes under highest."""
    from jax.test_util import check_grads

    from vlbert_tpu.ops.attention import fused_attention_dropout

    q, k, v, bias = _case(rng, B=2, L=9, H=2, D=8)
    key = jax.random.PRNGKey(3)

    try:
        o1 = np.asarray(fused_attention_dropout(q, k, v, bias, key, 0.2,
                                                True))
    except NotImplementedError:
        import pytest
        pytest.skip("pallas interpret mode lacks prng_seed on this "
                    "platform (hw path is exercised on real TPU)")
    o2 = np.asarray(fused_attention_dropout(q, k, v, bias, key, 0.2, True))
    np.testing.assert_array_equal(o1, o2)
    o3 = np.asarray(fused_attention_dropout(
        q, k, v, bias, jax.random.PRNGKey(4), 0.2, True))
    assert not np.allclose(o1, o3)

    check_grads(
        lambda q, k, v, bias: fused_attention_dropout(
            q, k, v, bias, key, 0.2, True),
        (q, k, v, bias), order=1, modes=("rev",), atol=1e-2, rtol=1e-2)


def test_fused_dropout_hw_rate_statistics(rng):
    """hw-PRNG drop fraction tracks the configured rate (loose bound over
    ~B*H*L*L mask draws)."""
    from vlbert_tpu.ops.attention import fused_attention_dropout

    B, L, H, D = 2, 32, 2, 8
    q = jnp.zeros((B, L, H, D), jnp.float32)
    k = jnp.zeros((B, L, H, D), jnp.float32)
    # v constant 1 -> probs uniform -> out = keep_frac_per_row * scale; the
    # mean over all rows estimates (1-rate)*scale = 1
    v = jnp.ones((B, L, H, D), jnp.float32)
    bias = jnp.zeros((B, 1, 1, L), jnp.float32)
    try:
        out = np.asarray(fused_attention_dropout(
            q, k, v, bias, jax.random.PRNGKey(0), 0.3, True))
    except NotImplementedError:
        import pytest
        pytest.skip("pallas interpret mode lacks prng_seed on this "
                    "platform (hw path is exercised on real TPU)")
    assert abs(out.mean() - 1.0) < 0.05, out.mean()
