"""Training-stack tests: schedules, masks, and a full multi-device train step
on the virtual 8-CPU mesh (loss must decrease)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vlbert_tpu.models.task_modules import build_module
from vlbert_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from vlbert_tpu.training.checkpoint import (
    auto_resume, load_checkpoint, partial_load, save_checkpoint)
from vlbert_tpu.training.loop import TrainState, create_train_state, make_train_step
from vlbert_tpu.training.optim import (
    lr_mult_tree, make_lr_schedule, make_optimizer, trainable_mask)
from vlbert_tpu.utils.config import default_config


def test_step_schedule_semantics():
    cfg = default_config("vcr")
    cfg.TRAIN.LR = 0.001
    cfg.TRAIN.BATCH_IMAGES = 2
    cfg.TRAIN.GRAD_ACCUMULATE_STEPS = 1
    cfg.TRAIN.LR_SCHEDULE = "step"
    cfg.TRAIN.LR_STEP = (2.0, 4.0)
    cfg.TRAIN.LR_FACTOR = 0.1
    cfg.TRAIN.WARMUP = True
    cfg.TRAIN.WARMUP_METHOD = "linear"
    cfg.TRAIN.WARMUP_FACTOR = 1 / 3
    cfg.TRAIN.WARMUP_STEPS = 10
    cfg._world_size = 4
    sched, base_lr = make_lr_schedule(cfg, steps_per_epoch=100)
    assert abs(base_lr - 0.001 * 4 * 2) < 1e-9
    # warmup start: factor 1/3
    np.testing.assert_allclose(float(sched(0)), base_lr / 3, rtol=1e-6)
    # end of warmup
    np.testing.assert_allclose(float(sched(10)), base_lr, rtol=1e-6)
    # after first milestone (epoch 2 = step 200)
    np.testing.assert_allclose(float(sched(250)), base_lr * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(450)), base_lr * 0.01, rtol=1e-6)


def test_triangle_schedule_semantics():
    cfg = default_config("vqa")
    cfg.TRAIN.LR = 1e-4
    cfg.TRAIN.BATCH_IMAGES = 1
    cfg.TRAIN.LR_SCHEDULE = "triangle"
    cfg.TRAIN.END_EPOCH = 10
    cfg.TRAIN.WARMUP = True
    cfg.TRAIN.WARMUP_STEPS = 100
    cfg._world_size = 1
    sched, base_lr = make_lr_schedule(cfg, steps_per_epoch=100)
    np.testing.assert_allclose(float(sched(50)), base_lr * 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), base_lr, rtol=1e-5)
    # linear decay to 0 at t_total=1000
    np.testing.assert_allclose(float(sched(550)), base_lr * 0.5, rtol=1e-5)
    assert float(sched(1000)) <= 1e-12


def test_lr_mult_and_trainable_mask():
    params = {
        "image_feature_extractor": {
            "backbone": {"conv1": {"kernel": np.ones((3,))},
                         "bn1": {"scale": np.ones(3), "mean": np.ones(3)},
                         "layer1": {"block_0": {"conv1": {"kernel": np.ones(3)}}},
                         "layer3": {"block_0": {"conv1": {"kernel": np.ones(3)}}}},
        },
        "vlbert": {"word_embeddings": {"embedding": np.ones((5, 2))},
                   "encoder": {"layer_0": {"intermediate_dense": {"kernel": np.ones(3)}}}},
        "final_mlp": {"dense_0": {"kernel": np.ones(3)}},
    }
    cfg = default_config("vcr")
    cfg.NETWORK.IMAGE_FROZEN_BACKBONE_STAGES = [1, 2]
    cfg.NETWORK.IMAGE_FROZEN_BN = True
    cfg.NETWORK.VLBERT.word_embedding_frozen = True
    mask = trainable_mask(params, cfg)
    assert mask["image_feature_extractor"]["backbone"]["conv1"]["kernel"] is False
    assert mask["image_feature_extractor"]["backbone"]["bn1"]["mean"] is False
    assert mask["image_feature_extractor"]["backbone"]["layer1"]["block_0"]["conv1"]["kernel"] is False
    assert mask["image_feature_extractor"]["backbone"]["layer3"]["block_0"]["conv1"]["kernel"] is True
    assert mask["vlbert"]["word_embeddings"]["embedding"] is False
    assert mask["final_mlp"]["dense_0"]["kernel"] is True

    mults = lr_mult_tree(params, [("final_mlp", 10.0)])
    assert mults["final_mlp"]["dense_0"]["kernel"] == 10.0
    assert mults["vlbert"]["encoder"]["layer_0"]["intermediate_dense"]["kernel"] == 1.0


def test_frozen_params_carry_no_moment_state():
    """TPU.MASKED_OPT_STATE=true: frozen leaves carry NO Adam moment arrays
    (optax.MaskedNode), matching the reference's requires_grad=True-only
    optimizer (ref vcr/function/train.py:125-135) in STATE layout too, so
    ~25M frozen params don't cost fp32 (m, v) HBM. Opt-in since the v5e
    donation A/B (see utils/config.py); update masking — the part that
    determines trained values — holds under both settings
    (test_dense_moments_default below)."""
    import optax

    params = {
        "backbone": {"conv1": {"kernel": np.ones((3,), np.float32)},
                     "layer3": {"conv1": {"kernel": np.ones(3, np.float32)}}},
        "vlbert": {"word_embeddings": {"embedding": np.ones((5, 2), np.float32)}},
    }
    cfg = default_config("vcr")
    cfg.NETWORK.IMAGE_FROZEN_BACKBONE_STAGES = [1, 2]
    cfg.NETWORK.VLBERT.word_embedding_frozen = True
    cfg.TRAIN.OPTIMIZER = "AdamW"
    cfg.TPU.MASKED_OPT_STATE = True
    tx, _, _ = make_optimizer(cfg, params, steps_per_epoch=10)
    opt_state = tx.init(params)

    masked_nodes = []
    moment_arrays = []

    def walk(x):
        if isinstance(x, optax.MaskedNode):
            masked_nodes.append(x)
        elif hasattr(x, "shape"):
            moment_arrays.append(x)

    jax.tree_util.tree_map(
        walk, opt_state,
        is_leaf=lambda x: isinstance(x, optax.MaskedNode))
    # conv1 kernel + word embedding frozen -> 2 leaves x (mu, nu)
    assert len(masked_nodes) == 4, masked_nodes
    # trainable layer3 kernel still has mu+nu (plus step counters)
    assert any(a.shape == (3,) for a in moment_arrays)

    # the masked chain still runs: one update leaves frozen params untouched
    grads = jax.tree_util.tree_map(lambda p: np.ones_like(p), params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(new_params["backbone"]["conv1"]["kernel"],
                                  params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        new_params["vlbert"]["word_embeddings"]["embedding"],
        params["vlbert"]["word_embeddings"]["embedding"])
    assert not np.array_equal(new_params["backbone"]["layer3"]["conv1"]["kernel"],
                              params["backbone"]["layer3"]["conv1"]["kernel"])


def test_dense_moments_default_matches_masked_updates():
    """Default (TPU.MASKED_OPT_STATE=false): moments are dense — no
    MaskedNode anywhere — yet one update step produces BIT-IDENTICAL new
    params to the masked mode: frozen leaves untouched, trainable leaves
    moved identically. This is the invariant that made flipping the
    default a pure perf decision (v5e A/B: 37.0 vs 80.8 ms at B=4 under
    donation; see utils/config.py)."""
    import optax

    params = {
        "backbone": {"conv1": {"kernel": np.ones((3,), np.float32)},
                     "layer3": {"conv1": {"kernel": np.ones(3, np.float32)}}},
        "vlbert": {"word_embeddings": {"embedding": np.ones((5, 2), np.float32)}},
    }
    cfg = default_config("vcr")
    cfg.NETWORK.IMAGE_FROZEN_BACKBONE_STAGES = [1, 2]
    cfg.NETWORK.VLBERT.word_embedding_frozen = True
    cfg.TRAIN.OPTIMIZER = "AdamW"
    assert cfg.TPU.MASKED_OPT_STATE is False          # the shipped default

    grads = jax.tree_util.tree_map(lambda p: np.ones_like(p), params)

    def one_step(masked):
        c = default_config("vcr")
        c.NETWORK.IMAGE_FROZEN_BACKBONE_STAGES = [1, 2]
        c.NETWORK.VLBERT.word_embedding_frozen = True
        c.TRAIN.OPTIMIZER = "AdamW"
        c.TPU.MASKED_OPT_STATE = masked
        tx, _, _ = make_optimizer(c, params, steps_per_epoch=10)
        st = tx.init(params)
        if not masked:       # dense mode: every param leaf has mu+nu arrays
            assert not any(isinstance(x, optax.MaskedNode)
                           for x in jax.tree_util.tree_leaves(
                               st, is_leaf=lambda x: isinstance(
                                   x, optax.MaskedNode)))
        updates, _ = tx.update(grads, st, params)
        return optax.apply_updates(params, updates)

    dense, masked = one_step(False), one_step(True)
    flat_d = jax.tree_util.tree_leaves(dense)
    flat_m = jax.tree_util.tree_leaves(masked)
    for d, m in zip(flat_d, flat_m):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(m))
    np.testing.assert_array_equal(dense["backbone"]["conv1"]["kernel"],
                                  params["backbone"]["conv1"]["kernel"])
    assert not np.array_equal(dense["backbone"]["layer3"]["conv1"]["kernel"],
                              params["backbone"]["layer3"]["conv1"]["kernel"])


def test_pre_masked_opt_state_checkpoint_restores(tmp_path):
    """Checkpoints saved before the masked-moments change (round 2: full
    (mu, nu) for every leaf, no MaskedState level) must still restore —
    frozen leaves' moments are dropped (their updates were mask-zeroed, so
    behavior-identical), trainable moments land intact."""
    import flax.serialization
    import optax

    from vlbert_tpu.training.checkpoint import load_checkpoint

    params = {
        "backbone": {"conv1": {"kernel": np.ones((3,), np.float32)},
                     "layer3": {"conv1": {"kernel": np.ones(3, np.float32)}}},
    }
    cfg = default_config("vcr")
    cfg.NETWORK.IMAGE_FROZEN_BACKBONE_STAGES = [1, 2]
    cfg.TRAIN.OPTIMIZER = "AdamW"
    cfg.TPU.MASKED_OPT_STATE = True
    tx, _, _ = make_optimizer(cfg, params, steps_per_epoch=10)
    opt_state = tx.init(params)
    state = TrainState(params={"params": params}, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))

    # forge the ROUND-2 serialized form: unwrap MaskedState's inner_state
    # level and give every leaf (incl. the frozen conv1) full moments
    sd = flax.serialization.to_state_dict(state.opt_state)

    def forge(node):
        if isinstance(node, dict):
            if set(node) == {"inner_state"}:
                node = node["inner_state"]
            out = {}
            for k, v in node.items():
                if isinstance(v, dict) and not v:   # MaskedNode -> moments
                    out[k] = np.full((3,), 7.0, np.float32)
                else:
                    out[k] = forge(v)
            return out
        if getattr(node, "shape", None) == (3,):    # mark trainable moments
            return np.full((3,), 7.0, np.float32)
        return node

    old_sd = forge(sd)
    assert old_sd != sd                       # actually exercised migration
    payload = {
        "params": flax.serialization.to_state_dict({"params": params}),
        "opt_state": old_sd,
        "step": 5,
        "extra": {},
    }
    path = tmp_path / "old-0000.model"
    path.write_bytes(flax.serialization.msgpack_serialize(payload))

    # trainable mu marked so we can see it survive
    restored, extra = load_checkpoint(str(path), state)
    masked_nodes = [x for x in jax.tree_util.tree_leaves(
        restored.opt_state,
        is_leaf=lambda x: isinstance(x, optax.MaskedNode))
        if isinstance(x, optax.MaskedNode)]
    assert len(masked_nodes) == 2             # frozen conv1 mu+nu dropped
    assert int(restored.step) == 5
    # the trainable layer3 moments landed (forged value 7.0 survives)
    vals = [np.asarray(x) for x in jax.tree_util.tree_leaves(restored.opt_state)
            if getattr(x, "shape", None) == (3,)]
    assert vals and all(np.allclose(v, 7.0) for v in vals)


def test_masked_opt_state_checkpoint_restores_onto_dense(tmp_path):
    """The reverse migration: a checkpoint saved while
    TPU.MASKED_OPT_STATE=true (MaskedState inner_state level, frozen
    leaves as empty MaskedNode dicts) must restore onto today's dense
    default — inner_state stripped, trainable moments landing intact,
    frozen-leaf moments keeping the target's zeros init (exactly what a
    dense run would have accumulated, since frozen grads are zero)."""
    import flax.serialization
    import optax

    from vlbert_tpu.training.checkpoint import load_checkpoint

    params = {
        "backbone": {"conv1": {"kernel": np.ones((3,), np.float32)},
                     "layer3": {"conv1": {"kernel": np.ones(3, np.float32)}}},
    }

    def build(masked):
        c = default_config("vcr")
        c.NETWORK.IMAGE_FROZEN_BACKBONE_STAGES = [1, 2]
        c.TRAIN.OPTIMIZER = "AdamW"
        c.TPU.MASKED_OPT_STATE = masked
        tx, _, _ = make_optimizer(c, params, steps_per_epoch=10)
        return TrainState(params={"params": params},
                          opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    masked_state = build(True)

    # mark the trainable layer3 moments so we can watch them survive
    def mark(x):
        if getattr(x, "shape", None) == (3,):
            return np.full((3,), 7.0, np.float32)
        return x

    masked_sd = jax.tree_util.tree_map(
        mark, flax.serialization.to_state_dict(masked_state.opt_state))
    payload = {
        "params": flax.serialization.to_state_dict({"params": params}),
        "opt_state": masked_sd,
        "step": 9,
        "extra": {},
    }
    path = tmp_path / "masked-0000.model"
    path.write_bytes(flax.serialization.msgpack_serialize(payload))

    dense_state = build(False)
    restored, _ = load_checkpoint(str(path), dense_state)
    assert int(restored.step) == 9
    assert not any(isinstance(x, optax.MaskedNode)
                   for x in jax.tree_util.tree_leaves(
                       restored.opt_state, is_leaf=lambda x: isinstance(
                           x, optax.MaskedNode)))
    # the marked trainable moments survived; frozen conv1 moments are the
    # zeros init (the masked checkpoint never stored them)
    sd = flax.serialization.to_state_dict(restored.opt_state)
    flat = jax.tree_util.tree_flatten_with_path(sd)[0]
    saw_marked = saw_frozen_zero = False
    for kp, v in flat:
        ks = jax.tree_util.keystr(kp)
        if getattr(v, "shape", None) != (3,):
            continue
        if "mu" in ks or "nu" in ks:
            if "layer3" in ks:
                assert np.allclose(np.asarray(v), 7.0), ks
                saw_marked = True
            elif "conv1" in ks:
                assert np.allclose(np.asarray(v), 0.0), ks
                saw_frozen_zero = True
    assert saw_marked and saw_frozen_zero


def test_async_checkpoint_roundtrip(tmp_path):
    """async_write saves must be invisible to readers: load/mirror join the
    background writer; the write is atomic (no .tmp left behind)."""
    from vlbert_tpu.training.checkpoint import mirror_best

    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    cfg = default_config("vqa")
    cfg.TRAIN.OPTIMIZER = "AdamW"
    tx, _, _ = make_optimizer(cfg, params, steps_per_epoch=10)
    state = TrainState(params={"params": params}, opt_state=tx.init(params),
                       step=jnp.asarray(3, jnp.int32))
    prefix = str(tmp_path / "async")
    p = save_checkpoint(prefix, 1, state, extra={"best_val": 0.5},
                        async_write=True)
    # immediately read back — load_checkpoint must join the writer
    restored, extra = load_checkpoint(p, state)
    assert int(restored.step) == 3 and extra["best_val"] == 0.5
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["w"]), params["w"])
    best = mirror_best(prefix, p)
    assert os.path.exists(best)
    assert not os.path.exists(p + ".tmp")


def test_async_checkpoint_mirror_in_writer_and_error_surfacing(
        tmp_path, monkeypatch):
    """(1) mirror_best_to copies -best.model inside the background writer —
    no join needed, file appears once the writer drains; (2) a background
    write FAILURE re-raises at the next join point instead of vanishing in
    the daemon thread (the reference's synchronous torch.save raises in
    place; silence here would let AUTO_RESUME fall back to a stale epoch)."""
    from vlbert_tpu.training import checkpoint as ckpt_lib

    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    cfg = default_config("vqa")
    cfg.TRAIN.OPTIMIZER = "AdamW"
    tx, _, _ = make_optimizer(cfg, params, steps_per_epoch=10)
    state = TrainState(params={"params": params}, opt_state=tx.init(params),
                       step=jnp.asarray(3, jnp.int32))
    prefix = str(tmp_path / "m")
    save_checkpoint(prefix, 1, state, async_write=True,
                    mirror_best_to=prefix)
    ckpt_lib.wait_for_pending_save()
    best = f"{prefix}-best.model"
    assert os.path.exists(best) and not os.path.exists(best + ".tmp")
    restored, _ = load_checkpoint(best, state)
    assert int(restored.step) == 3

    # failure surfacing: make the background serialize blow up (ENOSPC
    # stand-in; tests run as root, so permission tricks can't fail)
    import flax.serialization as fser
    real = fser.msgpack_serialize
    monkeypatch.setattr(fser, "msgpack_serialize",
                        lambda *a, **k: (_ for _ in ()).throw(
                            OSError("No space left on device")))
    save_checkpoint(prefix, 5, state, async_write=True)
    with pytest.raises(RuntimeError, match="async checkpoint write"):
        ckpt_lib.wait_for_pending_save()
    assert not os.path.exists(f"{prefix}-0005.model")

    # the error must not be sticky: next save/join works
    monkeypatch.setattr(fser, "msgpack_serialize", real)
    p2 = save_checkpoint(prefix, 2, state, async_write=True)
    ckpt_lib.wait_for_pending_save()
    assert os.path.exists(p2)


def _tiny_vqa_setup(rng, grad_accum=1):
    cfg = default_config("vqa")
    cfg.MODULE = "ResNetVLBERT"
    v = cfg.NETWORK.VLBERT
    v.hidden_size = 32
    v.visual_size = 32
    v.num_hidden_layers = 1
    v.num_attention_heads = 2
    v.intermediate_size = 64
    v.vocab_size = 300
    v.max_position_embeddings = 64
    v.visual_ln = True
    v.visual_scale_text_init = 1.0
    v.visual_scale_object_init = 1.0
    cfg.NETWORK.IMAGE_FINAL_DIM = 32
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    cfg.DATASET.ANSWER_VOCAB_SIZE = 16
    cfg.NETWORK.CLASSIFIER_TYPE = "1fc"
    cfg.TRAIN.OPTIMIZER = "AdamW"
    cfg.TRAIN.LR = 1e-5          # base; x global batch below
    cfg.TRAIN.BATCH_IMAGES = 2
    cfg.TRAIN.GRAD_ACCUMULATE_STEPS = grad_accum
    cfg.TRAIN.CLIP_GRAD_NORM = 1.0
    cfg.TRAIN.LR_SCHEDULE = "triangle"
    cfg.TRAIN.END_EPOCH = 2
    m = build_module(cfg, "vqa", dtype=jnp.float32)

    B, O, T, F = 16, 6, 12, 64
    boxes = np.zeros((B, O, 4 + F), np.float32)
    boxes[..., 0] = rng.uniform(0, 50, (B, O)); boxes[..., 1] = rng.uniform(0, 50, (B, O))
    boxes[..., 2] = boxes[..., 0] + 20; boxes[..., 3] = boxes[..., 1] + 20
    boxes[..., 4:] = rng.normal(size=(B, O, F))
    box_mask = np.ones((B, O), bool)
    ids = rng.integers(1, 300, (B, T)).astype(np.int32)
    tt = np.zeros((B, T), np.int32)
    tmask = np.broadcast_to(np.arange(T)[None] < 9, (B, T)).copy()
    ans_pos = np.full((B,), 7, np.int32)
    im_info = np.tile(np.asarray([[100, 80, 1, 1]], np.float32), (B, 1))
    label = (rng.uniform(size=(B, 16)) > 0.8).astype(np.float32)
    batch = (None, boxes, box_mask, im_info, ids, tt, tmask, ans_pos, label)
    return cfg, m, batch


def test_multidevice_train_step_loss_decreases(rng):
    assert jax.device_count() == 8
    cfg, m, batch = _tiny_vqa_setup(rng)
    mesh = make_mesh()
    sample = tuple(b for b in batch)
    state, tx, sched, _lr = create_train_state(m, sample, cfg, steps_per_epoch=10)
    step = make_train_step(m, tx, "vqa", cfg, grad_accum=1)

    rep = replicated(mesh)
    jit_step = jax.jit(step, out_shardings=(rep, rep, rep))
    with mesh:
        sharded = shard_batch(batch, mesh)
        losses = []
        key = jax.random.PRNGKey(0)
        for i in range(30):
            key, sub = jax.random.split(key)
            state, loss, dm = jit_step(state, sharded, sub)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
    assert int(state.step) == 30
    # metrics flow
    assert "SoftAcc" in dm and "AnsLoss" in dm


def test_grad_accumulation_matches_big_batch(rng):
    """accum=2 over half-batches == one step over the full batch (same math:
    mean of per-microbatch mean losses; ref trainer.py:117-118)."""
    cfg, m, batch = _tiny_vqa_setup(rng)
    cfg.TRAIN.CLIP_GRAD_NORM = -1  # clipping is nonlinear; disable for parity
    sample = batch
    state, tx, _, _lr = create_train_state(m, sample, cfg, steps_per_epoch=10)
    state2 = TrainState(params=state.params, opt_state=state.opt_state,
                        step=state.step)

    step1 = make_train_step(m, tx, "vqa", cfg, grad_accum=1)
    step2 = make_train_step(m, tx, "vqa", cfg, grad_accum=2)

    key = jax.random.PRNGKey(0)

    # full batch
    s1, loss1, _ = jax.jit(step1)(state, batch, key)

    # same data split into 2 microbatches: [2, B/2, ...]
    def split(x):
        if x is None:
            return None
        return x.reshape(2, x.shape[0] // 2, *x.shape[1:])

    micro = jax.tree_util.tree_map(split, batch)
    s2, loss2, _ = jax.jit(step2)(state2, micro, key)

    # dropout rngs differ per microbatch, so compare with dropout disabled:
    # losses with deterministic data should still match to fp tolerance
    # (dropout is active; allow loose agreement on the loss value but param
    # updates must be close in norm)
    d1 = jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                                s1.params["params"], s2.params["params"])
    max_dev = max(jax.tree_util.tree_leaves(d1))
    assert max_dev < 5e-2  # same scale updates
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))


def test_checkpoint_roundtrip_and_auto_resume(tmp_path, rng):
    cfg, m, batch = _tiny_vqa_setup(rng)
    state, tx, _, _lr = create_train_state(m, batch, cfg, steps_per_epoch=10)
    prefix = str(tmp_path / "vlbert_tpu")
    p = save_checkpoint(prefix, 3, state, extra={"best_val": 0.5})
    state2, _, _2, _lr2 = create_train_state(m, batch, cfg, steps_per_epoch=10,
                                       rng=jax.random.PRNGKey(42))
    resumed, begin_epoch, extra = auto_resume(prefix, state2, end_epoch=10)
    assert begin_epoch == 4
    assert extra["best_val"] == 0.5
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(resumed.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_partial_load_reports_and_loads():
    params = {"vlbert": {"word_embeddings": {"embedding": np.zeros((4, 2), np.float32)}},
              "final_mlp": {"dense_0": {"kernel": np.zeros((2, 2), np.float32)}}}
    pretrain = {
        "module.vlbert.word_embeddings.embedding": np.ones((4, 2), np.float32),
        "module.unknown.key": np.ones(3),
        "module.final_mlp.dense_0.kernel": np.ones((9, 9), np.float32),  # mismatch
    }
    new, loaded = partial_load(params, pretrain,
                               prefix_changes=[("module.", "")])
    assert loaded == ["vlbert.word_embeddings.embedding"]
    assert np.all(new["vlbert"]["word_embeddings"]["embedding"] == 1)
    assert np.all(new["final_mlp"]["dense_0"]["kernel"] == 0)


def test_visual_scale_lr_mult_rules():
    from vlbert_tpu.training.optim import lr_mult_tree

    params = {"vlbert": {"visual_scale_text": np.ones(()),
                         "visual_scale_object": np.ones(()),
                         "word_embeddings": {"embedding": np.ones((3, 2))}}}
    cfg = default_config("vcr")
    cfg.TRAIN.VISUAL_SCALE_TEXT_LR_MULT = 10.0
    rules = list(cfg.TRAIN.LR_MULT)
    for key, name in (("VISUAL_SCALE_TEXT_LR_MULT", "visual_scale_text"),
                      ("VISUAL_SCALE_OBJECT_LR_MULT", "visual_scale_object")):
        mult = cfg.TRAIN.get(key, 1.0)
        if mult != 1.0:
            rules.insert(0, (name, mult))
    mults = lr_mult_tree(params, rules)
    assert mults["vlbert"]["visual_scale_text"] == 10.0
    assert mults["vlbert"]["visual_scale_object"] == 1.0
    assert mults["vlbert"]["word_embeddings"]["embedding"] == 1.0


def test_model_parallel_mesh_sharding(rng):
    """2-D (data, model) mesh: TP sharding rules compile + run a VL-BERT
    forward on the virtual 8-device mesh (SURVEY §2.6 optional TP)."""
    import jax
    import jax.numpy as jnp

    from vlbert_tpu.models.vlbert import VisualLinguisticBert, VLBertConfig
    from vlbert_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                          param_sharding_rules)

    mesh = make_mesh([4, 2], ("data", "model"))
    cfg = VLBertConfig(
        vocab_size=128, hidden_size=64, visual_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, visual_ln=True,
        visual_scale_text_init=1.0, visual_scale_object_init=1.0,
        with_pooler=True)
    m = VisualLinguisticBert(cfg)
    B, T, O = 8, 8, 4
    ids = jnp.asarray(rng.integers(1, 128, (B, T)), jnp.int32)
    tt = jnp.zeros((B, T), jnp.int32)
    tve = jnp.asarray(rng.normal(size=(B, T, 64)), jnp.float32)
    tmask = jnp.ones((B, T), bool)
    ove = jnp.asarray(rng.normal(size=(B, O, 128)), jnp.float32)
    omask = jnp.ones((B, O), bool)
    params = m.init(jax.random.PRNGKey(0), ids, tt, tve, tmask, ove, omask)

    rules = param_sharding_rules(mesh, params["params"])
    # at least the FFN kernels must be model-sharded
    n_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda s: "model" in str(s.spec), rules)) if leaf)
    assert n_sharded >= 2 * 4  # qkv+ffn kernels x 2 layers

    with mesh:
        sharded_params = {"params": jax.device_put(params["params"], rules)}
        bsh = batch_sharding(mesh)
        args = [jax.device_put(a, bsh) for a in (ids, tt, tve, tmask, ove, omask)]
        fwd = jax.jit(lambda p, *a: m.apply(p, *a)[1])
        pooled = jax.block_until_ready(fwd(sharded_params, *args))
    assert np.isfinite(np.asarray(pooled, np.float32)).all()
    # numerics match the unsharded forward
    ref = m.apply(params, ids, tt, tve, tmask, ove, omask)[1]
    np.testing.assert_allclose(np.asarray(pooled, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-3, atol=1e-4)


def test_plateau_detector_semantics():
    """ReduceLROnPlateau at the reference settings (mode max, patience 1,
    rel threshold 1e-4, cooldown 2 — ref vcr/function/train.py:283-292):
    LR drops after patience+1 non-improving epochs, then cooldown holds."""
    from vlbert_tpu.training.optim import ReduceLROnPlateau

    p = ReduceLROnPlateau(factor=0.5, patience=1, threshold=1e-4, cooldown=2)
    scales = [p.step(0.5) for _ in range(8)]
    # epoch0 improves (best=-inf); epochs 1,2 bad -> drop at epoch 2;
    # cooldown covers 3,4; 5,6 bad -> drop at 6
    assert scales == [1.0, 1.0, 0.5, 0.5, 0.5, 0.5, 0.25, 0.25]

    p2 = ReduceLROnPlateau(factor=0.1, patience=1, threshold=1e-4, cooldown=2)
    # steadily improving metric never drops the LR
    assert [p2.step(v) for v in (0.1, 0.2, 0.3, 0.4)] == [1.0] * 4

    # state round-trip
    sd = p.state_dict()
    p3 = ReduceLROnPlateau(factor=0.5)
    p3.load_state_dict(sd)
    assert p3.scale == p.scale and p3.best == p.best


def test_plateau_scale_leaf_drives_updates():
    """The host-rewritten plateau_scale opt-state leaf actually scales the
    parameter updates (VERDICT weak #2: previously dead state)."""
    from vlbert_tpu.training.optim import (get_plateau_scale, make_optimizer,
                                           set_plateau_scale)

    cfg = default_config("vcr")
    cfg.TRAIN.LR_SCHEDULE = "plateau"
    cfg.TRAIN.OPTIMIZER = "SGD"
    cfg.TRAIN.MOMENTUM = 0.0
    cfg.TRAIN.WD = 0.0
    cfg.TRAIN.CLIP_GRAD_NORM = 0.0
    cfg.TRAIN.LR = 0.001
    cfg.TRAIN.BATCH_IMAGES = 1
    cfg.TRAIN.GRAD_ACCUMULATE_STEPS = 1
    cfg._world_size = 1
    params = {"dense": {"kernel": jnp.ones((3, 3))}}
    tx, sched, base_lr = make_optimizer(cfg, params, steps_per_epoch=10)
    opt_state = tx.init(params)
    assert float(get_plateau_scale(opt_state)) == 1.0

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    up1, st1 = tx.update(grads, opt_state, params)
    opt_state_scaled = set_plateau_scale(opt_state, 0.25)
    up2, _ = tx.update(grads, opt_state_scaled, params)
    r = (float(up2["dense"]["kernel"][0, 0])
         / float(up1["dense"]["kernel"][0, 0]))
    assert abs(r - 0.25) < 1e-6


def test_best_val_named_metric_and_restore(tmp_path, monkeypatch):
    """ValidationMonitor semantics: best tracked by the NAMED host metric,
    -best.model mirrors only best epochs, and best_val survives restart
    (ref validation_monitor.py:5-46, vcr/function/train.py:267-270)."""
    import os
    import types

    import vlbert_tpu.data.build as build_mod
    import vlbert_tpu.engine.val as val_mod
    from tests.test_entrypoints import _tiny_vqa_cfg, _write_vqa_fixture
    from vlbert_tpu.engine.train import train_net

    data_dir, vocab_dir = _write_vqa_fixture(tmp_path)
    cfg = _tiny_vqa_cfg(tmp_path, data_dir, vocab_dir)
    cfg.TRAIN.END_EPOCH = 2

    orig = build_mod.make_vqa_collate
    monkeypatch.setattr(
        build_mod, "make_vqa_collate",
        lambda tokenizer, max_text, max_boxes, precomputed_dim=2048,
        test_mode=False: orig(tokenizer, max_text, max_boxes,
                              precomputed_dim=32, test_mode=test_mode))

    # scripted validation: epoch0 good, epoch1 worse
    vals = iter([{"SoftAcc": 0.9, "ClsAcc": 99.0},   # ClsAcc must NOT win
                 {"SoftAcc": 0.1, "ClsAcc": 99.0}])
    monkeypatch.setattr(
        val_mod, "make_validation_fn",
        lambda model, config, task, mesh: (lambda state, loader: next(vals)))

    args = types.SimpleNamespace(model_dir=str(tmp_path / "out"), log_dir=None)
    train_net(args, cfg, "vqa")
    out_dir = os.path.join(cfg.OUTPUT_PATH, "vqa_train")
    best = open(os.path.join(out_dir, "tiny-best.model"), "rb").read()
    ep0 = open(os.path.join(out_dir, "tiny-0000.model"), "rb").read()
    ep1 = open(os.path.join(out_dir, "tiny-0001.model"), "rb").read()
    assert best == ep0 and best != ep1    # epoch 1 (worse val) did not win

    # restart: best_val=0.9 must be restored from the checkpoint extra, so
    # a mediocre post-restart epoch cannot overwrite -best.model
    cfg.TRAIN.END_EPOCH = 3
    vals2 = iter([{"SoftAcc": 0.5}])
    monkeypatch.setattr(
        val_mod, "make_validation_fn",
        lambda model, config, task, mesh: (lambda state, loader: next(vals2)))
    train_net(args, cfg, "vqa")
    best2 = open(os.path.join(out_dir, "tiny-best.model"), "rb").read()
    assert best2 == ep0


def test_fp16_static_loss_scale_parity(rng):
    """TRAIN.FP16 + TPU.FP16_PARITY_MODE: loss is scaled by the static
    FP16_LOSS_SCALE before backward and grads/loss unscaled after (ref Apex
    AMP O2 fixed scale, vcr/function/train.py:322-328). With fp32 params the
    scaled step must match the unscaled step exactly up to fp rounding."""
    cfg, m, batch = _tiny_vqa_setup(rng)
    state0, tx, _, _lr = create_train_state(m, batch, cfg, steps_per_epoch=10)

    step_plain = make_train_step(m, tx, "vqa", cfg, grad_accum=1)
    cfg2 = cfg.clone() if hasattr(cfg, "clone") else cfg
    cfg2.TRAIN.FP16 = True
    cfg2.TPU.FP16_PARITY_MODE = True
    cfg2.TRAIN.FP16_LOSS_SCALE = 128.0
    step_scaled = make_train_step(m, tx, "vqa", cfg2, grad_accum=1)

    key = jax.random.PRNGKey(7)
    s1, l1, _ = jax.jit(step_plain)(state0, batch, key)
    s2, l2, _ = jax.jit(step_scaled)(state0, batch, key)
    # reported loss is UNSCALED
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    # parameter updates match (scale cancels exactly in fp32)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=1e-7)


def test_train_fp16_flag_selects_dtype(tmp_path):
    """engine.train dtype policy: TRAIN.FP16 -> bf16 on TPU by default,
    float16 under TPU.FP16_PARITY_MODE."""
    import jax.numpy as jnp

    from vlbert_tpu.utils.config import default_config

    def resolve(cfg):
        dtype_name = cfg.TPU.COMPUTE_DTYPE
        if cfg.TRAIN.FP16:
            if cfg.TPU.get("FP16_PARITY_MODE", False):
                dtype_name = "float16"
            elif dtype_name != "bfloat16":
                dtype_name = "bfloat16"
        return {"bfloat16": jnp.bfloat16,
                "float16": jnp.float16}.get(dtype_name, jnp.float32)

    cfg = default_config("vcr")
    cfg.TRAIN.FP16 = True
    assert resolve(cfg) == jnp.bfloat16
    cfg.TPU.FP16_PARITY_MODE = True
    assert resolve(cfg) == jnp.float16
    cfg.TRAIN.FP16 = False
    cfg.TPU.FP16_PARITY_MODE = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    assert resolve(cfg) == jnp.float32


def test_batch_first_loss_norms_match_reference_formulas():
    """MLM/MVRC_LOSS_NORM_IN_BATCH_FIRST: per-example mean over valid
    tokens/rows then mean over examples with any valid entry, +1e-4
    smoothing — checked against a torch transcription of the reference code
    (pretrain/modules/resnet_vlbert_for_pretraining.py:168-190)."""
    import torch
    import torch.nn.functional as F

    from vlbert_tpu.utils import losses

    rng = np.random.default_rng(0)
    B, T, V = 5, 7, 11
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    labels = rng.integers(-1, V, size=(B, T)).astype(np.int32)
    labels[3] = -1                       # one example with no masked tokens

    got = float(losses.cross_entropy_ignore_index_batch_first(
        jnp.asarray(logits), jnp.asarray(labels), -1))
    tl = torch.from_numpy(logits)
    tt = torch.from_numpy(labels.astype(np.int64))
    ref_ce = F.cross_entropy(tl.transpose(1, 2), tt, ignore_index=-1,
                             reduction="none")
    num = (tt != -1).sum(1, keepdim=True).to(ref_ce.dtype)
    num_has = (num != 0).sum().to(ref_ce.dtype)
    want = float((ref_ce / (num + 1e-4)).sum() / (num_has + 1e-4))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # MVRC soft-target variant; rows valid iff |sum-1| < 0.1
    O, C = 6, 9
    slogits = rng.normal(size=(B, O, C)).astype(np.float32)
    soft = rng.uniform(size=(B, O, C)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)             # valid rows
    soft[1, 2] *= 5.0                               # invalidate one row
    soft[4] *= 0.0                                  # example with no valid rows
    got = float(losses.soft_cross_entropy_batch_first(
        jnp.asarray(slogits), jnp.asarray(soft)))
    tsl = torch.from_numpy(slogits)
    tso = torch.from_numpy(soft)
    valid = (tso.sum(-1) - 1).abs() < 0.1
    per_row = (-F.log_softmax(tsl, -1) * tso).sum(-1) * valid
    num = valid.sum(1, keepdim=True).to(per_row.dtype)
    num_has = (num != 0).sum().to(per_row.dtype)
    want = float((per_row.sum(1, keepdim=True) / (num + 1e-4)).sum()
                 / (num_has + 1e-4))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_partial_pretrain_segmb_init(tmp_path, monkeypatch):
    """PARTIAL_PRETRAIN_SEGMB_INIT (ON in every shipped VCR config, ref
    vcr/function/train.py:223-229): token-type row 1 of the loaded pretrain
    checkpoint is re-initialized from row 0 before partial load."""
    from vlbert_tpu.engine.train import segmb_init_surgery
    from vlbert_tpu.utils.config import default_config

    tt_key = "vlbert.token_type_embeddings.embedding"
    cfg = default_config("vcr")

    cfg.NETWORK.PARTIAL_PRETRAIN_SEGMB_INIT = False
    flat = {tt_key: np.arange(12, dtype=np.float32).reshape(3, 4)}
    flat = segmb_init_surgery(flat, cfg)
    np.testing.assert_array_equal(flat[tt_key][1],
                                  np.asarray([4, 5, 6, 7], np.float32))

    cfg.NETWORK.PARTIAL_PRETRAIN_SEGMB_INIT = True
    flat = segmb_init_surgery(flat, cfg)
    np.testing.assert_array_equal(flat[tt_key][1], flat[tt_key][0])
    np.testing.assert_array_equal(flat[tt_key][2],
                                  np.asarray([8, 9, 10, 11], np.float32))


def test_partial_pretrain_with_shipped_prefix_changes(tmp_path):
    """The shipped VCR configs' PARTIAL_PRETRAIN_PREFIX_CHANGES are written
    in REFERENCE torch naming and must be applied to the RAW checkpoint
    names BEFORE conversion (ref vcr/function/train.py:202-214). Regression:
    applying them to converted flax names loaded 0 tensors silently."""
    import torch

    from vlbert_tpu.engine.train import apply_partial_pretrain
    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.training.checkpoint import flatten_params
    from vlbert_tpu.training.loop import TrainState
    from vlbert_tpu.utils.config import default_config

    HID, INTER, VOC, MAXP = 32, 64, 300, 64
    torch.manual_seed(0)

    def t(*shape):
        return torch.randn(*shape)

    # synthetic reference PRETRAIN checkpoint (DDP 'module.' + pretrain
    # module attribute names: vlbert. is NOT TimeDistributed in pretraining)
    sd = {
        "module.vlbert.word_embeddings.weight": t(VOC, HID),
        "module.vlbert.position_embeddings.weight": t(MAXP, HID),
        "module.vlbert.token_type_embeddings.weight": t(3, HID),
        "module.vlbert.embedding_LayerNorm.weight": t(HID),
        "module.vlbert.embedding_LayerNorm.bias": t(HID),
        "module.vlbert.end_embedding.weight": t(1, HID),
        "module.vlbert.visual_ln_text.weight": t(HID),
        "module.vlbert.visual_ln_text.bias": t(HID),
        "module.vlbert.visual_ln_object.weight": t(HID),
        "module.vlbert.visual_ln_object.bias": t(HID),
        "module.vlbert.pooler.dense.weight": t(HID, HID),
        "module.vlbert.pooler.dense.bias": t(HID),
        # pretrain MVRC head -> fine-tune cnn_loss_reg.0 via prefix rule
        "module.vlbert.mvrc_head.transform.dense.weight": t(HID, HID),
        "module.vlbert.mvrc_head.transform.dense.bias": t(HID),
        # NSP-style relationship head -> final_mlp surgery (LOAD_REL_HEAD)
        "module.vlbert.relationsip_head.caption_image_relationship.weight":
            t(2, HID),
        "module.vlbert.relationsip_head.caption_image_relationship.bias": t(2),
    }
    for name, shape in [
        ("attention.self.query.weight", (HID, HID)),
        ("attention.self.query.bias", (HID,)),
        ("attention.self.key.weight", (HID, HID)),
        ("attention.self.key.bias", (HID,)),
        ("attention.self.value.weight", (HID, HID)),
        ("attention.self.value.bias", (HID,)),
        ("attention.output.dense.weight", (HID, HID)),
        ("attention.output.dense.bias", (HID,)),
        ("attention.output.LayerNorm.weight", (HID,)),
        ("attention.output.LayerNorm.bias", (HID,)),
        ("intermediate.dense.weight", (INTER, HID)),
        ("intermediate.dense.bias", (INTER,)),
        ("output.dense.weight", (HID, INTER)),
        ("output.dense.bias", (HID,)),
        ("output.LayerNorm.weight", (HID,)),
        ("output.LayerNorm.bias", (HID,)),
    ]:
        sd[f"module.vlbert.encoder.layer.0.{name}"] = t(*shape)
    ckpt = str(tmp_path / "pretrain.model")
    torch.save({"state_dict": sd}, ckpt)

    cfg = default_config("vcr")
    cfg.MODULE = "ResNetVLBERT"
    cfg.DATASET.TASK = "Q2A"
    v = cfg.NETWORK.VLBERT
    v.hidden_size = HID; v.visual_size = HID; v.num_hidden_layers = 1
    v.num_attention_heads = 2; v.intermediate_size = INTER
    v.vocab_size = VOC; v.max_position_embeddings = MAXP
    v.visual_ln = True; v.with_pooler = True
    cfg.NETWORK.IMAGE_FINAL_DIM = HID
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    cfg.NETWORK.ENABLE_CNN_REG_LOSS = True
    cfg.NETWORK.CNN_LOSS_TOP = True
    cfg.NETWORK.LOAD_REL_HEAD = True
    cfg.NETWORK.CLASSIFIER_TYPE = "2fc"
    cfg.NETWORK.CLASSIFIER_HIDDEN_SIZE = HID
    cfg.NETWORK.PARTIAL_PRETRAIN = ckpt
    # the SHIPPED reference-era rules, verbatim (cfgs/vcr/*.yaml)
    cfg.NETWORK.PARTIAL_PRETRAIN_PREFIX_CHANGES = [
        "vlbert.mvrc_head.transform->cnn_loss_reg.0",
        "module.vlbert.mvrc_head.transform->module.cnn_loss_reg.0",
        "module.vlbert->module.vlbert._module",
        "vlbert->vlbert._module",
    ]
    cfg.NETWORK.PARTIAL_PRETRAIN_SEGMB_INIT = True
    cfg.TPU.FUSED_QKV = False
    cfg.TPU.COMPUTE_DTYPE = "float32"

    m = build_module(cfg, "vcr", dtype=jnp.float32)
    B, O, T, F = 1, 4, 10, HID
    init_batch = (
        None, jnp.zeros((B, O, 4 + F)),                   # image, boxes
        jnp.zeros((B, O), jnp.int32),                     # objects
        jnp.zeros((B, O, 7, 7), jnp.float32),             # segms
        jnp.ones((B, O), bool),                           # box_mask
        jnp.ones((B, 4, T), jnp.int32), jnp.zeros((B, 4, T), jnp.int32),
        jnp.zeros((B, 4, T), jnp.int32), jnp.ones((B, 4, T), bool),
        jnp.asarray([[64, 64, 1, 1]], jnp.float32),       # im_info
        jnp.zeros((B,), jnp.int32))                       # answer_label
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)},
                    *init_batch, train=True)
    state = TrainState(params=params, opt_state=None,
                       step=jnp.zeros((), jnp.int32))
    state2 = apply_partial_pretrain(state, cfg)
    after = flatten_params(jax.device_get(state2.params["params"]))

    def find(suffix):
        ks = [k for k in after if k.endswith(suffix)]
        assert len(ks) == 1, (suffix, ks)
        return after[ks[0]]

    # encoder + embeddings actually loaded
    np.testing.assert_allclose(
        find("vlbert.word_embeddings.embedding"),
        sd["module.vlbert.word_embeddings.weight"].numpy(), atol=0)
    np.testing.assert_allclose(
        find("layer_0.attention.self.query.kernel"),
        sd["module.vlbert.encoder.layer.0.attention.self.query.weight"]
        .numpy().T, atol=0)
    # mvrc transform -> cnn_loss_reg transform (prefix rule)
    np.testing.assert_allclose(
        find("cnn_loss_reg_transform.dense.kernel"),
        sd["module.vlbert.mvrc_head.transform.dense.weight"].numpy().T,
        atol=0)
    # segm-B surgery: row1 == row0 of the checkpoint
    tt = find("vlbert.token_type_embeddings.embedding")
    ref_tt = sd["module.vlbert.token_type_embeddings.weight"].numpy()
    np.testing.assert_allclose(tt[0], ref_tt[0], atol=0)
    np.testing.assert_allclose(tt[1], ref_tt[0], atol=0)
    np.testing.assert_allclose(tt[2], ref_tt[2], atol=0)
    # NSP -> binary classifier surgery (row1 - row0)
    w = sd["module.vlbert.relationsip_head.caption_image_relationship.weight"].numpy()
    b = sd["module.vlbert.relationsip_head.caption_image_relationship.bias"].numpy()
    np.testing.assert_allclose(find("final_mlp.dense_1.kernel"),
                               (w[1:2] - w[0:1]).T, rtol=1e-6)
    np.testing.assert_allclose(find("final_mlp.dense_1.bias"),
                               b[1:2] - b[0:1], rtol=1e-6)


def test_has_resumable_checkpoint(tmp_path):
    from vlbert_tpu.training.checkpoint import has_resumable_checkpoint

    cfg = default_config("vqa")
    cfg.TRAIN.AUTO_RESUME = True
    cfg.TRAIN.END_EPOCH = 3
    prefix = str(tmp_path / "m")
    assert not has_resumable_checkpoint(prefix, cfg)
    open(prefix + "-0001.model", "wb").write(b"x")
    assert has_resumable_checkpoint(prefix, cfg)
    cfg.TRAIN.AUTO_RESUME = False
    assert not has_resumable_checkpoint(prefix, cfg)
    cfg.TRAIN.RESUME = True
    cfg.TRAIN.BEGIN_EPOCH = 2
    assert has_resumable_checkpoint(prefix, cfg)
    cfg.TRAIN.BEGIN_EPOCH = 1
    assert not has_resumable_checkpoint(prefix, cfg)


def test_translate_prefix_rules_for_native():
    """Reference-era PREFIX_CHANGES applied to a NATIVE (flax-named)
    checkpoint: DDP/TimeDistributed renames are identities (dropped); the
    mvrc->cnn_loss_reg remap translates; unknown rules pass through."""
    from vlbert_tpu.training.convert import translate_prefix_rules_for_native

    rules = [("vlbert.mvrc_head.transform", "cnn_loss_reg.0"),
             ("module.vlbert.mvrc_head.transform", "module.cnn_loss_reg.0"),
             ("module.vlbert", "module.vlbert._module"),
             ("vlbert", "vlbert._module"),
             ("custom.a", "custom.b")]
    out = translate_prefix_rules_for_native(rules)
    assert out == [("vlbert.mvrc_head.transform_dense",
                    "cnn_loss_reg_transform.dense"),
                   ("custom.a", "custom.b")]


def test_plateau_state_survives_restart(tmp_path, monkeypatch):
    """Plateau detector state rides the checkpoint extra: after a restart
    the reduced LR scale and best/cooldown history are restored instead of
    resetting to 1.0 (which would silently 10x the LR)."""
    from vlbert_tpu.training.optim import ReduceLROnPlateau

    p = ReduceLROnPlateau(factor=0.1, patience=1, threshold=1e-4, cooldown=2)
    p.step(0.5)           # best=0.5
    p.step(0.4); p.step(0.4)   # 2 bad epochs > patience -> reduce
    assert abs(p.scale - 0.1) < 1e-12
    saved = p.state_dict()

    p2 = ReduceLROnPlateau(factor=0.1, patience=1, threshold=1e-4, cooldown=2)
    p2.load_state_dict(saved)
    assert p2.scale == p.scale and p2.best == p.best
    assert p2.cooldown_counter == p.cooldown_counter
    # next non-improving step keeps the reduced scale (cooldown active)
    assert abs(p2.step(0.4) - 0.1) < 1e-12


def test_schedule_units_with_grad_accum():
    """steps_per_epoch arrives in OPTIMIZER steps (loader folds accum), so
    milestones/t_total must NOT be divided by accum again. Regression: the
    double division made triangle decay to 0 a quarter of the way through a
    4-accum run (75% of training at LR=0)."""
    cfg = default_config("vcr")
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.BATCH_IMAGES = 1
    cfg.TRAIN.GRAD_ACCUMULATE_STEPS = 4
    cfg.TRAIN.LR_SCHEDULE = "triangle"
    cfg.TRAIN.END_EPOCH = 10
    cfg.TRAIN.WARMUP = True
    cfg.TRAIN.WARMUP_STEPS = 100
    cfg._world_size = 1
    spe = 100   # optimizer steps per epoch
    sched, base_lr = make_lr_schedule(cfg, steps_per_epoch=spe)
    # t_total = 10 * 100 = 1000 optimizer steps: LR at midpoint ~ base/2
    np.testing.assert_allclose(float(sched(550)), base_lr * 0.5, rtol=1e-4)
    assert float(sched(990)) > 0.0          # NOT decayed to zero early
    assert float(sched(260)) > base_lr * 0.7  # was 0 under the old /accum

    cfg.TRAIN.LR_SCHEDULE = "step"
    cfg.TRAIN.LR_STEP = (2.0, 4.0)
    cfg.TRAIN.LR_FACTOR = 0.1
    cfg.TRAIN.WARMUP_STEPS = 10
    sched, base_lr = make_lr_schedule(cfg, steps_per_epoch=spe)
    np.testing.assert_allclose(float(sched(150)), base_lr, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), base_lr * 0.1, rtol=1e-6)


def test_native_pretrain_checkpoint_to_task_partial_pretrain(tmp_path):
    """This framework's OWN pretrain checkpoint (msgpack '.model', encoder
    nested at vlbert.bert.) fine-tunes a task model through
    PARTIAL_PRETRAIN: content-sniffed routing + nesting alignment must load
    the encoder weights (regression: 0 tensors loaded / torch.load crash)."""
    from vlbert_tpu.engine.train import apply_partial_pretrain
    from vlbert_tpu.training.checkpoint import flatten_params, save_checkpoint

    HID, INTER, VOC, MAXP = 32, 64, 300, 64

    def small(cfg):
        v = cfg.NETWORK.VLBERT
        v.hidden_size = HID; v.visual_size = HID; v.num_hidden_layers = 1
        v.num_attention_heads = 2; v.intermediate_size = INTER
        v.vocab_size = VOC; v.max_position_embeddings = MAXP
        v.visual_ln = True; v.with_pooler = True
        cfg.NETWORK.IMAGE_FINAL_DIM = HID
        cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.FUSED_QKV = False

    # 1. build + save a tiny PRETRAIN state natively
    pcfg = default_config("pretrain")
    pcfg.MODULE = "ResNetVLBERTForPretrainingMultitask"
    small(pcfg)
    pcfg.NETWORK.VLBERT.visual_region_classes = 7
    pcfg.NETWORK.WITH_REL_LOSS = True
    pm = build_module(pcfg, "pretrain", dtype=jnp.float32,
                      mask_visual_feat_dim=HID)
    B, O, T, T2 = 2, 4, 10, 12
    r = np.random.default_rng(0)
    boxes = np.full((B, O, 4 + HID), -2.0, np.float32)
    boxes[:, :3, :4] = 10.0; boxes[:, :3, 2:4] = 40.0
    boxes[:, :3, 4:] = r.normal(size=(B, 3, HID))
    pbatch = (None, jnp.asarray(boxes),
              jnp.asarray([[100, 80, 1, 1]] * B, jnp.float32),
              jnp.asarray(r.integers(1, VOC, (B, T)), jnp.int32),
              jnp.asarray([0, 1], jnp.int32),
              jnp.full((B, T), -1, jnp.int32), jnp.zeros((B, O), jnp.int32),
              jnp.zeros((B, O, 7), jnp.float32),
              jnp.asarray(r.integers(1, VOC, (B, T2)), jnp.int32),
              jnp.full((B, T2), -1, jnp.int32))
    pparams = pm.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, *pbatch, train=True)
    pstate = TrainState(params=pparams, opt_state=None,
                        step=jnp.zeros((), jnp.int32))
    ckpt = save_checkpoint(str(tmp_path / "pt"), 0, pstate)
    pflat = flatten_params(jax.device_get(pparams["params"]))
    src_key = "vlbert.bert.encoder.layer_0.attention.self.query.kernel"
    assert src_key in pflat     # pretrain nesting confirmed

    # 2. fine-tune target: tiny VQA model, PARTIAL_PRETRAIN = native ckpt
    tcfg = default_config("vqa")
    tcfg.MODULE = "ResNetVLBERT"
    small(tcfg)
    tcfg.DATASET.ANSWER_VOCAB_SIZE = 8
    tcfg.NETWORK.CLASSIFIER_TYPE = "1fc"
    tcfg.NETWORK.PARTIAL_PRETRAIN = ckpt
    tcfg.NETWORK.PARTIAL_PRETRAIN_PREFIX_CHANGES = []
    m = build_module(tcfg, "vqa", dtype=jnp.float32)
    tb = (None, jnp.zeros((1, O, 4 + HID)), jnp.ones((1, O), bool),
          jnp.asarray([[64, 64, 1, 1]], jnp.float32),
          jnp.ones((1, T), jnp.int32), jnp.zeros((1, T), jnp.int32),
          jnp.ones((1, T), bool), jnp.full((1,), T - 1, jnp.int32),
          jnp.zeros((1, 8)))
    tparams = m.init({"params": jax.random.PRNGKey(5),
                      "dropout": jax.random.PRNGKey(6)}, *tb, train=True)
    tstate = TrainState(params=tparams, opt_state=None,
                        step=jnp.zeros((), jnp.int32))
    tstate2 = apply_partial_pretrain(tstate, tcfg)
    tflat = flatten_params(jax.device_get(tstate2.params["params"]))
    dst_key = "vlbert.encoder.layer_0.attention.self.query.kernel"
    np.testing.assert_array_equal(tflat[dst_key], pflat[src_key])
    np.testing.assert_array_equal(
        tflat["vlbert.word_embeddings.embedding"],
        pflat["vlbert.bert.word_embeddings.embedding"])


def test_bench_slope_uses_disjoint_input_ranges():
    """bench._slope_time must hand each run a DISJOINT input base —
    re-running base 0 re-issues byte-identical executions that the device
    tunnel can dedupe, silently inflating the published throughput."""
    import bench

    calls = []

    def run_k(k, base):
        calls.append((k, base))
        return 0.01 * k     # linear: slope == 0.01 per call

    dt = bench._slope_time(run_k, k1=6, k2=18)
    np.testing.assert_allclose(dt, 0.01, rtol=1e-9)
    ranges = [set(range(b, b + k)) for k, b in calls]
    for i in range(len(ranges)):
        for j in range(i + 1, len(ranges)):
            assert not (ranges[i] & ranges[j]), (calls, "overlapping inputs")

def test_bench_staged_inputs_are_distinct_for_all_dtypes():
    """Staged slope inputs must differ pairwise (dedupe defense) for BOTH
    wire formats: uint8 images and float precomputed-feature tensors
    (train_step_vqa varies the feature leaf, vary_idx=1)."""
    import bench

    for base in (np.full((2, 4, 4, 3), 7, np.uint8),
                 np.ones((2, 3, 8), np.float32)):
        staged = bench._staged_images(base, 4)
        assert all(np.asarray(s).dtype == base.dtype for s in staged)
        assert all(np.asarray(s).shape == base.shape for s in staged)
        for i in range(4):
            for j in range(i + 1, 4):
                assert not np.array_equal(np.asarray(staged[i]),
                                          np.asarray(staged[j])), (i, j)


def test_bench_degrade_ladder_on_oom():
    """RESOURCE_EXHAUSTED walks the degradation ladder; other errors stop it;
    full exhaustion yields an {"error": ...} dict (never an exception)."""
    import bench

    calls = []

    def oom_once(**kw):
        calls.append(kw)
        if len(calls) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return {"img_per_s": 42.0}

    r = bench._with_degrade(oom_once, [dict(B=16), dict(B=8)], "fwd")
    assert r["img_per_s"] == 42.0 and r["degraded"]["B"] == 8

    def oom_always(**kw):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    r = bench._with_degrade(oom_always, [dict(B=16), dict(B=8)], "fwd")
    assert "error" in r and "RESOURCE_EXHAUSTED" in r["error"]

    def other_err(**kw):
        raise ValueError("not an OOM")

    r = bench._with_degrade(other_err, [dict(B=16), dict(B=8)], "x")
    assert "error" in r and "not an OOM" in r["error"]


def test_bench_oom_cleanup_releases_rung_locals():
    """An OOM'd rung's locals (multi-GB staged inputs / train states) must
    not stay pinned by traceback frame cycles while later rungs run — that
    cascade turned one vqa B=256 OOM into RESOURCE_EXHAUSTED for every
    later rung AND the pretrain/serve sections (full run, 2026-08-19)."""
    import weakref

    import bench

    class Pinned:   # weakref-able stand-in for a staged-input list
        pass

    ref = {}

    def rung(**kw):
        if "w" not in ref:
            pinned = Pinned()
            ref["w"] = weakref.ref(pinned)
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        assert ref["w"]() is None, \
            "previous rung's locals still alive while this rung runs"
        return {"img_per_s": 1.0}

    r = bench._with_degrade(rung, [dict(B=2), dict(B=1)], "x")
    assert r["img_per_s"] == 1.0 and ref["w"]() is None


def test_bench_staged_images_frees_partial_on_oom(monkeypatch):
    """A mid-loop staging OOM must immediately free the already-staged
    copies instead of leaking them into the traceback."""
    import jax

    import bench

    n_puts = {"n": 0}
    real_put = jax.device_put

    def flaky_put(x):
        n_puts["n"] += 1
        if n_puts["n"] == 3:
            raise RuntimeError("RESOURCE_EXHAUSTED: staging")
        return real_put(x)

    freed = []
    monkeypatch.setattr(jax, "device_put", flaky_put)
    monkeypatch.setattr(bench, "_free", lambda *t: freed.extend(t))
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        bench._staged_images(np.zeros((2, 2, 2, 3), np.uint8), 5)
    assert len(freed) == 1 and len(freed[0]) == 2, \
        "partial staging list was not freed on the OOM path"


def test_bench_poisoning_oom_isolates_remaining_rungs(monkeypatch):
    """One RESOURCE_EXHAUSTED poisons this TPU plugin's backend for the
    whole process (probed 2026-08-19: every later device op fails, while a
    fresh process sees a healthy chip). After the first OOM of a registered
    section fn, every remaining rung must run via _run_rung_isolated."""
    import bench

    calls = {"inproc": 0, "isolated": []}

    def fake_rung(**kw):
        calls["inproc"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
    fake_rung.__name__ = "fake_rung"

    def fake_isolated(fn_name, kw, name, timeout=None):
        calls["isolated"].append((fn_name, kw))
        if kw["B"] > 1:
            return {"oom": True, "error": "RESOURCE_EXHAUSTED (child)"}
        return {"ok": {"img_per_s": 7.0}}

    monkeypatch.setitem(bench._RUNG_FNS, "fake_rung", fake_rung)
    monkeypatch.setattr(bench, "_run_rung_isolated", fake_isolated)
    monkeypatch.setitem(bench._POISONED, "flag", False)
    r = bench._with_degrade(fake_rung,
                            [dict(B=4), dict(B=2), dict(B=1)], "x")
    # first rung in-process (OOMs -> poisons), the rest isolated
    assert calls["inproc"] == 1
    assert calls["isolated"] == [("fake_rung", {"B": 2}),
                                 ("fake_rung", {"B": 1})]
    assert r["img_per_s"] == 7.0 and r["isolated"] is True
    assert r["degraded"]["B"] == 1
    assert bench._POISONED["flag"]


def test_bench_poisoned_flag_does_not_isolate_unregistered_fns(monkeypatch):
    """Test doubles / ad-hoc fns are not in _RUNG_FNS: they must keep the
    plain in-process ladder even when the process is marked poisoned."""
    import bench

    monkeypatch.setitem(bench._POISONED, "flag", True)
    seen = []

    def fn(**kw):
        seen.append(kw)
        if kw["B"] > 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: x")
        return {"img_per_s": 1.0}

    monkeypatch.setattr(
        bench, "_run_rung_isolated",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("isolated")))
    r = bench._with_degrade(fn, [dict(B=2), dict(B=1)], "x")
    assert r["img_per_s"] == 1.0 and seen == [dict(B=2), dict(B=1)]


def test_bench_speculative_rung_runs_isolated_and_never_poisons(monkeypatch):
    """A _speculative rung (the vqa B=256 headroom probe) runs in an
    isolated child FROM THE START: its OOM must not poison the main
    process, and the ladder falls through to the in-process next rung."""
    import bench

    calls = {"inproc": [], "isolated": []}

    def fake_rung(**kw):
        calls["inproc"].append(kw)
        return {"img_per_s": 11.0}
    fake_rung.__name__ = "fake_rung2"

    def fake_isolated(fn_name, kw, name, timeout=None):
        calls["isolated"].append((fn_name, kw))
        return {"oom": True, "error": "RESOURCE_EXHAUSTED (child)"}

    monkeypatch.setitem(bench._RUNG_FNS, "fake_rung2", fake_rung)
    monkeypatch.setattr(bench, "_run_rung_isolated", fake_isolated)
    monkeypatch.setitem(bench._POISONED, "flag", False)
    ladder = [dict(B=256, _speculative=True), dict(B=128)]
    r = bench._with_degrade(fake_rung, ladder, "x")
    # the marker must not leak into the child kwargs or mutate the ladder
    assert calls["isolated"] == [("fake_rung2", {"B": 256})]
    assert ladder[0] == dict(B=256, _speculative=True)
    # child OOM falls through; main process rung runs in-process, unpoisoned
    assert calls["inproc"] == [dict(B=128)]
    assert r["img_per_s"] == 11.0 and r["degraded"]["B"] == 128
    assert not bench._POISONED["flag"]


def test_bench_speculative_rung_success_is_annotated(monkeypatch):
    """A speculative rung that SUCCEEDS in its child returns that result,
    marked isolated, without touching the in-process backend."""
    import bench

    def fake_rung(**kw):
        raise AssertionError("must not run in-process")
    fake_rung.__name__ = "fake_rung3"

    monkeypatch.setitem(bench._RUNG_FNS, "fake_rung3", fake_rung)
    monkeypatch.setattr(
        bench, "_run_rung_isolated",
        lambda fn_name, kw, name, timeout=None: {"ok": {"img_per_s": 5.0}})
    monkeypatch.setitem(bench._POISONED, "flag", False)
    r = bench._with_degrade(fake_rung,
                            [dict(B=256, _speculative=True)], "x")
    assert r["img_per_s"] == 5.0 and r["isolated"] is True
    assert "degraded" not in r and not bench._POISONED["flag"]


def test_bench_rung_child_verdicts(monkeypatch, capsys):
    """--rung children always exit 0 and print exactly one JSON verdict:
    ok / oom / error — the parent ladder needs the distinction."""
    import json as _json

    import bench

    monkeypatch.setattr(bench, "_enable_compile_cache", lambda: None)

    def ok_fn(**kw):
        return {"img_per_s": kw["B"] * 1.0}
    monkeypatch.setitem(bench._RUNG_FNS, "ok_fn", ok_fn)
    assert bench._rung_child("ok_fn", '{"B": 3}') == 0
    assert _json.loads(capsys.readouterr().out) == \
        {"ok": {"img_per_s": 3.0}}

    def oom_fn(**kw):
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
    monkeypatch.setitem(bench._RUNG_FNS, "oom_fn", oom_fn)
    assert bench._rung_child("oom_fn", "{}") == 0
    assert _json.loads(capsys.readouterr().out)["oom"] is True

    def bad_fn(**kw):
        raise ValueError("not an oom")
    monkeypatch.setitem(bench._RUNG_FNS, "bad_fn", bad_fn)
    assert bench._rung_child("bad_fn", "{}") == 0
    out = _json.loads(capsys.readouterr().out)
    assert "oom" not in out and "not an oom" in out["error"]


def test_bench_main_always_emits_json(monkeypatch, capsys, tmp_path):
    """BENCH_r02 was rc=1 with no JSON. main() must print a parseable line
    and return 0 even if every section raises."""
    import json as _json

    import bench

    def boom(**kw):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    monkeypatch.setattr(bench, "_SIDECAR", str(tmp_path / "bench_full.json"))
    monkeypatch.setattr(bench, "fwd_bench", boom)
    monkeypatch.setattr(bench, "train_bench", boom)
    monkeypatch.setattr(bench, "serve_bench", boom)
    monkeypatch.setattr(bench, "vqa_train_bench", boom)
    monkeypatch.setattr(bench, "pretrain_bench", boom)
    monkeypatch.setattr(bench, "_enable_compile_cache", lambda: None)
    rc = bench.main(["--full"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = _json.loads(out)
    assert rc == 0
    assert d["value"] == 0.0
    for sec in ("fwd", "train_step", "train_step_accum4", "train_step_b16",
                "train_step_large", "train_step_vqa", "pretrain_step",
                "serve_latency"):
        assert "error" in d["details"][sec], sec


def test_bench_default_profile_is_headline_only(monkeypatch, capsys,
                                                tmp_path):
    """Round-5 restructure (BENCH_r04 rc=124): the DEFAULT profile runs only
    the headline sections — fwd, train_b16, serve, train_step — in that
    order, with the ladders (accum4/large/vqa/pretrain) behind --full, so
    the driver-budgeted run provably finishes."""
    import json as _json

    import bench

    order = []

    def rec(name, val):
        def fn(**kw):
            order.append(name)
            return dict(val)
        return fn

    monkeypatch.setattr(bench, "_SIDECAR", str(tmp_path / "bench_full.json"))
    monkeypatch.setattr(bench, "_enable_compile_cache", lambda: None)
    monkeypatch.setattr(bench, "_backend_alive",
                        lambda t, _probe=None: ("TPU v5 lite0", None))
    monkeypatch.setattr(bench, "fwd_bench",
                        rec("fwd", {"img_per_s": 500.0, "batch": 16,
                                    "flops_per_img": 2.2e11}))
    monkeypatch.setattr(bench, "train_bench",
                        rec("train", {"img_per_s": 150.0}))
    monkeypatch.setattr(bench, "serve_bench", rec("serve", {"p50_ms": 42.0}))
    monkeypatch.setattr(
        bench, "vqa_train_bench",
        rec("vqa", {"samples_per_s": 1.0}))
    monkeypatch.setattr(
        bench, "pretrain_bench",
        rec("pretrain", {"img_per_s": 1.0}))
    rc = bench.main([])
    d = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    # ladders never ran; headline order is fwd -> b16 -> serve -> b4
    assert order == ["fwd", "train", "serve", "train"]
    det = d["details"]
    for sec in ("fwd", "train_step_b16", "serve_latency", "train_step"):
        assert sec in det, sec
    for sec in ("train_step_accum4", "train_step_large", "train_step_vqa",
                "train_step_vqa_l128", "pretrain_step"):
        assert sec not in det, sec
    # per-section wall telemetry lands in the sidecar, not on the line
    full = _json.loads((tmp_path / "bench_full.json").read_text())
    assert set(full["details"]["section_wall_s"]) == {
        "fwd", "train_step_b16", "serve_latency", "train_step"}
    assert "section_wall_s" not in det


def test_bench_budget_gate_skips_with_reason(monkeypatch, capsys, tmp_path):
    """A section whose cost estimate exceeds the remaining budget is skipped
    with a recorded reason (never silently) — the headline fwd section is
    ungated and always runs."""
    import json as _json

    import bench

    monkeypatch.setattr(bench, "_SIDECAR", str(tmp_path / "bench_full.json"))
    monkeypatch.setattr(bench, "_enable_compile_cache", lambda: None)
    monkeypatch.setattr(bench, "_backend_alive",
                        lambda t, _probe=None: ("TPU v5 lite0", None))
    monkeypatch.setattr(bench, "fwd_bench",
                        lambda **kw: {"img_per_s": 500.0, "batch": 16})
    ran = []
    monkeypatch.setattr(bench, "train_bench",
                        lambda **kw: ran.append("train") or {"img_per_s": 1})
    monkeypatch.setattr(bench, "serve_bench",
                        lambda **kw: ran.append("serve") or {"p50_ms": 1})
    monkeypatch.setenv("BENCH_DEADLINE_S", "10")   # < any est + margin
    rc = bench.main([])
    d = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and not ran
    assert d["details"]["fwd"]["img_per_s"] == 500.0
    for sec in ("train_step_b16", "serve_latency", "train_step"):
        assert "budget" in d["details"][sec]["skipped"], sec


def test_bench_serve_regression_tripwire(monkeypatch, capsys, tmp_path):
    """bench warns when device_ms_per_query moves >30% vs the previous
    sidecar (VERDICT r4: the 2x serve move went unremarked)."""
    import json as _json

    import bench

    sidecar = tmp_path / "bench_full.json"
    sidecar.write_text(_json.dumps({"details": {"serve_latency": {
        "device_compute": {"device_ms_per_query": 0.8}}}}))
    monkeypatch.setattr(bench, "_SIDECAR", str(sidecar))
    monkeypatch.setattr(bench, "_enable_compile_cache", lambda: None)
    monkeypatch.setattr(bench, "_backend_alive",
                        lambda t, _probe=None: ("TPU v5 lite0", None))
    monkeypatch.setattr(bench, "fwd_bench",
                        lambda **kw: {"img_per_s": 500.0, "batch": 16})
    monkeypatch.setattr(bench, "train_bench",
                        lambda **kw: {"img_per_s": 150.0})
    monkeypatch.setattr(
        bench, "serve_bench",
        lambda **kw: {"p50_ms": 80.0,
                      "device_compute": {"device_ms_per_query": 1.75}})
    rc = bench.main([])
    d = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert "moved >30%" in d["details"]["serve_latency"]["regression_warn"]


def test_bench_line_is_driver_parseable(monkeypatch, capsys, tmp_path):
    """BENCH_r03 had parsed=null: the emitted line was ~2.9 KB of embedded
    methodology prose and the driver keeps only a 2000-char tail. With every
    section fully populated the line must stay well under that (< 1500 B),
    and the full artifact (prose included) must land in the sidecar."""
    import json as _json

    import bench

    monkeypatch.setattr(bench, "_SIDECAR", str(tmp_path / "bench_full.json"))
    monkeypatch.setattr(bench, "_enable_compile_cache", lambda: None)
    monkeypatch.setattr(bench, "_backend_alive",
                        lambda t, _probe=None: ("TPU v5 lite0", None))
    fwd = {"img_per_s": 509.16, "ms_per_batch": 31.424, "batch": 16,
           "mfu": 0.565, "tflops_per_batch": 3.5,
           "flops_per_img": 218605551616.0}
    train = {"img_per_s": 143.72, "ms_per_step": 111.327, "batch": 16,
             "accum": 4, "mfu": 0.4607, "tflops_per_step": 10.1}
    vqa = {"samples_per_s": 1548.74, "ms_per_step": 116.63, "batch": 256,
           "mfu": 0.4556, "tflops_per_step": 5.87}
    pre = {"img_per_s": 88.73, "samples_per_s": 177.46, "ms_per_step": 180.3,
           "batch_images": 16, "batch_aux_texts": 16, "mfu": 0.41,
           "tflops_per_step": 14.2}
    serve = {"p50_ms": 42.841790999773366, "p90_ms": 52.422818999639276,
             "p99_ms": 87.0047392501601, "n": 40,
             "device_compute": {"device_ms_per_query": 0.8153,
                                "k1": 8, "k2": 24},
             "int8": {"p50_ms": 42.64999, "p90_ms": 52.06260,
                      "p99_ms": 55.93012, "n": 40,
                      "device_compute": {"device_ms_per_query": 0.6134,
                                         "k1": 8, "k2": 24},
                      "device_speedup": 1.329},
             "note": "batch-1, base VQA, precomputed features, incl host RTT"}
    monkeypatch.setattr(bench, "fwd_bench", lambda **kw: dict(fwd))
    monkeypatch.setattr(bench, "train_bench", lambda **kw: dict(train))
    monkeypatch.setattr(bench, "vqa_train_bench", lambda **kw: dict(vqa))
    monkeypatch.setattr(bench, "pretrain_bench", lambda **kw: dict(pre))
    monkeypatch.setattr(bench, "serve_bench", lambda **kw: dict(serve))
    rc = bench.main(["--full"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    assert len(out.encode()) < 1500, f"line is {len(out.encode())} bytes"
    d = _json.loads(out)
    assert d["value"] == 509.16
    assert d["vs_baseline"] > 0
    det = d["details"]
    for sec in ("fwd", "train_step", "train_step_accum4", "train_step_b16",
                "train_step_large", "train_step_vqa", "train_step_vqa_l128",
                "pretrain_step", "serve_latency"):
        assert det[sec], sec
    # numbers survive compaction; prose does not
    assert det["train_step_vqa"]["mfu"] == 0.4556
    assert det["serve_latency"]["int8_speedup"] == 1.329
    assert "methodology" not in det and "vs_baseline_meaning" not in det
    full = _json.loads((tmp_path / "bench_full.json").read_text())
    assert "methodology" in full["details"]
    assert full["details"]["serve_latency"]["int8"]["device_speedup"] == 1.329


def _run_bench_subprocess(extra_argv, extra_env, timeout=120):
    import json as _json
    import subprocess
    import sys as _sys
    import tempfile

    # keep selftest subprocesses from clobbering the real bench sidecar
    sidecar = os.path.join(tempfile.mkdtemp(prefix="bench_selftest_"),
                           "bench_full.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_SIDECAR=sidecar,
               **extra_env)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [_sys.executable, os.path.join(repo, "bench.py")] + extra_argv,
        capture_output=True, text=True, timeout=timeout, env=env)
    assert p.returncode == 0, (p.returncode, p.stderr[-2000:])
    return _json.loads(p.stdout.strip().splitlines()[-1])


def test_bench_backend_hang_still_emits_json():
    """Observed live: the device tunnel hangs forever INSIDE jax backend
    init when the relay is down — bench must detect it with a deadline and
    still print its JSON line with rc 0 (BENCH_r02's failure mode was a
    bench with no parseable artifact)."""
    d = _run_bench_subprocess(
        ["--selftest-hang"], {"BENCH_BACKEND_TIMEOUT_S": "1"})
    assert d["value"] == 0.0
    assert "unreachable" in d["details"]["error"]


def test_bench_watchdog_deadline_emits_partial_json():
    """If the run wedges mid-measurement, the global watchdog emits the JSON
    line with whatever sections completed and exits 0.

    --selftest-wedge substitutes a fast synthetic probe: this test exercises
    the WATCHDOG, not backend init. Round 3 flaked here because the real
    probe initialized the tunneled device plugin (which loads even under
    JAX_PLATFORMS=cpu) with BENCH_BACKEND_TIMEOUT_S equal to the harness
    timeout — zero headroom when the relay was slow."""
    d = _run_bench_subprocess(
        ["--selftest-wedge"],
        {"BENCH_DEADLINE_S": "2", "BENCH_BACKEND_TIMEOUT_S": "15"})
    assert "watchdog" in d["details"]["error"]
    assert d["details"].get("device")    # preflight succeeded first


def test_profile_step_flag_plumbing(monkeypatch, capsys):
    """tools/profile_step.py routes config flags to the bench function and
    records the A/B variant (donation / masked-Adam) it actually ran."""
    import json as _json

    import bench
    import tools.profile_step as ps

    seen = {}

    def fake_train_bench(**kw):
        seen.update(kw)
        return {"img_per_s": 1.0}

    monkeypatch.setattr(bench, "train_bench", fake_train_bench)
    monkeypatch.setattr(bench, "_enable_compile_cache", lambda: None)
    orig_jit = jax.jit        # --no-donate patches jax.jit process-globally
    try:
        rc = ps.main(["--b16", "--no-donate"])
    finally:
        jax.jit = orig_jit
    out = _json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and seen["B"] == 16
    # masked_adam reports the MEASURED mode: dense is the default now
    assert out["variant"] == {"donate": False, "masked_adam": False}


def test_batch_seed_mixes_loader_id():
    """Multitask sub-loaders share cfg.RNG_SEED and epoch; loader_id must
    decorrelate their augmentation/masking RNG streams even when two
    sub-datasets' batches start at the same index."""
    from vlbert_tpu.data.loader import _batch_seed

    s0 = _batch_seed(7, 3, [0, 1], loader_id=0).generate_state(4)
    s1 = _batch_seed(7, 3, [0, 1], loader_id=1).generate_state(4)
    assert not np.array_equal(s0, s1)
    # determinism: same tuple -> same stream
    np.testing.assert_array_equal(
        s0, _batch_seed(7, 3, [0, 1], loader_id=0).generate_state(4))


def test_fsdp_train_step_matches_dp(rng):
    """TPU.PARTITION_MODE=fsdp: a full train step with params + Adam moments
    sharded over the 'data' axis (ZeRO-style) matches the pure-DP step's
    loss and updated params; big leaves actually shard, the step counter
    and small leaves stay replicated."""
    from vlbert_tpu.parallel.mesh import fsdp_sharding_rules
    from vlbert_tpu.training.checkpoint import flatten_params

    assert jax.device_count() == 8
    cfg, m, batch = _tiny_vqa_setup(rng)
    cfg.NETWORK.VLBERT.hidden_dropout_prob = 0.0
    cfg.NETWORK.VLBERT.attention_probs_dropout_prob = 0.0
    m = build_module(cfg, "vqa", dtype=jnp.float32)
    state, tx, _, _lr = create_train_state(m, batch, cfg, steps_per_epoch=10)
    step = make_train_step(m, tx, "vqa", cfg, grad_accum=1)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh()
    rep = replicated(mesh)

    jit_dp = jax.jit(step, out_shardings=(rep, rep, rep))
    with mesh:
        s_dp, loss_dp, _ = jit_dp(state, shard_batch(batch, mesh), key)
        loss_dp = float(loss_dp)
        p_dp = jax.device_get(s_dp.params["params"])

    rules = fsdp_sharding_rules(mesh, state, min_size=64)  # tiny model
    n_sharded = sum(1 for s in jax.tree_util.tree_leaves(rules)
                    if "data" in str(s.spec))
    assert n_sharded >= 10, n_sharded            # params AND mirrored moments
    flat_rules = jax.tree_util.tree_flatten_with_path(rules)[0]
    step_specs = [s for p, s in flat_rules
                  if "step" in "/".join(str(getattr(k, 'key', k)) for k in p)]
    assert all("data" not in str(s.spec) for s in step_specs)

    jit_f = jax.jit(step, out_shardings=(rules, rep, rep))
    with mesh:
        s_f = jax.device_put(state, rules)
        s_f, loss_f, dm = jit_f(s_f, shard_batch(batch, mesh), key)
        loss_f = float(loss_f)
        # leaves really are distributed: some param shard is not on dev 0
        some = [x for x in jax.tree_util.tree_leaves(s_f.params)
                if hasattr(x, "sharding") and "data" in str(x.sharding.spec)]
        assert some, "no FSDP-sharded leaf in the updated state"
        p_f = jax.device_get(s_f.params["params"])

    assert abs(loss_f - loss_dp) <= 1e-5 * max(1.0, abs(loss_dp)), \
        (loss_f, loss_dp)
    flat_dp, flat_f = flatten_params(p_dp), flatten_params(p_f)
    assert flat_dp.keys() == flat_f.keys()
    for k in flat_dp:
        np.testing.assert_allclose(flat_f[k], flat_dp[k],
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    assert "grad_total_norm" in dm

    # hybrid: on a (data=4, model=2) mesh, FSDP composes with the TP rules —
    # big kernels carry BOTH axes; the step still matches pure DP
    mesh_h = make_mesh([4, 2], ("data", "model"))
    rules_h = fsdp_sharding_rules(mesh_h, state, min_size=64)
    both = [s for s in jax.tree_util.tree_leaves(rules_h)
            if "model" in str(s.spec) and "data" in str(s.spec)]
    assert both, "no leaf sharded on both mesh axes"
    rep_h = replicated(mesh_h)
    jit_h = jax.jit(step, out_shardings=(rules_h, rep_h, rep_h))
    with mesh_h:
        s_h = jax.device_put(state, rules_h)
        _, loss_h, _ = jit_h(s_h, shard_batch(batch, mesh_h), key)
    assert abs(float(loss_h) - loss_dp) <= 1e-5 * max(1.0, abs(loss_dp))


def test_partition_mode_tp_requires_model_axis(rng):
    """PARTITION_MODE=tp on a data-only mesh must raise, not silently run
    pure DP (review-pass finding)."""
    from vlbert_tpu.training.loop import fit

    cfg, m, batch = _tiny_vqa_setup(rng)
    cfg.TPU.PARTITION_MODE = "tp"
    state, tx, sched, base_lr = create_train_state(m, batch, cfg,
                                                   steps_per_epoch=2)
    with pytest.raises(ValueError, match="model.*mesh axis"):
        fit(m, cfg, "vqa", [batch], steps_per_epoch=1,
            state=state, tx=tx, sched=sched, base_lr=base_lr)


def test_model_parallel_train_step_matches_dp(rng):
    """A full TRAIN step (grads + clip + AdamW through TP-sharded params AND
    optimizer moments) on a 2-D (data=4, model=2) mesh matches the pure-DP
    step's loss and updated params (VERDICT r2: TP rules were forward-only
    tested). The same param_sharding_rules tree shards the TrainState —
    adam mu/nu paths mirror the param paths, scalars fall out replicated."""
    from vlbert_tpu.parallel.mesh import param_sharding_rules
    from vlbert_tpu.training.checkpoint import flatten_params

    assert jax.device_count() == 8
    cfg, m, batch = _tiny_vqa_setup(rng)
    # dropout off: bit-identical losses across mesh topologies
    cfg.NETWORK.VLBERT.hidden_dropout_prob = 0.0
    cfg.NETWORK.VLBERT.attention_probs_dropout_prob = 0.0
    m = build_module(cfg, "vqa", dtype=jnp.float32)
    state, tx, _, _lr = create_train_state(m, batch, cfg, steps_per_epoch=10)
    step = make_train_step(m, tx, "vqa", cfg, grad_accum=1)
    key = jax.random.PRNGKey(0)

    mesh_dp = make_mesh()
    rep = replicated(mesh_dp)
    jit_dp = jax.jit(step, out_shardings=(rep, rep, rep))
    with mesh_dp:
        s_dp, loss_dp, _ = jit_dp(state, shard_batch(batch, mesh_dp), key)
        loss_dp = float(loss_dp)
        p_dp = jax.device_get(s_dp.params["params"])

    mesh_tp = make_mesh([4, 2], ("data", "model"))
    rules = param_sharding_rules(mesh_tp, state)
    n_model = sum(
        1 for s in jax.tree_util.tree_leaves(rules)
        if "model" in str(s.spec))
    # params + mu + nu for the qkv/intermediate/output kernels
    assert n_model >= 3 * 3, n_model
    rep_tp = replicated(mesh_tp)
    jit_tp = jax.jit(step, out_shardings=(rules, rep_tp, rep_tp))
    with mesh_tp:
        s_tp = jax.device_put(state, rules)
        s_tp, loss_tp, dm = jit_tp(s_tp, shard_batch(batch, mesh_tp), key)
        loss_tp = float(loss_tp)
        p_tp = jax.device_get(s_tp.params["params"])

    assert abs(loss_tp - loss_dp) <= 1e-5 * max(1.0, abs(loss_dp)), \
        (loss_tp, loss_dp)
    flat_dp = flatten_params(p_dp)
    flat_tp = flatten_params(p_tp)
    assert flat_dp.keys() == flat_tp.keys()
    for k in flat_dp:
        np.testing.assert_allclose(flat_tp[k], flat_dp[k],
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    assert "grad_total_norm" in dm
