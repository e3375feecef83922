"""Benchmark: flagship throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "details"}
on EVERY path — each section is individually guarded, catches
RESOURCE_EXHAUSTED, and degrades (fewer staged inputs, then smaller batch)
before giving up; a failed section becomes an {"error": ...} entry in
"details" instead of a nonzero exit. Two further guards (both failure modes
observed live): a backend-liveness preflight with a hard deadline
(BENCH_BACKEND_TIMEOUT_S, default 900 s — the device tunnel can hang
forever inside jax backend init when the relay is down), and a global
watchdog (BENCH_DEADLINE_S, default 5400 s) that emits the JSON line with
whatever sections completed if the run wedges mid-measurement.

Headline value = forward images/sec/chip through the full ROIAlign +
VL-BERT path (ResNet-101 backbone, 14x14 ROIAlign, conv5 head, 12-layer
VL-BERT-base over [text|boxes|END]), bf16 compute, 608px, 36 boxes, 4x48
text. "details" carries train-step numbers and MFU.

Profiles (round-5 restructure — BENCH_r04 timed out under the driver, so
the DEFAULT run must provably fit the driver budget):
  * default: headline-first — fwd, train_b16, serve, train_step(B=4).
    Every section is time-boxed against a global budget (BENCH_DEADLINE_S,
    default 2100 s): a section whose cost estimate exceeds the remaining
    budget is SKIPPED with a recorded reason instead of risking the line.
    serve runs BEFORE any OOM-prone ladder so it is always measured
    in-process on a clean backend (the round-4 2x serve "regression" was
    an isolated-child / post-OOM artifact).
  * --full: adds accum4, large, vqa (+ speculative B=256 probe), vqa_l128,
    pretrain ladders; deadline default rises to 7200 s.
  * --quick: fwd + train_step(B=4) only.

Methodology:
  * inputs are staged as uint8 RGB — the framework's own wire format
    (ops/image_norm.py normalizes on device, fused into the first conv) —
    cutting staged-input HBM 4x vs float32 (BENCH_r02 died pre-staging
    ~2 GB of fp32 inputs);
  * throughput: varied pre-staged inputs (the device tunnel dedupes
    identical executions), chained runs of K1 and K2 dispatches each ending
    in a scalar VALUE fetch; per-call time = (t(K2)-t(K1))/(K2-K1). The
    slope cancels the ~30-50 ms tunnel round trip, and the value fetch is
    the only reliable completion barrier here (block_until_ready has been
    observed returning early on this device plugin, yielding impossible
    MFU > 1 readings);
  * MFU: XLA's own cost analysis (compiled.cost_analysis()["flops"]) over
    the measured wall time, against the chip's published bf16 peak.
    Any MFU > 1 reading is self-evidently a timing artifact and rejected.

vs_baseline (redefined in round 3, arithmetic in BASELINE.md): the
fraction of an IDEAL A100's throughput (312 TFLOP/s bf16 peak, MFU = 1.0)
on the IDENTICAL FLOP graph achieved by one v5e chip. Fully derived from
measured flops — no estimated reference throughput. Interpretation:
vs_baseline = 0.36 means an A100 implementation needs >= 36% MFU to match
one v5e chip, i.e. BASELINE.md's ">= 2x A100" acceptance holds against any
reference implementation running below vs_baseline/2 MFU on an A100.
The round-1/2 anchor (an unmeasured "120 img/s A100 estimate") is kept in
details["legacy_vs_estimated_a100"] for continuity only.
"""

import gc
import json
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# TPU v5e (v5 lite) published peak: 197 TFLOP/s bf16
V5E_PEAK_BF16 = 197e12
# NVIDIA A100 published peak: 312 TFLOP/s bf16 (dense) — used ONLY to
# compute the speed-of-light anchor from measured flops; see module doc
A100_PEAK_BF16 = 312e12
# round-1/2 continuity anchor (unmeasured estimate; legacy field only)
LEGACY_A100_EST_IMG_PER_S = 120.0


def _enable_compile_cache():
    import jax

    cache = os.path.expanduser("~/.cache/vlbert_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def jnp_zero():
    import jax.numpy as jnp

    return jnp.zeros((), jnp.float32)


def _is_oom(e) -> bool:
    return "RESOURCE_EXHAUSTED" in repr(e)


def _free(*trees):
    """Best-effort immediate release of device buffers."""
    import jax

    for t in trees:
        for leaf in jax.tree_util.tree_leaves(t):
            try:
                leaf.delete()
            except Exception:
                pass


def _post_oom_cleanup(exc):
    """Release everything a failed rung can still pin.

    The traceback's frames hold the rung's locals (multi-GB staged inputs,
    train states) and exception<->frame reference CYCLES keep them alive
    until a cyclic GC pass — which effectively never fires on its own,
    because device arrays look tiny to the Python allocator. This leak
    cascaded in the 2026-08-19 full run: the vqa B=256 OOM pinned ~GBs, so
    every later rung AND the pretrain/serve sections OOM'd too.
    """
    try:
        traceback.clear_frames(exc.__traceback__)
    except Exception:
        pass
    exc.__traceback__ = None
    gc.collect()
    try:
        import jax

        jax.clear_caches()   # drop compiled programs of the failed shape
    except Exception:
        pass
    gc.collect()


# One RESOURCE_EXHAUSTED permanently poisons this TPU plugin's backend for
# the rest of the PROCESS: after any OOM, every subsequent device op — even
# a 512x512 elementwise add after gc.collect()+jax.clear_caches() — fails
# with RESOURCE_EXHAUSTED, while a fresh process sees a healthy chip
# (probed directly 2026-08-19: /tmp/poison_probe2.py; this is why the
# 09:37 and 14:4x full runs lost vqa/pretrain/serve after one legitimate
# vqa B=256 OOM despite live_arrays()==0). The degradation ladder's core
# assumption — OOM is recoverable in-process — is therefore false here:
# once poisoned, every remaining rung runs in an isolated child process.
_POISONED = {"flag": False}


def _run_rung_isolated(fn_name, kw, name, timeout=None):
    """Run one ladder rung in a fresh python process (fresh backend).

    The child re-executes bench.py with --rung; it prints exactly one JSON
    line: {"ok": result} | {"oom": true, "error": ...} | {"error": ...}.
    Returns that dict; subprocess-level failures map to {"error": ...}.
    """
    import subprocess

    timeout = timeout or float(os.environ.get("BENCH_RUNG_TIMEOUT_S", "900"))
    cmd = [sys.executable, os.path.abspath(__file__),
           "--rung", fn_name, "--kw", json.dumps(kw)]
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"error": f"{name}: isolated rung timed out after "
                         f"{timeout:g}s at {kw}"}
    for ln in reversed(p.stdout.strip().splitlines() or [""]):
        if ln.startswith("{"):
            try:
                return json.loads(ln)
            except ValueError:
                break
    return {"error": f"{name}: isolated rung rc={p.returncode}, "
                     f"no JSON; stderr tail: {p.stderr[-400:]}"}


def _with_degrade(fn, attempts, name):
    """Run fn(**kw) down a degradation ladder on RESOURCE_EXHAUSTED.

    attempts: list of kwargs dicts, most capable first. Returns the first
    successful result (annotated with "degraded" if not attempt 0), or an
    {"error": ...} dict if every rung OOMs. Non-OOM errors also degrade to
    an error dict — the bench must always emit its JSON line.

    Once any rung OOMs, this process's backend is poisoned (see _POISONED)
    and every later attempt — in this section and all later sections — runs
    via _run_rung_isolated in a fresh process. Only registered bench
    section functions can be isolated; test doubles keep the in-process
    path.

    An attempt marked ``_speculative=True`` is one the ladder EXPECTS may
    OOM (e.g. the vqa B=256 headroom probe above the known-good B=128).
    Because an in-process OOM poisons the backend for every later section,
    speculative rungs run isolated FROM THE START: a child OOM (or any
    child failure — the rung is opportunism, not coverage) just falls
    through to the next attempt and the main process stays clean.
    """
    last = None
    isolatable = _RUNG_FNS.get(getattr(fn, "__name__", "")) is fn
    for i, kw in enumerate(attempts):
        kw = dict(kw)
        speculative = bool(kw.pop("_speculative", False))
        if speculative and isolatable and not _POISONED["flag"]:
            # bound the child's cost: a probe that cannot finish inside
            # this budget is not a usable rung anyway
            r = _run_rung_isolated(
                fn.__name__, kw, name,
                timeout=float(os.environ.get("BENCH_SPEC_TIMEOUT_S", "600")))
            if "ok" in r:
                out = r["ok"]
                out["isolated"] = True
                if i > 0:
                    out["degraded"] = {"attempt": i, **kw}
                return out
            last = r.get("error", "")[:500]
            print(f"bench: {name} speculative rung failed in isolation at "
                  f"{kw} ({'OOM' if r.get('oom') else 'error'}), degrading",
                  file=sys.stderr)
            continue
        if _POISONED["flag"] and isolatable:
            r = _run_rung_isolated(fn.__name__, kw, name)
            if "ok" in r:
                out = r["ok"]
                out["isolated"] = True
                if i > 0:
                    out["degraded"] = {"attempt": i, **kw}
                return out
            last = r.get("error", "")[:500]
            if not r.get("oom"):
                return {"error": f"{name}: {last}"}
            print(f"bench: {name} OOM (isolated) at {kw}, degrading",
                  file=sys.stderr)
            continue
        try:
            r = fn(**kw)
            if i > 0:
                r["degraded"] = {"attempt": i, **kw}
            return r
        except Exception as e:  # noqa: BLE001 — bench must never crash
            last = repr(e)[:500]
            oom = _is_oom(e)
            _post_oom_cleanup(e)
            del e
            if not oom:
                return {"error": f"{name}: {last}"}
            if isolatable and not _POISONED["flag"]:
                _POISONED["flag"] = True
                print(f"bench: {name} OOM at {kw} — backend poisoned; "
                      "all remaining rungs run in isolated processes",
                      file=sys.stderr)
            else:
                print(f"bench: {name} OOM at {kw}, degrading",
                      file=sys.stderr)
    return {"error": f"{name}: RESOURCE_EXHAUSTED at all degradation "
                     f"levels; last: {last}"}


def _flops_of(jitted, *args):
    """XLA's analytical flop count for one execution, or None."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _slope_time(run_k, k1=6, k2=18):
    """Per-call seconds via the slope of chained runs.

    run_k(k, base) must execute k dispatches using inputs[base:base+k] and
    END WITH A SCALAR VALUE FETCH (the completion barrier), returning its
    wall time. The slope (t2 - t1) / (k2 - k1) cancels the tunnel round
    trip and any fixed dispatch overhead.
    """
    # DISJOINT input ranges per run: re-running base=0 would re-issue
    # byte-identical executions, which the device tunnel can dedupe —
    # exactly the artifact this timing scheme exists to avoid
    run_k(2, 0)                      # warm
    t1 = run_k(k1, 2)
    t2 = run_k(k2, 2 + k1)
    return (t2 - t1) / (k2 - k1)


def _staged_images(base_np, n):
    """n distinct uint8 image batches on device (~1 MB/img at 608px vs 4 MB
    fp32 — the staging that OOM'd BENCH_r02). Blocks until every transfer
    lands: an in-flight host->device copy inside the timed slope windows
    would scale with k and NOT cancel in (t2-t1)/(k2-k1)."""
    import jax
    import numpy as np

    imgs = []
    try:
        if base_np.dtype == np.uint8:
            base16 = base_np.astype(np.int16)
            for i in range(n):
                imgs.append(jax.device_put(
                    ((base16 + i) % 256).astype(np.uint8)))
        else:
            # float wire leaves (e.g. precomputed ROI features): a RELATIVE
            # perturbation defeats dispatch dedupe without changing the
            # compute shape. (An additive 1e-3 is below float32 ulp for
            # values >~8k and would silently stage identical tensors —
            # ADVICE r3.)
            for i in range(n):
                imgs.append(jax.device_put(
                    (base_np * (1.0 + np.float32(i) * 1e-4)
                     + np.float32(i) * 1e-3).astype(base_np.dtype)))
        jax.block_until_ready(imgs)
    except BaseException:
        # a mid-loop OOM must not leak the partial multi-GB staging list
        # into the traceback (it pins HBM for every later rung/section)
        _free(imgs)
        raise
    return imgs


def _apply_product_rng(cfg, rng_impl=None):
    """Apply the trainer's process-wide PRNG choice (engine/train.py:195)
    so the bench measures the shipped default (TPU.RNG_IMPL='rbg'), not
    threefry. BENCH_r03's train_step_vqa 0.256 MFU was partly this: the
    bench ran threefry dropout masks the real trainer never uses."""
    import jax

    impl = rng_impl or cfg.TPU.get("RNG_IMPL")
    if impl:
        jax.config.update("jax_default_prng_impl", impl)


def fwd_bench(B=16, IMG=608, O=36, C=4, T=48, k1=6, k2=18):
    import jax
    import numpy as np

    from __graft_entry__ import _flagship, _vcr_batch

    cfg, model = _flagship(tiny=False)
    batch = _vcr_batch(B=B, img=IMG, O=O, C=C, T=T, img_dtype="uint8")
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}
    params = jax.jit(lambda r: model.init(r, *batch, train=True))(init_rngs)

    fwd = jax.jit(lambda p, *a: model.apply(p, *a, train=False))
    args = batch[:-1]
    jax.block_until_ready(fwd(params, *args)["label_logits"])  # compile
    flops = _flops_of(fwd, params, *args)

    images = _staged_images(np.asarray(args[0]), 2 + k1 + k2)

    acc = jax.jit(lambda c, o: c + o.sum())

    def run_k(k, base):
        # dataflow-chain every output into one scalar so the terminal value
        # fetch provably waits for ALL k executions
        carry = jnp_zero()
        t0 = time.time()
        for j in range(k):
            out = fwd(params, images[base + j], *args[1:])["label_logits"]
            carry = acc(carry, out)
        float(carry)                 # value fetch = completion barrier
        return time.time() - t0

    try:
        dt = _slope_time(run_k, k1=k1, k2=k2)
    finally:
        _free(images, params, args)
    if flops and flops / dt / V5E_PEAK_BF16 > 1.0:
        raise RuntimeError(
            f"impossible MFU {flops / dt / V5E_PEAK_BF16:.2f} > 1 — timing "
            "artifact (early barrier / dedupe); rejecting the reading")
    return {
        "img_per_s": round(B / dt, 2),
        "ms_per_batch": round(dt * 1e3, 3),
        "batch": B,
        "mfu": round(flops / dt / V5E_PEAK_BF16, 4) if flops else None,
        "tflops_per_batch": round(flops / 1e12, 2) if flops else None,
        "flops_per_img": flops / B if flops else None,
    }


def _measure_step_slope(step, jit_step, state, sb, k1, k2, vary_idx=0):
    """Shared train/pretrain step measurement protocol. Must run inside
    `with mesh`, with `state` already device_put and `sb` sharded.

    Stages varied copies of the ``vary_idx`` batch leaf (the uint8 image
    for e2e workloads; the float feature tensor for precomputed ones),
    warms + stabilizes the donated-state jit signature, slope-times chained
    steps (each run ends in a loss VALUE fetch — the completion barrier),
    and dedupe-checks the loss trace. Returns (dt_per_step_s, flops);
    frees the staged inputs and the chained state on every path.
    """
    import jax
    import numpy as np

    n_stage = 3 + 2 + k1 + k2        # 3 warm/stabilize + slope inputs
    imgs = _staged_images(np.asarray(sb[vary_idx]), n_stage)

    def mk(i):
        return sb[:vary_idx] + (imgs[i],) + sb[vary_idx + 1:]

    s = state
    try:
        rng = jax.random.PRNGKey(0)
        s, l, _ = jit_step(s, mk(0), rng)
        float(l)
        flops = None
        try:
            flops = _flops_of(jax.jit(step), s, mk(0), rng)
        except Exception:
            pass
        for i in range(1, 3):        # stabilize donated-state signature
            s, l, _ = jit_step(s, mk(i), jax.random.PRNGKey(i))
        float(l)
        lvs = []

        def run_k(k, base, _n=[3]):
            nonlocal s
            t0 = time.time()
            for j in range(k):
                _n[0] += 1
                s, l, _ = jit_step(s, mk(3 + base + j),
                                   jax.random.PRNGKey(_n[0]))
            lvs.append(float(l))     # value fetch = completion barrier;
            return time.time() - t0  # steps chain via the donated state

        dt = _slope_time(run_k, k1=k1, k2=k2)
        assert len(set(lvs)) == len(lvs), f"dedupe artifact: {lvs}"
        return dt, flops
    finally:
        _free(imgs, s)


def train_bench(B=4, accum=1, large=False, IMG=608, O=36, C=4, T=48,
                k1=6, k2=18):
    """Full e2e train-step throughput (fwd + bwd + AdamW [+ scan accum])."""
    import jax
    import numpy as np

    from __graft_entry__ import _flagship, _vcr_batch
    from vlbert_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from vlbert_tpu.training.loop import create_train_state, make_train_step

    cfg, model = _flagship(tiny=False)
    _apply_product_rng(cfg)
    if large:
        v = cfg.NETWORK.VLBERT
        v.hidden_size = 1024
        v.visual_size = 1024
        v.num_hidden_layers = 24
        v.num_attention_heads = 16
        v.intermediate_size = 4096
        cfg.NETWORK.IMAGE_FINAL_DIM = 1024
        from vlbert_tpu.models.task_modules import build_module
        import jax.numpy as jnp

        model = build_module(cfg, "vcr", dtype=jnp.bfloat16)
    cfg.TRAIN.OPTIMIZER = "AdamW"
    cfg.TRAIN.GRAD_ACCUMULATE_STEPS = accum
    batch = _vcr_batch(B=B * accum, img=IMG, O=O, C=C, T=T,
                       img_dtype="uint8")
    if accum > 1:
        batch = jax.tree_util.tree_map(
            lambda x: np.asarray(x).reshape(accum, B, *x.shape[1:]), batch)
    mesh = make_mesh()
    init_batch = batch if accum == 1 else jax.tree_util.tree_map(
        lambda x: x[0], batch)
    state, tx, _, _lr = create_train_state(model, init_batch, cfg,
                                      steps_per_epoch=100)
    step = make_train_step(model, tx, "vcr", cfg, grad_accum=accum)
    rep = replicated(mesh)
    jit_step = jax.jit(step, donate_argnums=(0,),
                       out_shardings=(rep, rep, rep))
    sb = None
    try:
        with mesh:
            state = jax.device_put(state, rep)
            sb = shard_batch(batch, mesh, batch_dim=0 if accum == 1 else 1)
            dt, flops = _measure_step_slope(step, jit_step, state, sb, k1, k2)
    finally:
        # free each independently: an OOM before `sb` exists must not
        # leave `state` pinned (the NameError used to abort both)
        _free(sb)
        _free(state)
    if flops and flops * accum / dt / V5E_PEAK_BF16 > 1.0:
        raise RuntimeError(
            f"impossible MFU {flops * accum / dt / V5E_PEAK_BF16:.2f} > 1 — "
            "timing artifact; rejecting the reading")
    eff_b = B * accum
    # XLA's cost analysis counts a lax.scan body ONCE (measured: identical
    # flops reported for accum=1 and accum=4); scale by trip count
    if flops:
        flops *= accum
    return {
        "img_per_s": round(eff_b / dt, 2),
        "ms_per_step": round(dt * 1e3, 3),
        "batch": B,
        "accum": accum,
        "mfu": round(flops / dt / V5E_PEAK_BF16, 4) if flops else None,
        "tflops_per_step": round(flops / 1e12, 2) if flops else None,
    }


def vqa_train_bench(B=64, O=100, T=64, F=2048, n_ans=3129, k1=4, k2=12,
                    dropout=None, rng_impl=None):
    """VQA 2.0 fine-tune step with precomputed ROI features (BASELINE.json
    tracked config #2; ref cfgs/vqa/base_4x16G_fp32.yaml, frozen Fast R-CNN
    backbone). Transformer-only: no conv fwd/bwd, so per-chip batch can be
    much larger than the e2e VCR workload.

    ``dropout``/``rng_impl`` are A/B levers for profiling (tools/
    profile_step.py): dropout=0.0 removes the threefry mask generation from
    the step; rng_impl='rbg' swaps the PRNG for the fast TPU generator."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from vlbert_tpu.training.loop import create_train_state, make_train_step
    from vlbert_tpu.utils.config import default_config

    cfg = default_config("vqa")
    _apply_product_rng(cfg, rng_impl)
    cfg.MODULE = "ResNetVLBERT"
    v = cfg.NETWORK.VLBERT
    if dropout is not None:
        v.hidden_dropout_prob = float(dropout)
        v.attention_probs_dropout_prob = float(dropout)
        cfg.NETWORK.CLASSIFIER_DROPOUT = float(dropout)
    v.hidden_size = 768; v.visual_size = 768; v.num_hidden_layers = 12
    v.num_attention_heads = 12; v.intermediate_size = 3072
    v.visual_ln = True
    v.visual_scale_text_init = 1.0; v.visual_scale_object_init = 1.0
    cfg.NETWORK.IMAGE_FINAL_DIM = 768
    cfg.NETWORK.IMAGE_FEAT_PRECOMPUTED = True
    cfg.DATASET.ANSWER_VOCAB_SIZE = n_ans
    cfg.TRAIN.OPTIMIZER = "AdamW"
    model = build_module(cfg, "vqa", dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    boxes = np.full((B, O, 4 + F), -2.0, np.float32)
    boxes[..., 0] = rng.uniform(0, 400, (B, O))
    boxes[..., 1] = rng.uniform(0, 300, (B, O))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(16, 200, (B, O))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(16, 200, (B, O))
    boxes[..., 4:] = rng.normal(size=(B, O, F)).astype(np.float32)
    ids = np.asarray(rng.integers(10, 20000, (B, T)), np.int32)
    tmask = np.broadcast_to(np.arange(T)[None] < 16, (B, T)).copy()
    label = (rng.uniform(size=(B, n_ans)) > 0.995).astype(np.float32)
    batch = (None, boxes, np.ones((B, O), bool),
             np.asarray([[640, 480, 1, 1]] * B, np.float32),
             ids, np.zeros((B, T), np.int32), tmask,
             np.full((B,), 14, np.int32), label)

    mesh = make_mesh()
    state, tx, _, _lr = create_train_state(model, batch, cfg,
                                           steps_per_epoch=100)
    step = make_train_step(model, tx, "vqa", cfg, grad_accum=1)
    rep = replicated(mesh)
    jit_step = jax.jit(step, donate_argnums=(0,),
                       out_shardings=(rep, rep, rep))
    sb = None
    try:
        with mesh:
            state = jax.device_put(state, rep)
            sb = shard_batch(batch, mesh)
            # image leaf is None (precomputed): vary the feature tensor
            dt, flops = _measure_step_slope(step, jit_step, state, sb,
                                            k1, k2, vary_idx=1)
    finally:
        _free(sb)
        _free(state)
    if flops and flops / dt / V5E_PEAK_BF16 > 1.0:
        raise RuntimeError(
            f"impossible MFU {flops / dt / V5E_PEAK_BF16:.2f} > 1 — timing "
            "artifact; rejecting the reading")
    return {
        "samples_per_s": round(B / dt, 2),
        "ms_per_step": round(dt * 1e3, 3),
        "batch": B,
        "text_bucket": T,
        "mfu": round(flops / dt / V5E_PEAK_BF16, 4) if flops else None,
        "tflops_per_step": round(flops / 1e12, 2) if flops else None,
    }


def _pretrain_batch(B, aux_B, IMG=608, O=36, T=64, n_classes=1601, seed=0):
    """Synthetic CC+corpus multitask pretraining batch (e2e raw-pixel path):
    image/boxes/MLM/MVRC stream + text-only aux stream, the shapes the
    pretrain collator pads to (ref pretrain/data/collators/*.py)."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(seed)
    image = jnp.asarray(rng.integers(0, 256, (B, IMG, IMG, 3)), jnp.uint8)
    boxes = np.zeros((B, O, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, IMG // 2, (B, O))
    boxes[..., 1] = rng.uniform(0, IMG // 2, (B, O))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(16, IMG // 2, (B, O))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(16, IMG // 2, (B, O))
    im_info = jnp.asarray([[IMG, IMG, 1, 1]] * B, jnp.float32)
    text = np.zeros((B, T), np.int32)
    text[:, : T - 6] = rng.integers(5, 30000, (B, T - 6))   # 0 = pad
    rel = jnp.zeros((B,), jnp.int32)
    mlm = np.full((B, T), -1, np.int32)
    picks = rng.uniform(size=(B, T)) < 0.15
    mlm[picks] = rng.integers(5, 30000, int(picks.sum()))
    mvrc_ops = jnp.asarray(rng.uniform(size=(B, O)) < 0.15, jnp.int32)
    mvrc_labels = np.zeros((B, O, n_classes), np.float32)
    mvrc_labels[np.arange(B)[:, None], np.arange(O)[None],
                rng.integers(0, n_classes, (B, O))] = 1.0
    aux_text = np.zeros((aux_B, T), np.int32)
    aux_text[:, : T - 2] = rng.integers(5, 30000, (aux_B, T - 2))
    aux_mlm = np.full((aux_B, T), -1, np.int32)
    apicks = rng.uniform(size=(aux_B, T)) < 0.15
    aux_mlm[apicks] = rng.integers(5, 30000, int(apicks.sum()))
    return (image, jnp.asarray(boxes), im_info, jnp.asarray(text), rel,
            jnp.asarray(mlm), mvrc_ops, jnp.asarray(mvrc_labels),
            jnp.asarray(aux_text), jnp.asarray(aux_mlm))


def pretrain_bench(B=8, aux_B=8, IMG=608, O=36, T=64, k1=3, k2=9):
    """Full e2e multitask PRETRAIN step: ResNet-101 raw-pixel masking +
    VL-BERT-base MLM+MVRC heads + text-only aux stream + AdamW (the
    reference's cfgs/pretrain/base_e2e_16x16G_fp16.yaml workload, per-GPU
    batch 8 images + 8 aux texts)."""
    import jax

    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from vlbert_tpu.training.loop import create_train_state, make_train_step
    from vlbert_tpu.utils.config import load_config

    cfg = load_config("pretrain", os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "cfgs/pretrain/base_e2e_16x16G_fp16.yaml"))
    cfg.TRAIN.FP16 = False           # bf16 compute (TPU default), no scaling
    _apply_product_rng(cfg)
    import jax.numpy as jnp

    model = build_module(cfg, "pretrain", dtype=jnp.bfloat16)
    batch = _pretrain_batch(B=B, aux_B=aux_B, IMG=IMG, O=O, T=T)
    mesh = make_mesh()
    state, tx, _, _lr = create_train_state(model, batch, cfg,
                                           steps_per_epoch=100)
    step = make_train_step(model, tx, "pretrain", cfg, grad_accum=1)
    rep = replicated(mesh)
    jit_step = jax.jit(step, donate_argnums=(0,),
                       out_shardings=(rep, rep, rep))
    sb = None
    try:
        with mesh:
            state = jax.device_put(state, rep)
            sb = shard_batch(batch, mesh)
            dt, flops = _measure_step_slope(step, jit_step, state, sb, k1, k2)
    finally:
        _free(sb)
        _free(state)
        _free(batch)   # _pretrain_batch stages jnp leaves on device
    if flops and flops / dt / V5E_PEAK_BF16 > 1.0:
        raise RuntimeError(
            f"impossible MFU {flops / dt / V5E_PEAK_BF16:.2f} > 1 — "
            "timing artifact; rejecting the reading")
    return {
        "img_per_s": round(B / dt, 2),
        "samples_per_s": round((B + aux_B) / dt, 2),
        "ms_per_step": round(dt * 1e3, 3),
        "batch_images": B,
        "batch_aux_texts": aux_B,
        "mfu": round(flops / dt / V5E_PEAK_BF16, 4) if flops else None,
        "tflops_per_step": round(flops / 1e12, 2) if flops else None,
    }


def _backend_alive(timeout_s, _probe=None):
    """Device-backend liveness with a hard deadline.

    The device tunnel can hang INSIDE backend init (observed live: relay
    outage -> jax.devices() blocks forever at load ~0, which would leave the
    driver-captured bench with no JSON line at all). Probe from a daemon
    thread and give up after timeout_s. Returns (device_str, error_msg) —
    a probe that RAISES is reported as its exception, not as a timeout, so
    a plugin/version failure isn't chased as a relay outage.
    """
    def probe():
        import jax
        import jax.numpy as jnp

        d = jax.devices()
        x = jnp.ones((128, 128), jnp.bfloat16)
        float((x @ x).sum())
        return str(d[0])

    got, err = [], []

    def run():
        try:
            got.append((_probe or probe)())
        except BaseException as e:  # noqa: BLE001 — reported in the JSON
            err.append(repr(e)[:500])

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if got:
        return got[0], None
    if err:
        return None, f"backend probe raised: {err[0]}"
    return None, (f"device backend unreachable within {timeout_s:g}s "
                  "(tunnel/relay hang during init)")


_METRIC_FMT = ("img/s/chip e2e fwd (ResNet101+ROIAlign+VLBERT-base 608px "
               "B={b}); train/vqa/pretrain/serve in details")
_EMITTED = threading.Lock()  # exactly-one-JSON-line guard (watchdog races)
_EMIT_DONE = threading.Event()  # set after the line is flushed

# keys kept on the emitted line, per section; everything else (tflops,
# flops_per_img, notes, nested device_compute dicts) lives in the sidecar.
# BENCH_r03 died of verbosity: the line was ~2.9 KB and the driver keeps a
# 2000-char tail, so "parsed" was null. The line must stay < 1500 bytes.
_LINE_KEYS = ("img_per_s", "samples_per_s", "ms_per_batch", "ms_per_step",
              "batch", "batch_images", "accum", "mfu")
_SIDECAR = os.environ.get(
    "BENCH_SIDECAR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "results", "bench_full.json"))


def _compact_section(name, sec):
    """Numbers-only view of one details section for the emitted line."""
    if not isinstance(sec, dict):
        return sec
    out = {k: sec[k] for k in _LINE_KEYS if sec.get(k) is not None}
    if name == "serve_latency":
        for k in ("p50_ms", "p90_ms", "p99_ms"):
            if isinstance(sec.get(k), (int, float)):
                out[k] = round(sec[k], 2)
        dc = sec.get("device_compute") or {}
        if dc.get("device_ms_per_query") is not None:
            out["dev_ms"] = dc["device_ms_per_query"]
        i8 = sec.get("int8") or {}
        dc8 = i8.get("device_compute") or {}
        if dc8.get("device_ms_per_query") is not None:
            out["int8_dev_ms"] = dc8["device_ms_per_query"]
        if i8.get("device_speedup") is not None:
            out["int8_speedup"] = i8["device_speedup"]
    if "error" in sec:
        out["error"] = str(sec["error"])[:120]
    if "skipped" in sec:
        out["skipped"] = str(sec["skipped"])[:120]
    if "regression_warn" in sec:
        out["regression_warn"] = str(sec["regression_warn"])[:120]
    if "degraded" in sec:
        out["degraded"] = True
    return out


def _write_sidecar(full):
    """Always-written full artifact (prose + every measured number)."""
    try:
        os.makedirs(os.path.dirname(_SIDECAR), exist_ok=True)
        with open(_SIDECAR, "w") as f:
            json.dump(full, f, indent=1)
        return os.path.relpath(_SIDECAR,
                               os.path.dirname(os.path.abspath(__file__)))
    except Exception as e:  # noqa: BLE001 — sidecar loss must not cost the line
        print(f"bench: sidecar write failed: {e!r}", file=sys.stderr)
        return None


def _emit(details, error=None):
    """Compute the headline from whatever sections completed and print the
    one JSON line. Safe to call from the watchdog thread mid-run.

    The line is kept compact (< 1500 bytes; the driver records only a
    2000-char tail): per-section numbers only. The FULL details — prose
    methodology, vs_baseline interpretation, tflops, serve percentile
    nesting — are written to results/bench_full.json on every path and the
    methodology is echoed to stderr.

    ``error`` is applied only by the WINNER of the exactly-once race, so a
    watchdog that fires just as a completed run emits can't stamp a bogus
    deadline error onto a good line. The loser (main thread or watchdog)
    BLOCKS until the winner's line is flushed — returning early would let
    interpreter teardown (sys.exit after main) or os._exit (watchdog) kill
    the winner mid-print, ending the process with zero JSON lines.
    """
    if not _EMITTED.acquire(blocking=False):
        _EMIT_DONE.wait(60)
        return
    if error is not None:
        details["error"] = error
    fwd = details.get("fwd", {})
    value = fwd.get("img_per_s")
    unit = "img/s"
    if value is None:               # forward failed entirely: fall back to
        ts = details.get("train_step", {})  # the train number, then to 0
        value = ts.get("img_per_s", 0.0)
        unit = "img/s (train-step fallback; fwd failed)" if value else "img/s"

    vs_sol = None
    if fwd.get("flops_per_img") and fwd.get("img_per_s"):
        a100_sol = A100_PEAK_BF16 / fwd["flops_per_img"]
        vs_sol = round(fwd["img_per_s"] / a100_sol, 4)
        details["a100_speed_of_light_img_per_s"] = round(a100_sol, 1)
        details["vs_baseline_meaning"] = (
            "fraction of a perfect (MFU=1.0) A100 on the same FLOP graph "
            "achieved by ONE v5e chip; an A100 implementation must exceed "
            f"{vs_sol:.2f} MFU to match this chip (x2 that for BASELINE.md's "
            ">=2x acceptance); eager-mode torch conv+transformer training "
            "does not reach such MFU, but it is unmeasured here, so no "
            "numeric multiplier is claimed")
    if fwd.get("img_per_s"):
        details["legacy_vs_estimated_a100"] = round(
            fwd["img_per_s"] / LEGACY_A100_EST_IMG_PER_S, 3)

    metric = _METRIC_FMT.format(b=fwd.get("batch", 16))
    head = {"metric": metric, "value": value, "unit": unit,
            "vs_baseline": vs_sol if vs_sol is not None else 0.0}

    # the watchdog thread can call this while the main thread is still
    # inserting sections into `details`; a mid-resize dumps/copy raises,
    # which must never cost us the line — retry, then degrade
    line = None
    for _ in range(3):
        try:
            snap = {k: details[k] for k in list(details)}
            sidecar_rel = _write_sidecar({**head, "details": snap})
            compact = {}
            for k, v in snap.items():
                if k in ("methodology", "vs_baseline_meaning",
                         "legacy_vs_estimated_a100", "section_wall_s"):
                    continue        # prose / legacy / telemetry: sidecar only
                if k == "error":
                    compact[k] = str(v)[:200]
                elif isinstance(v, dict):
                    compact[k] = _compact_section(k, v)
                else:
                    compact[k] = v
            if sidecar_rel:
                compact["full"] = sidecar_rel
            line = json.dumps({**head, "details": compact},
                              separators=(",", ":"))
            break
        except RuntimeError:
            continue
    if line is None:
        line = json.dumps({**head,
                           "details": {"error": "emit raced a section "
                                       "update; partial details dropped"}},
                          separators=(",", ":"))
    if details.get("methodology"):
        print("bench methodology: " + details["methodology"],
              file=sys.stderr)
    print(line)
    sys.stdout.flush()
    _EMIT_DONE.set()


def serve_bench(n_queries=40, max_text=64, max_boxes=108):
    """Single-query VQA serving latency (p50/p90/p99) at base size over the
    precomputed-feature path — BASELINE.json's 'p50 VQA query latency
    tracked' headline item. Latency is timed through a full logits
    device_get (what a real serving call pays; also the only reliable
    barrier on this tunneled plugin)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlbert_tpu.engine.serve import VQAServer
    from vlbert_tpu.models.task_modules import build_module
    from vlbert_tpu.utils.config import load_config

    cfg = load_config("vqa", os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "cfgs/vqa/base_4x16G_fp32.yaml"))
    model = build_module(cfg, "vqa", dtype=jnp.bfloat16)

    class _Tok:  # synthetic tokenizer: serving latency is device-dominated
        cls_id, sep_id, mask_id = 2, 3, 4

        def tokenize(self, text):
            return text.split()

        def convert_tokens_to_ids(self, toks):
            return [(hash(t) % 20000) + 10 for t in toks]

    n_ans = int(cfg.DATASET.ANSWER_VOCAB_SIZE)
    srv = VQAServer(model, None, _Tok(), [str(i) for i in range(n_ans)],
                    max_text=max_text, max_boxes=max_boxes, feat_dim=2048)
    rng = np.random.default_rng(0)
    q0 = srv.preprocess("warm up query words", rng.uniform(0, 600, (36, 4)),
                        rng.normal(size=(36, 2048)).astype(np.float32),
                        800, 600)
    init_rngs = {"params": jax.random.PRNGKey(0)}
    params = jax.jit(lambda r: model.init(r, *q0, train=False))(init_rngs)
    srv.params = params
    queries = [(f"what color is object {i} in the photo",
                rng.uniform(0, 600, (36, 4)),
                rng.normal(size=(36, 2048)).astype(np.float32), 800, 600)
               for i in range(n_queries)]
    try:
        r = srv.measure_latency(queries, warmup=5, fetch=True)
        slope_q = queries[:12]
        r["device_compute"] = srv.measure_device_compute(slope_q)
        # Weight-only int8 path (ops/quant.py): kernels live in HBM as
        # per-channel int8 and dequantize inside the jitted program. Batch-1
        # is weight-bandwidth bound, so this is the serving speed lever; the
        # gain shows in the RTT-cancelled device-compute slope (p50 through
        # a fetch is dominated by the test rig's ~35 ms tunnel RTT).
        try:
            srv8 = VQAServer(model, params, _Tok(),
                             srv.answer_vocab, max_text=max_text,
                             max_boxes=max_boxes, feat_dim=2048,
                             quantize="int8")
            r8 = srv8.measure_latency(queries, warmup=5, fetch=True)
            d8 = srv8.measure_device_compute(slope_q)
            r["int8"] = {**r8, "device_compute": d8, "device_speedup": round(
                r["device_compute"]["device_ms_per_query"]
                / max(d8["device_ms_per_query"], 1e-9), 3)}
            _free(srv8.params)
        except Exception as e:  # int8 failure must not void the bf16 number
            r["int8"] = {"error": f"{type(e).__name__}: {e}"}
    finally:
        _free(params)
    r["note"] = "batch-1, base VQA, precomputed features, incl host RTT"
    return r


# sections that --rung child processes may execute by name (the isolation
# path after a poisoning OOM; see _with_degrade)
_RUNG_FNS = {
    "fwd_bench": fwd_bench,
    "train_bench": train_bench,
    "vqa_train_bench": vqa_train_bench,
    "pretrain_bench": pretrain_bench,
    "serve_bench": serve_bench,
}


def _rung_child(fn_name, kw_json):
    """--rung mode: run ONE ladder rung in this (fresh) process and print
    exactly one JSON result line for the parent. Always exits 0 — the
    parent distinguishes OOM / error / ok from the payload."""
    _enable_compile_cache()
    try:
        kw = json.loads(kw_json)
        r = _RUNG_FNS[fn_name](**kw)
        out = {"ok": r}
    except Exception as e:  # noqa: BLE001 — the parent needs a verdict
        out = {"oom": True, "error": repr(e)[:500]} if _is_oom(e) \
            else {"error": f"{fn_name}: {repr(e)[:500]}"}
    print(json.dumps(out), flush=True)
    return 0


def main(argv=None):
    global _EMITTED, _EMIT_DONE
    _POISONED["flag"] = False
    _EMITTED = threading.Lock()     # fresh exactly-once guard per run
    _EMIT_DONE = threading.Event()
    argv = sys.argv[1:] if argv is None else argv
    _enable_compile_cache()
    details = {"methodology": (
        "uint8-staged inputs (the framework's wire format; on-device fused "
        "normalize) — 4x less staging HBM than the fp32 staging that OOM'd "
        "BENCH_r02; slope timing: chained runs of K1/K2 varied-input "
        "dispatches, each ending in a dataflow-forced scalar VALUE fetch; "
        "per-call = (t2-t1)/(K2-K1), cancelling tunnel RTT "
        "(block_until_ready can return early on this plugin -> impossible "
        "MFU>1 readings, rejected); MFU = XLA cost_analysis flops / wall / "
        "197e12 (v5e bf16 peak); every section catches RESOURCE_EXHAUSTED "
        "and degrades (fewer staged inputs, smaller B) before erroring — "
        "and because one OOM poisons this plugin's backend for the whole "
        "process (probed: even a tiny elementwise op fails afterwards), "
        "every rung after the first OOM runs in a fresh isolated process; "
        "vs_baseline = fraction of an IDEAL (MFU=1.0) A100's 312-TFLOP/s "
        "throughput on the identical measured FLOP graph — fully derived, "
        "no estimated anchor (see BASELINE.md)")}

    # ---- liveness + deadline guards: the JSON line must appear even if the
    # device tunnel hangs inside backend init or mid-section (both observed)
    probe = None
    if "--selftest-hang" in argv:
        probe = lambda: time.sleep(1e9)  # noqa: E731
    elif "--selftest-wedge" in argv:
        # the wedge selftest exercises the WATCHDOG, not the probe (the
        # probe timeout path has its own selftest above). The real probe
        # initializes the device plugin, which on this environment loads
        # the tunneled TPU platform even under JAX_PLATFORMS=cpu and can
        # take arbitrarily long when the relay is slow — that made the
        # round-3 selftest flake with zero headroom vs the harness timeout.
        probe = lambda: "selftest(fast-probe)"  # noqa: E731
    backend_t = float(os.environ.get("BENCH_BACKEND_TIMEOUT_S", "900"))
    dev, dev_err = _backend_alive(backend_t, _probe=probe)
    if dev is None:
        _emit(details, error=f"{dev_err} — no measurements")
        _EMIT_DONE.wait(60)
        os._exit(0)     # init thread may be wedged in native code; hard-exit
    details["device"] = dev

    quick = "--quick" in argv       # fwd + default train step only
    full = "--full" in argv         # every ladder (accum4/large/vqa/pretrain)
    deadline = float(os.environ.get(
        "BENCH_DEADLINE_S", "7200" if full else "2100"))
    t0 = time.time()

    def _remaining():
        return deadline - (time.time() - t0)

    def _on_deadline():
        _emit(details, error=(f"watchdog: bench exceeded {deadline:g}s; "
                              "emitting completed sections only"))
        _EMIT_DONE.wait(60)   # if main won the emit race, let it finish
        os._exit(0)

    dog = threading.Timer(deadline, _on_deadline)
    dog.daemon = True
    dog.start()

    if "--selftest-wedge" in argv:  # test hook: wedge mid-run so the
        time.sleep(1e9)             # watchdog path can be exercised

    walls = details.setdefault("section_wall_s", {})

    def _section(name, fn, ladder, est_s=0.0):
        # budget gate (round 5 — BENCH_r04 rc=124): a section whose
        # worst-case estimate exceeds the remaining budget (minus a 120 s
        # emit margin) is skipped WITH A RECORDED REASON; the headline
        # sections run first so they are never the ones skipped
        if est_s and _remaining() < est_s + 120:
            details[name] = {"skipped": (f"budget: {_remaining():.0f}s left "
                                         f"< est {est_s:.0f}s + 120s margin")}
            print(f"bench: skipping {name} ({details[name]['skipped']})",
                  file=sys.stderr)
            return
        t_sec = time.time()
        details[name] = _with_degrade(fn, ladder, name)
        walls[name] = round(time.time() - t_sec, 1)
        # collect between sections: a section's internal exception cycles
        # (even recovered ones) can pin device buffers that the next
        # section then OOMs on — observed 2026-08-19
        gc.collect()
        try:
            import jax

            # drop compiled executables: sections share no shapes, and the
            # accumulated programs themselves occupy device memory. In the
            # 2026-08-19 rerun live_arrays() was provably 0 GB going into
            # the vqa section yet B=16 (and even batch-1 serving, and a
            # persistent-cache READ of a one-op program) died with
            # RESOURCE_EXHAUSTED — the five earlier sections' ~10-19
            # TF/step train executables were what filled the chip.
            jax.clear_caches()
            gc.collect()
            # telemetry: arrays are the CLIENT view; memory_stats (when the
            # plugin provides it) is the allocator's ground truth
            n = sum(a.nbytes for a in jax.live_arrays())
            stats = {}
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
            except Exception:  # noqa: BLE001 — plugin may not implement it
                pass
            print(f"bench: after {name} ({walls[name]:.0f}s): "
                  f"{n / 1e9:.2f} GB in "
                  f"{len(jax.live_arrays())} live arrays; "
                  f"device bytes_in_use={stats.get('bytes_in_use')} "
                  f"peak={stats.get('peak_bytes_in_use')}", file=sys.stderr)
        except Exception:
            pass

    # previous sidecar (read BEFORE this run overwrites it) feeds the serve
    # regression tripwire — VERDICT r4 weak #3
    prev_serve_dev_ms = None
    try:
        with open(_SIDECAR) as f:
            _prev = json.load(f)
        prev_serve_dev_ms = (_prev.get("details", {}).get("serve_latency", {})
                             .get("device_compute", {})
                             .get("device_ms_per_query"))
    except Exception:
        pass

    # ---- headline sections, in the order the BASELINE tracks them --------
    _section("fwd", fwd_bench, [
        dict(B=16, k1=6, k2=18),
        dict(B=16, k1=4, k2=10),
        dict(B=8, k1=4, k2=10),
        dict(B=4, k1=3, k2=7),
    ])

    if not quick:
        # headline train number: per-chip B=16 (MFU rises with B — conv
        # bwd amortizes); runs BEFORE the reference-config B=4 section so
        # a budget squeeze drops the weaker number, not the headline
        _section("train_step_b16", train_bench,
                 [dict(B=16, accum=1, k1=4, k2=12),
                  dict(B=16, accum=1, k1=2, k2=6),
                  dict(B=8, accum=1, k1=3, k2=9)], est_s=480)
        # batch-1 VQA serving latency (BASELINE.json: p50 tracked).
        # Deliberately BEFORE any OOM-prone ladder: the round-4 capture's
        # "2x serve regression" (device 1.756 vs 0.815 ms) came from this
        # section running as an isolated child on a poisoned backend late
        # in the run; measured in-process on a clean backend it belongs
        # with the round-3 numbers. The tripwire below guards that.
        _section("serve_latency", serve_bench, [
            dict(n_queries=40),
            dict(n_queries=12),
        ], est_s=420)
        dev_ms = (details.get("serve_latency", {})
                  .get("device_compute", {}).get("device_ms_per_query"))
        if prev_serve_dev_ms and dev_ms and (
                dev_ms > 1.3 * prev_serve_dev_ms
                or dev_ms < prev_serve_dev_ms / 1.3):
            details["serve_latency"]["regression_warn"] = (
                f"device_ms_per_query {dev_ms} moved >30% vs last run "
                f"({prev_serve_dev_ms})")
            print("bench: WARNING "
                  + details["serve_latency"]["regression_warn"],
                  file=sys.stderr)

    # reference VCR config baseline: per-device batch 4
    _section("train_step", train_bench,
             [dict(B=4, accum=1),
              dict(B=4, accum=1, k1=3, k2=9),
              dict(B=2, accum=1, k1=3, k2=7)], est_s=300)

    if full:
        # shipped VCR base config: per-device batch 4, grad-accum 4
        _section("train_step_accum4", train_bench,
                 [dict(B=4, accum=4, k1=3, k2=9),
                  dict(B=4, accum=4, k1=2, k2=6),
                  dict(B=2, accum=4, k1=2, k2=6)], est_s=420)
        # B=16 fits large on one v5e chip without remat (measured:
        # 69.8 img/s MFU 0.441 vs 48.9/0.277 at B=4, 58.8/0.327 at
        # B=8) — same conv-bwd amortization as base; remat measured
        # strictly slower (42 img/s at B=4) — memory isn't tight
        _section("train_step_large", train_bench,
                 [dict(B=16, accum=1, large=True, k1=2, k2=6),
                  dict(B=8, accum=1, large=True, k1=3, k2=7),
                  dict(B=4, accum=1, large=True, k1=3, k2=9),
                  dict(B=2, accum=1, large=True, k1=3, k2=7)], est_s=600)
        # VQA precomputed-feature fine-tune (tracked config #2):
        # transformer-only, so the per-chip batch scales far beyond the
        # e2e conv workloads. T=32 is the realistic text bucket (live
        # question length ~16; round 3 benched T=64 and burned ~75% of
        # encoder capacity on padding -> MFU 0.256).
        _section("train_step_vqa", vqa_train_bench, [
            # B=256 OOM'd (and poisoned the backend) in the 2026-08-19 full
            # run; it stays as an isolated headroom probe so a repeat OOM
            # can never poison the in-process sections again
            dict(B=256, T=32, k1=3, k2=9, _speculative=True),
            dict(B=128, T=32, k1=4, k2=12),
            dict(B=64, T=32, k1=4, k2=12),
            dict(B=32, T=32, k1=4, k2=12),
            dict(B=16, T=32, k1=3, k2=9),
        ], est_s=900)
        # v5e-tuned box bucket (cfgs/vqa/base_v5e_bf16 rationale): O=95
        # puts L = T(32) + O + END exactly at the 128-lane tile boundary.
        # At the reference bucket (O=100, L=133) the fp32 [B,H,L,L]
        # attention-probs tensors pad their minormost dim 133 -> 256 lanes,
        # and ~30% of the step touches them (trace 2026-08-19: 15.9 ms
        # QK/PV matmuls + 15.6 ms layout copies + softmax fusions at
        # B=128). Dropping 5 of 100 lowest-rank box slots halves that:
        # measured 103.4 vs 134.4 ms/step at B=128 (MFU 0.347 -> 0.433).
        _section("train_step_vqa_l128", vqa_train_bench, [
            dict(B=128, T=32, O=95, k1=4, k2=12),
            dict(B=64, T=32, O=95, k1=4, k2=12),
        ], est_s=420)

    if full or "--pretrain" in argv:
        # reference pretraining workload (CC e2e + aux corpus, MLM+MVRC) —
        # tracked config #4; --full profile (the default profile must fit
        # the driver budget, and this ladder pays a fresh multi-minute
        # compile over the tunnel)
        _section("pretrain_step", pretrain_bench, [
            dict(B=16, aux_B=16, k1=2, k2=6),
            dict(B=8, aux_B=8, k1=2, k2=5),
            dict(B=4, aux_B=4, k1=2, k2=5),
        ], est_s=600)

    dog.cancel()
    _emit(details)
    return 0


if __name__ == "__main__":
    if "--rung" in sys.argv:
        i = sys.argv.index("--rung")
        sys.exit(_rung_child(sys.argv[i + 1],
                             sys.argv[sys.argv.index("--kw") + 1]))
    if "--train" in sys.argv:
        # single-section mode for iterating on one config; honors the
        # modifier flags (the default main() already captures all of
        # train/accum4/b16/large without any flags)
        _enable_compile_cache()
        kw = dict(B=4, accum=1)
        if "--large" in sys.argv:
            kw["large"] = True
        if "--accum" in sys.argv:
            kw["accum"] = 4
        if "--b16" in sys.argv:
            kw["B"] = 16
        print(json.dumps(train_bench(**kw)))
    else:
        sys.exit(main())
