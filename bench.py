"""Benchmark: flagship throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "details"}.

Headline value = forward images/sec/chip through the full ROIAlign +
VL-BERT path (ResNet-101 backbone, 14x14 ROIAlign, conv5 head, 12-layer
VL-BERT-base over [text|boxes|END]), bf16 compute, 608px, 36 boxes, 4x48
text. "details" carries the train-step number and MFU for both.

Methodology:
  * throughput: varied pre-staged inputs (the device tunnel dedupes
    identical executions), chained runs of K1 and K2 dispatches each ending
    in a scalar VALUE fetch; per-call time = (t(K2)-t(K1))/(K2-K1). The
    slope cancels the ~30-50 ms tunnel round trip, and the value fetch is
    the only reliable completion barrier here (block_until_ready has been
    observed returning early on this device plugin, yielding impossible
    MFU > 1 readings);
  * MFU: XLA's own cost analysis (compiled.cost_analysis()["flops"]) over
    the measured wall time, against the chip's published bf16 peak. This
    replaces the earlier hand-estimated A100 anchor (the reference repo
    publishes no throughput; Speedometer logs live only). vs_baseline is
    still reported against that 120 img/s measured-class A100 estimate for
    continuity with BENCH_r01 and is labeled as an estimate in "details".
    Any MFU > 1 reading is self-evidently a timing artifact and rejected.

Modes: default = fwd + train-step (B=4). --accum adds the shipped-config
train step (per-device batch 4 x grad-accum 4, cfgs/vcr/base_q2a_4x16G).
--large adds a VL-BERT-large (24-layer, 1024-hidden) train step.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# continuity anchor from round 1 (measured-class ESTIMATE, see module doc)
A100_REFERENCE_IMG_PER_S = 120.0
# TPU v5e (v5 lite) published peak: 197 TFLOP/s bf16
V5E_PEAK_BF16 = 197e12


def _enable_compile_cache():
    import jax

    cache = os.path.expanduser("~/.cache/vlbert_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def jnp_zero():
    import jax.numpy as jnp

    return jnp.zeros((), jnp.float32)


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


def fwd_bench(B=16, IMG=608, O=36, C=4, T=48):
    import jax
    import numpy as np

    from __graft_entry__ import _flagship, _vcr_batch

    cfg, model = _flagship(tiny=False)
    batch = _vcr_batch(B=B, img=IMG, O=O, C=C, T=T)
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}
    params = jax.jit(lambda r: model.init(r, *batch, train=True))(init_rngs)

    fwd = jax.jit(lambda p, *a: model.apply(p, *a, train=False))
    args = batch[:-1]
    jax.block_until_ready(fwd(params, *args)["label_logits"])  # compile
    flops = _flops_of(fwd, params, *args)

    n_iter = 28                      # warm 0..1, t1 2..7, t2 8..25
    images = [jax.device_put(np.asarray(args[0]) + 0.01 * i)
              for i in range(n_iter)]
    jax.block_until_ready(images[-1])

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

    dt = _slope_time(run_k)
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
    }


def train_bench(B=4, accum=1, large=False, IMG=608, O=36, C=4, T=48):
    """Full e2e train-step throughput (fwd + bwd + AdamW [+ scan accum])."""
    import jax
    import numpy as np

    from __graft_entry__ import _flagship, _vcr_batch
    from vlbert_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from vlbert_tpu.training.loop import create_train_state, make_train_step

    cfg, model = _flagship(tiny=False)
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
    batch = _vcr_batch(B=B * accum, img=IMG, O=O, C=C, T=T)
    if accum > 1:
        batch = jax.tree_util.tree_map(
            lambda x: np.asarray(x).reshape(accum, B, *x.shape[1:]), batch)
    mesh = make_mesh()
    init_batch = batch if accum == 1 else jax.tree_util.tree_map(
        lambda x: x[0], batch)
    state, tx, _ = create_train_state(model, init_batch, cfg,
                                      steps_per_epoch=100)
    step = make_train_step(model, tx, "vcr", cfg, grad_accum=accum)
    rep = replicated(mesh)
    jit_step = jax.jit(step, donate_argnums=(0,),
                       out_shardings=(rep, rep, rep))
    with mesh:
        state = jax.device_put(state, rep)
        sb = shard_batch(batch, mesh, batch_dim=0 if accum == 1 else 1)
        imgs = [jax.device_put(sb[0] + 0.01 * i) for i in range(28)]
        jax.block_until_ready(imgs)
        rng = jax.random.PRNGKey(0)
        s, l, _ = jit_step(state, (imgs[0],) + sb[1:], rng)
        float(l)
        flops = None
        try:
            flops = _flops_of(jax.jit(step), s, (imgs[0],) + sb[1:], rng)
        except Exception:
            pass
        for i in range(1, 3):   # stabilize donated-state signature
            s, l, _ = jit_step(s, (imgs[i],) + sb[1:], jax.random.PRNGKey(i))
        float(l)
        lvs = []

        def run_k(k, base, _n=[3]):
            nonlocal s
            t0 = time.time()
            for j in range(k):
                _n[0] += 1
                s, l, _ = jit_step(s, (imgs[base + j],) + sb[1:],
                                   jax.random.PRNGKey(_n[0]))
            lvs.append(float(l))     # value fetch = completion barrier;
            return time.time() - t0  # steps chain via the donated state

        dt = _slope_time(run_k, k1=6, k2=18)
        assert len(set(lvs)) == len(lvs), f"dedupe artifact: {lvs}"
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


def main():
    _enable_compile_cache()
    details = {"methodology": (
        "slope timing: chained runs of K1/K2 varied-input dispatches, each "
        "ending in a dataflow-forced scalar VALUE fetch; per-call = "
        "(t2-t1)/(K2-K1), cancelling tunnel RTT (block_until_ready can "
        "return early on this plugin -> impossible MFU>1 readings, "
        "rejected); MFU = XLA cost_analysis flops / wall / 197e12 (v5e "
        "bf16 peak); vs_baseline anchor 120 img/s is a measured-class "
        "A100 ESTIMATE kept for continuity with BENCH_r01")}
    fwd = fwd_bench()
    details["fwd"] = fwd
    details["train_step"] = train_bench(B=4, accum=1)
    if "--accum" in sys.argv:
        # shipped VCR base config: per-device batch 4, grad-accum 4
        details["train_step_accum4"] = train_bench(B=4, accum=4)
    if "--large" in sys.argv:
        # B=4 fits on one v5e chip without remat and is ~14% faster per
        # image than B=2 (49.5 vs 43 img/s measured); remat measured
        # strictly slower at this size (42 img/s) — memory isn't tight
        details["train_step_large"] = train_bench(B=4, accum=1, large=True)
    if "--scaling" in sys.argv:
        # per-chip batch scaling (MFU rises with B: conv bwd amortizes)
        details["train_step_b8"] = train_bench(B=8, accum=1)
        details["train_step_b16"] = train_bench(B=16, accum=1)
    print(json.dumps({
        "metric": ("images/sec/chip (ROIAlign + VL-BERT-base fwd, 608px, "
                   "36 boxes, 4x48 text, B=16)"),
        "value": fwd["img_per_s"],
        "unit": "img/s",
        "vs_baseline": round(fwd["img_per_s"] / A100_REFERENCE_IMG_PER_S, 3),
        "details": details,
    }))


if __name__ == "__main__":
    if "--train" in sys.argv and "--accum" not in sys.argv \
            and "--large" not in sys.argv:
        _enable_compile_cache()
        print(json.dumps(train_bench(B=4, accum=1)))
    else:
        main()
