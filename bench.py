"""Benchmark: flagship forward throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the BASELINE.json headline: images/sec/chip through the full
ROIAlign + VL-BERT forward path (ResNet-101 backbone, 14x14 ROIAlign, conv5
head, 12-layer VL-BERT-base over [text|boxes|END]), bf16 compute.

vs_baseline: BASELINE.md gives no published reference throughput (the
reference logs Speedometer live only). We anchor against the 2x-A100 target
in BASELINE.json: an A100 runs this fwd path at roughly 120 img/s (fp16,
batch 8, 600px, measured-class estimate for the torch reference), so the
target is 240 img/s/chip; vs_baseline reports value/120 (i.e. >2.0 beats
the target).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_REFERENCE_IMG_PER_S = 120.0


def train_bench():
    """--train: full e2e train-step throughput (fwd+bwd+AdamW)."""
    import jax
    import numpy as np

    _enable_compile_cache()

    from __graft_entry__ import _flagship, _vcr_batch
    from vlbert_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from vlbert_tpu.training.loop import create_train_state, make_train_step

    cfg, model = _flagship(tiny=False)
    cfg.TRAIN.OPTIMIZER = "AdamW"
    B = 4
    batch = _vcr_batch(B=B, img=608, O=36, C=4, T=48)
    mesh = make_mesh()
    state, tx, _ = create_train_state(model, batch, cfg, steps_per_epoch=100)
    step = make_train_step(model, tx, "vcr", cfg, grad_accum=1)
    rep = replicated(mesh)
    jit_step = jax.jit(step, donate_argnums=(0,),
                       out_shardings=(rep, rep, rep))
    with mesh:
        state = jax.device_put(state, rep)
        sb = shard_batch(batch, mesh)
        imgs = [jax.device_put(sb[0] + 0.01 * i) for i in range(16)]
        jax.block_until_ready(imgs)
        s, l, _ = jit_step(state, (imgs[0],) + sb[1:], jax.random.PRNGKey(0))
        jax.block_until_ready(l)
        # warm a few steps so the chained-state signature is stable, then
        # time 12 pipelined steps; losses must all differ (dedupe guard)
        for i in range(1, 4):
            s, l, _ = jit_step(s, (imgs[i],) + sb[1:], jax.random.PRNGKey(i))
        jax.block_until_ready(l)
        t0 = time.time()
        losses = []
        for i in range(4, 16):
            s, l, _ = jit_step(s, (imgs[i],) + sb[1:], jax.random.PRNGKey(i))
            losses.append(l)
        jax.block_until_ready(losses)
        dt = (time.time() - t0) / 12
        lv = [float(x) for x in losses]
        assert len(set(lv)) == len(lv), f"dedupe artifact: {lv}"
    print(json.dumps({
        "metric": "train images/sec/chip (ResNet-101 e2e VCR fwd+bwd+AdamW, 608px)",
        "value": round(B / dt, 2),
        "unit": "img/s",
        "vs_baseline": round(B / dt / 10.0, 3),  # reference ~10 img/s/GPU est.
    }))


def _enable_compile_cache():
    import jax

    cache = os.path.expanduser("~/.cache/vlbert_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship, _vcr_batch

    _enable_compile_cache()
    cfg, model = _flagship(tiny=False)
    B, IMG, O, C, T = 16, 608, 36, 4, 48
    batch = _vcr_batch(B=B, img=IMG, O=O, C=C, T=T)
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}
    # jitted init: one compiled (and disk-cached) program instead of
    # thousands of eager dispatches through the device tunnel
    params = jax.jit(lambda r: model.init(r, *batch, train=True))(init_rngs)

    fwd = jax.jit(lambda p, *a: model.apply(p, *a, train=False))
    args = batch[:-1]

    jax.block_until_ready(fwd(params, *args)["label_logits"])  # compile
    # varied pre-staged inputs: identical repeated executions can be deduped
    # by the device tunnel and report impossible numbers
    n_iter = 20
    images = [jax.device_put(np.asarray(args[0]) + 0.01 * i)
              for i in range(n_iter)]
    jax.block_until_ready(images[-1])
    t0 = time.time()
    outs = [fwd(params, im, *args[1:])["label_logits"] for im in images]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n_iter
    img_per_s = B / dt

    print(json.dumps({
        "metric": "images/sec/chip (ROIAlign + VL-BERT-base fwd, 608px, 36 boxes, 4x48 text, B=16)",
        "value": round(img_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / A100_REFERENCE_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    if "--train" in sys.argv:
        train_bench()
    else:
        main()
