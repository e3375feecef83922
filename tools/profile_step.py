"""Profile / A-B one flagship train step on the attached device.

The bench answers "how fast"; this tool answers "why". It reuses bench.py's
exact measurement protocol (uint8 staging, slope timing, MFU from XLA cost
analysis) and adds:

  --trace DIR        capture a jax.profiler trace around the timed window
                     (open with tensorboard --logdir DIR, or xprof)
  --no-donate        drop donate_argnums from the step jit
  --masked-adam      opt into TPU.MASKED_OPT_STATE=true (moment state
                     masked to trainable params; updates are masked to
                     zero under BOTH settings)
  --no-masked-adam   neutralize optax.masked entirely (overrides the knob)
  --large / --b16 / --accum / --pretrain
                     pick the measured configuration (default: base B=4)

Why the A/B flags exist: masking the Adam moment state to trainable params
interacts pathologically with buffer donation at small batch — SETTLED on
v5e 2026-08-18, full matrix at B=4 (ms/step): donate+masked 80.8,
donate+dense 37.0, no-donate+masked 41.6, no-donate+dense 44.4; at B=16
masked vs dense is a wash (109.3 vs 110.3). The donation alias tables are
complete in both variants per the compiled HLO, so the interaction is
device-side scheduling of the MaskedState pytree. Consequence:
TPU.MASKED_OPT_STATE now defaults to false (dense moments, masked
updates — trained values bit-identical) and donation stays on.

Usage:
    python tools/profile_step.py --b16 --trace /tmp/trace
    python tools/profile_step.py --no-donate
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    import jax

    if "--no-donate" in argv:
        _orig_jit = jax.jit

        def nodonate_jit(*a, **kw):
            kw.pop("donate_argnums", None)
            return _orig_jit(*a, **kw)

        jax.jit = nodonate_jit
    if "--no-masked-adam" in argv:
        import optax

        optax.masked = lambda inner, mask: inner
    if "--masked-adam" in argv:
        # opt back into masked moments regardless of the config default
        # (TPU.MASKED_OPT_STATE=false since the A/B below was settled)
        import __graft_entry__

        _orig_flagship = __graft_entry__._flagship

        def _flagship_masked(*a, **kw):
            cfg, model = _orig_flagship(*a, **kw)
            cfg.TPU.MASKED_OPT_STATE = True
            return cfg, model

        __graft_entry__._flagship = _flagship_masked

    import bench

    bench._enable_compile_cache()
    if "--pretrain" in argv:
        fn, kw = bench.pretrain_bench, dict(B=8, aux_B=8, k1=3, k2=9)
    elif "--vqa" in argv:
        fn, kw = bench.vqa_train_bench, dict(B=64, T=32, k1=3, k2=9)
        for i, a in enumerate(argv):
            if a == "--vqa-b":
                kw["B"] = int(argv[i + 1])
            if a == "--vqa-t":
                kw["T"] = int(argv[i + 1])
            if a == "--vqa-o":
                # box-bucket lever: O=95 makes L = T(32)+O+END = 128, the
                # lane width — the [B,H,L,L] probs tensor stops padding
                # its minormost dim to 256
                kw["O"] = int(argv[i + 1])
        if "--dropout0" in argv:
            kw["dropout"] = 0.0
        if "--rbg" in argv:
            kw["rng_impl"] = "rbg"
    else:
        fn = bench.train_bench
        kw = dict(B=4, accum=1, k1=3, k2=9)
        if "--b16" in argv:
            kw.update(B=16, k1=2, k2=6)
        if "--large" in argv:
            kw.update(large=True, k1=2, k2=6)
        if "--accum" in argv:
            kw["accum"] = 4
        if "--tiny" in argv:      # smoke/CPU mode: exercises the full path
            kw.update(B=2, IMG=64, O=4, T=16, k1=2, k2=4)

    trace_dir = None
    for i, a in enumerate(argv):
        if a == "--trace":
            trace_dir = argv[i + 1]
    if trace_dir:
        os.makedirs(trace_dir, exist_ok=True)
        with jax.profiler.trace(trace_dir):
            r = fn(**kw)
    else:
        r = fn(**kw)

    r["config"] = {k: v for k, v in kw.items()}
    r["variant"] = {
        "donate": "--no-donate" not in argv,
        "masked_adam": ("--masked-adam" in argv
                        and "--no-masked-adam" not in argv),
    }
    try:
        ms = jax.devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in ms:
            r["peak_hbm_gb"] = round(ms["peak_bytes_in_use"] / 2**30, 2)
    except Exception:
        pass
    if trace_dir:
        r["trace_dir"] = trace_dir
    print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
