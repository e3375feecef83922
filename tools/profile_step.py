"""Profile / A-B one flagship train step on the attached device.

The bench answers "how fast"; this tool answers "why". It reuses bench.py's
exact measurement protocol (uint8 staging, slope timing, MFU from XLA cost
analysis) and adds:

  --trace DIR        capture a jax.profiler trace around the timed window
                     (open with tensorboard --logdir DIR, or xprof)
  --no-donate        drop donate_argnums from the step jit
  --no-masked-adam   neutralize optax.masked (dense Adam moments for frozen
                     params, updates still masked to zero)
  --large / --b16 / --accum / --pretrain
                     pick the measured configuration (default: base B=4)

Why the A/B flags exist: masking the Adam moment state to trainable params
(training/optim.py, round 3) measured FASTER at B=16/large but slowed the
B=4 step ~22 ms/step ONLY in combination with buffer donation — the
donation tables themselves are complete in both variants (verified from the
compiled HLO), so the interaction is device-side scheduling. These flags
reproduce all four corners of that matrix in one command each.

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

    import bench

    bench._enable_compile_cache()
    if "--pretrain" in argv:
        fn, kw = bench.pretrain_bench, dict(B=8, aux_B=8, k1=3, k2=9)
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
        "masked_adam": "--no-masked-adam" not in argv,
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
