"""XLA TPU flag sweep on the B=16 flagship train step (VERDICT r3 item 6).

The B=16 e2e VCR train step sits at MFU ~0.46; round 3's profiling showed
a uniformly ~0.37-MFU backward and a bandwidth-bound AdamW tail with no
single hot op. This sweep probes the remaining compiler-level levers —
XLA TPU scheduling/fusion knobs — which must be set BEFORE backend init,
so each variant runs `bench.py --train --b16` in a fresh subprocess.

Flags probed (conservative, documented XLA TPU knobs):
  * baseline (no extra flags)
  * --xla_tpu_scoped_vmem_limit_kib={larger,smaller}  — fusion VMEM budget:
    larger lets XLA form bigger fusions (fewer HBM round trips), smaller
    trades fusion size for more double-buffering headroom
  * --xla_tpu_enable_latency_hiding_scheduler=true     — overlap-oriented
    schedule (mostly a multi-chip lever; measured anyway)

Writes results/xla_flag_probe.json with img/s per variant. The persistent
compile cache is DISABLED in children (each flag set must compile fresh;
cached executables would report the baseline's code under a new flag).

Run: python tools/xla_flag_probe.py [--quick]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    ("baseline", ""),
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem_32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem_8m", "--xla_tpu_scoped_vmem_limit_kib=8192"),
    ("latency_hiding_sched",
     "--xla_tpu_enable_latency_hiding_scheduler=true"),
]


def run_variant(name, flags, timeout=1500):
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    # fresh compile per variant: point the persistent cache away
    env["JAX_COMPILATION_CACHE_DIR"] = ""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import json, jax, bench\n"
        "jax.config.update('jax_enable_compilation_cache', False)\n"
        "print('RESULT ' + json.dumps(bench.train_bench(B=16, accum=1, "
        "k1=2, k2=6)))\n" % REPO)
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=timeout,
                       cwd=REPO)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    return {"error": (p.stderr[-500:] or f"rc={p.returncode}")}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    variants = VARIANTS[:2] if "--quick" in argv else VARIANTS
    out = {}
    for name, flags in variants:
        print(f"probing {name} ({flags or 'no flags'})...",
              file=sys.stderr)
        out[name] = {"flags": flags, **run_variant(name, flags)}
        print(f"  -> {out[name]}", file=sys.stderr)
    path = os.path.join(REPO, "results", "xla_flag_probe.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
