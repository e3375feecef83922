"""Per-op time breakdown from a jax.profiler trace (xplane.pb).

profile_step.py --trace DIR captures the raw xplane; this tool turns it
into the table the round-3/4 MFU analyses cite: top HLO ops by self time,
grouped by category, so "where do the non-MXU milliseconds go" has an
answer backed by the device's own counters rather than A/B subtraction.

Uses the installed `xprof` converter (the tensorboard_plugin_profile copy
in this image has a protobuf version conflict; xprof's PyCapsule path does
not import the broken *_pb2 modules).

Usage:
    python tools/profile_step.py --vqa --trace /tmp/tr
    python tools/trace_ops.py /tmp/tr [--top 40] [--json OUT]
"""

import glob
import json
import os
import sys


def find_xplanes(trace_dir):
    pats = [os.path.join(trace_dir, "**", "*.xplane.pb")]
    out = []
    for p in pats:
        out.extend(glob.glob(p, recursive=True))
    return sorted(out)


def op_table(trace_dir):
    """Return list of dicts: one row per HLO op aggregated over the trace."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = find_xplanes(trace_dir)
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    # hlo_stats gives per-op totals with category + self time; returns
    # (data, content_type) where data is JSON text
    data, _ = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    parsed = json.loads(data)
    # gviz table: {cols: [{label,...}], rows: [{c: [{v: ...}, ...]}]}
    if isinstance(parsed, dict) and "rows" in parsed:
        labels = [c.get("label") or c.get("id") for c in parsed["cols"]]
        rows = []
        for r in parsed["rows"]:
            rows.append({labels[i]: (cell or {}).get("v")
                         for i, cell in enumerate(r["c"])})
        return rows
    return parsed


def summarize(rows, top=40):
    def num(r, *keys):
        for k in keys:
            if k in r and r[k] is not None:
                try:
                    return float(r[k])
                except (TypeError, ValueError):
                    pass
        return 0.0

    def name(r):
        for k in ("HLO op name", "HLO Op Name", "hlo_op_name", "Op Name"):
            if r.get(k):
                return str(r[k])
        return "?"

    def cat(r):
        for k in ("HLO op category", "HLO Op Category", "hlo_category",
                  "Category"):
            if r.get(k):
                return str(r[k])
        return "?"

    t_keys = ("Total self time (us)", "Total Self Time (us)",
              "total_self_time_us")
    rows = [r for r in rows if num(r, *t_keys) > 0]
    rows.sort(key=lambda r: -num(r, *t_keys))
    total = sum(num(r, *t_keys) for r in rows)
    by_cat = {}
    for r in rows:
        by_cat[cat(r)] = by_cat.get(cat(r), 0.0) + num(r, *t_keys)
    print(f"total self time: {total/1e3:.2f} ms (all traced steps)")
    print("\n-- by category --")
    for c, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {c}")
    print(f"\n-- top {top} ops --")
    for r in rows[:top]:
        t = num(r, *t_keys)
        occ = int(num(r, "#Occurrences") or 1)
        bound = r.get("Bound by") or "?"
        src = str(r.get("Source Info") or "")
        if "title" in src:      # strip the html wrapper around the path
            src = src.split(">")[-2].split("<")[0] if ">" in src else src
        fw = str(r.get("Framework op name") or "")[:48]
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  x{occ:<3d} "
              f"[{cat(r)}|{bound}] {name(r)[:40]} {fw} {src[-40:]}")
    return {"total_us": total, "by_category_us": by_cat,
            "top_ops": [{"name": name(r), "category": cat(r),
                         "self_us": num(r, *t_keys),
                         "occurrences": int(num(r, "#Occurrences") or 1),
                         "bound_by": r.get("Bound by"),
                         "framework_op": r.get("Framework op name"),
                         "source": str(r.get("Source Info") or "")[-120:]}
                        for r in rows[:top]]}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 2
    trace_dir = argv[0]
    top = int(argv[argv.index("--top") + 1]) if "--top" in argv else 40
    rows = op_table(trace_dir)
    if rows and isinstance(rows, list):
        print(f"(columns: {sorted(rows[0].keys())})", file=sys.stderr)
    summary = summarize(rows, top)
    if "--json" in argv:
        out = argv[argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
