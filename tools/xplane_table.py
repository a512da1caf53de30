#!/usr/bin/env python
"""Aggregate a jax.profiler TPU trace into a per-HLO-op roofline table.

Reads the ``*.xplane.pb`` file a ``jax.profiler.start_trace`` capture writes,
finds the TPU device plane, and aggregates event durations + the compiler's
per-op stats (flops, bytes accessed) per HLO op/fusion. Emits the table the
RESULTS.md roofline sections are built from: for each op, total time, share
of step, achieved FLOP/s and achieved HBM bandwidth.

Usage:  python tools/xplane_table.py /tmp/perf/trace_dir [--top 25] [--steps N]

``--steps N`` divides totals by N to get per-step numbers (the capture runs
N identical steps).
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import xplane_pb2  # noqa: E402


def load_xspace(trace_dir):
    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    pbs.sort(key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space, pbs[-1]


def device_planes(space):
    for plane in space.planes:
        n = plane.name.lower()
        if "tpu" in n or "/device:" in n or "gpu" in n:
            yield plane


def aggregate(plane):
    """Per event-metadata totals: duration_ps, occurrences, stat sums."""
    stat_names = {m.id: m.name for m in
                  (plane.stat_metadata[k] for k in plane.stat_metadata)}
    rows = {}
    # only the synchronous per-op line: "Steps"/"XLA Modules" wrap the whole
    # step, "Async XLA Ops" (copy-start etc.) overlap compute — summing any
    # of those double-counts
    op_lines = [l for l in plane.lines if l.name == "XLA Ops"]
    if not op_lines:
        # never sum every line (Steps/Modules/Async overlap the op events);
        # fall back to the single busiest line as a best guess, loudly
        best = max(plane.lines, key=lambda l: len(l.events), default=None)
        print(f"WARNING: no 'XLA Ops' line on plane {plane.name!r}; "
              f"using line {best.name!r} only — treat ms/pct as approximate",
              file=sys.stderr)
        op_lines = [best] if best is not None else []
    for line in op_lines:
        for ev in line.events:
            md = plane.event_metadata.get(ev.metadata_id)
            name = md.name if md else str(ev.metadata_id)
            row = rows.setdefault(name, {"dur_ps": 0, "n": 0, "stats": {}})
            row["dur_ps"] += ev.duration_ps
            row["n"] += 1
            for st in ev.stats:
                sname = stat_names.get(st.metadata_id, str(st.metadata_id))
                val = (st.double_value or st.uint64_value or st.int64_value)
                if isinstance(val, (int, float)) and val:
                    row["stats"][sname] = row["stats"].get(sname, 0) + val
    # metadata-level stats (flops / bytes often live on XEventMetadata,
    # counted once per occurrence — folded in by the caller via md_stats)
    md_stats = {}
    for key in plane.event_metadata:
        md = plane.event_metadata[key]
        if md.stats:
            md_stats[md.name] = {
                stat_names.get(st.metadata_id, str(st.metadata_id)):
                (st.double_value or st.uint64_value or st.int64_value)
                for st in md.stats}
    return rows, md_stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=1,
                    help="steps captured; divides totals for per-step view")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--list-stats", action="store_true",
                    help="print the stat names present and exit")
    args = ap.parse_args()

    space, path = load_xspace(args.trace_dir)
    planes = list(device_planes(space))
    if not planes:
        print("planes found:", [p.name for p in space.planes])
        raise SystemExit("no device plane")
    plane = max(planes, key=lambda p: sum(len(l.events) for l in p.lines))
    rows, md_stats = aggregate(plane)

    if args.list_stats:
        names = set()
        for r in rows.values():
            names.update(r["stats"])
        for v in md_stats.values():
            names.update(v)
        print(sorted(names))
        return

    total_ps = sum(r["dur_ps"] for r in rows.values())
    out = []
    for name, r in rows.items():
        ms = r["dur_ps"] / 1e9 / args.steps
        stats = dict(r["stats"])
        # metadata-level stats are static per-op: multiply by occurrences
        for k, v in md_stats.get(name, {}).items():
            if k not in stats and isinstance(v, (int, float)):
                stats[k] = v * r["n"]
        flops = stats.get("flops", 0) / args.steps
        raw_bytes = (stats.get("bytes_accessed", 0) or
                     stats.get("bytes accessed", 0)) / args.steps
        entry = {
            "op": name[:90],
            "ms": round(ms, 3),
            "pct": round(100 * r["dur_ps"] / total_ps, 2) if total_ps else 0,
            "calls": r["n"],
        }
        if flops:
            entry["tflops_s"] = round(flops / (ms / 1e3) / 1e12, 1) if ms else 0
        if raw_bytes:
            entry["gb"] = round(raw_bytes / 1e9, 3)
            entry["gb_s"] = round(raw_bytes / (ms / 1e3) / 1e9, 1) if ms else 0
        # carry any other interesting stats verbatim
        for k in ("bytes_accessed0", "bytes_accessed1", "bytes_accessedout"):
            if k in stats:
                entry[k] = int(stats[k] / args.steps)
        out.append(entry)
    out.sort(key=lambda e: -e["ms"])
    print(f"# plane: {plane.name}  file: {os.path.basename(path)}  "
          f"total {total_ps/1e9/args.steps:.1f} ms/step over {args.steps} steps")
    for e in out[:args.top]:
        if args.json:
            print(json.dumps(e))
        else:
            extra = "".join(
                f"  {k}={e[k]}" for k in ("tflops_s", "gb", "gb_s")
                if k in e)
            print(f"{e['ms']:9.3f} ms  {e['pct']:5.2f}%  x{e['calls']:<4d}"
                  f"{extra}  {e['op']}")


if __name__ == "__main__":
    main()
