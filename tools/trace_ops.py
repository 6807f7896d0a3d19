#!/usr/bin/env python
"""Aggregate device-op durations from a jax.profiler trace directory.

Usage:
    python tools/trace_ops.py TRACE_DIR [--top 40] [--steps 3]

Finds the .xplane.pb under TRACE_DIR, sums event durations per op name on
the device planes (TPU), and prints a table sorted by total time. With
--steps N, also prints per-step ms (the capture in tools/profile_step.py
traces N=3 chained steps).

This is the op-granularity view VERDICT r2 asked for: the "generic XLA
fusions" bucket broken down to named fusions so the fat ones can be
attacked individually.
"""

import argparse
import glob
import os
from collections import defaultdict


def load_xplane(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def aggregate(xs, plane_filter=("TPU", "/device:")):
    """Returns {plane_name: {event_name: (total_ps, count)}}."""
    out = {}
    for plane in xs.planes:
        if plane_filter and not any(k in plane.name for k in plane_filter):
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = defaultdict(lambda: [0, 0])
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                a = agg[name]
                a[0] += ev.duration_ps
                a[1] += 1
        out[plane.name] = agg
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=3,
                    help="divide totals by this many traced steps")
    ap.add_argument("--plane", default=None,
                    help="substring filter for plane names")
    args = ap.parse_args()

    pbs = glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {args.trace_dir}")
    path = max(pbs, key=os.path.getmtime)
    print(f"# {path}")
    xs = load_xplane(path)

    flt = (args.plane,) if args.plane else ("TPU", "/device:")
    planes = aggregate(xs, flt)
    if not planes:
        print("# no device planes matched; available planes:")
        for p in xs.planes:
            print("   ", p.name)
        return

    for pname, agg in planes.items():
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        total_ms = sum(v[0] for v in agg.values()) / 1e9
        print(f"\n== plane: {pname}  (sum {total_ms:.1f} ms, "
              f"/{args.steps} steps = {total_ms / args.steps:.1f} ms/step)")
        print(f"{'ms/step':>9} {'count':>6}  name")
        for name, (ps, cnt) in rows[:args.top]:
            print(f"{ps / 1e9 / args.steps:9.3f} {cnt:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
