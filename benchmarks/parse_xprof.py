"""Parse a jax.profiler/xprof trace into a committed text summary — the
analog of the reference's checked-in ncu reports
(``kernel-profiling/global-float-render-profile.txt``: Speed-of-Light /
occupancy sections for the ``render`` kernel).

Reads the Chrome-trace JSON (``*.trace.json.gz``) that
``benchmarks/profile.py`` writes under its ``--logdir``, groups complete
events by device lane, and prints per-op totals: what fraction of the
device program is the Mosaic render kernel vs postprocess fusions vs
infeed, plus host-side dispatch overhead.

Usage:
    python benchmarks/profile.py --impl pallas --samples 100 \
        --width 640 --height 384 --logdir /tmp/rt-profile
    python benchmarks/parse_xprof.py /tmp/rt-profile \
        > benchmarks/results/xprof_render_summary.txt
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def find_trace(logdir: str) -> str:
    pats = [
        os.path.join(logdir, "**", "*.trace.json.gz"),
        os.path.join(logdir, "**", "*.trace.json"),
    ]
    hits: list = []
    for p in pats:
        hits += glob.glob(p, recursive=True)
    if not hits:
        raise SystemExit(f"no trace.json(.gz) under {logdir}")
    return max(hits, key=os.path.getmtime)


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data)


def main() -> int:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rt-profile"
    path = find_trace(logdir)
    events = load_events(path)

    # pid/tid -> lane name from metadata events
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]

    # complete events ("X") per lane, summed by op name
    lanes = defaultdict(lambda: defaultdict(float))
    lane_span = defaultdict(lambda: [float("inf"), 0.0])
    for e in events:
        if e.get("ph") != "X":
            continue
        pid, tid = e.get("pid"), e.get("tid")
        lane = f"{names.get(pid, pid)} / {names.get((pid, tid), tid)}"
        dur = float(e.get("dur", 0.0))  # microseconds
        lanes[lane][e.get("name", "?")] += dur
        t0 = float(e.get("ts", 0.0))
        lane_span[lane][0] = min(lane_span[lane][0], t0)
        lane_span[lane][1] = max(lane_span[lane][1], t0 + dur)

    print(f"trace: {path}")
    for lane in sorted(lanes, key=lambda k: -sum(lanes[k].values())):
        ops = lanes[lane]
        total = sum(ops.values())
        span = lane_span[lane][1] - lane_span[lane][0]
        if total < 1000:  # skip lanes under 1 ms
            continue
        print(f"\n== {lane}  (busy {total / 1e3:.2f} ms, "
              f"span {span / 1e3:.2f} ms)")
        for name, dur in sorted(ops.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {dur / 1e3:10.3f} ms  {100 * dur / total:5.1f}%  "
                  f"{name[:90]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
