"""Shared profiler-trace parsing: self-time aggregation over the device
'XLA Ops' lanes of a jax.profiler trace."""
import glob
import gzip
import json
import os
from collections import defaultdict


def self_time_by_op(trace_dir: str):
    """Returns (total_us, {op_name: self_us}) aggregated over the device
    XLA Ops lanes of the newest trace in `trace_dir`."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)

    names = {}
    ops_tracks = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                names[ev["pid"]] = ev["args"].get("name", "")
            if (ev.get("name") == "thread_name"
                    and ev["args"].get("name") == "XLA Ops"):
                ops_tracks.add((ev["pid"], ev.get("tid")))
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "device" in n.lower() or "Axon" in n}
    ops_tracks = {t for t in ops_tracks if t[0] in dev_pids}

    tracks = defaultdict(list)
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and (ev["pid"], ev.get("tid")) in ops_tracks:
            tracks[(ev["pid"], ev.get("tid"))].append(
                (ev["ts"], -ev.get("dur", 0.0), ev["name"]))

    agg = defaultdict(float)
    total = 0.0
    for evs in tracks.values():
        evs.sort()
        stack = []   # (end_ts, self_index)
        selfs = []
        for ts, ndur, name in evs:
            dur = -ndur
            while stack and stack[-1][0] <= ts + 1e-9:
                stack.pop()
            if stack:
                selfs[stack[-1][1]][1] -= dur
            selfs.append([name, dur])
            stack.append((ts + dur, len(selfs) - 1))
        for name, sdur in selfs:
            if sdur > 0:
                agg[name] += sdur
                total += sdur
    return total, dict(agg)


def print_top(trace_dir: str, label: str, top: int, calls: int = 1):
    total, agg = self_time_by_op(trace_dir)
    print(f"== {label}: device self time {total/1e3/calls:.2f} ms/call")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3/calls:9.3f} ms  {name[:110]}")
