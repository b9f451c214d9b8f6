#!/usr/bin/env python
"""Join a jax.profiler trace (XLA Ops self-times) with a dumped optimized
HLO's op_name metadata: buckets device self-time by model-path and by
source line, and lists the residual (metadata-less layout/copy fusions).

Usage: python scripts/trace_attr.py --trace /tmp/parq_trace \
           --hlo /tmp/step_hlo.txt [--calls 3] [--top 40]
"""
import argparse
import glob
import gzip
import json
import re
from collections import defaultdict


def op_self_times(trace_dir):
    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
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
    dev = {p for p, n in names.items()
           if "TPU" in n or "device" in n.lower()}
    ops_tracks = {t for t in ops_tracks if t[0] in dev}
    tracks = defaultdict(list)
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and (ev["pid"], ev.get("tid")) in ops_tracks:
            tracks[(ev["pid"], ev.get("tid"))].append(
                (ev["ts"], -ev.get("dur", 0.0), ev["name"]))
    selftime = defaultdict(float)
    for evs in tracks.values():
        evs.sort()
        stack, selfs = [], []
        for ts, ndur, name in evs:
            dur = -ndur
            while stack and stack[-1][0] <= ts + 1e-9:
                stack.pop()
            if stack:
                selfs[stack[-1][2]][1] -= dur
            selfs.append([name, dur])
            stack.append((ts + dur, name, len(selfs) - 1))
        for name, sd in selfs:
            if sd > 0:
                selftime[name] += sd
    return selftime


def hlo_metadata(hlo_path):
    namepat = re.compile(r"^\s*(?:ROOT )?%([\w.-]+) = ")
    oppat = re.compile(r'op_name="([^"]+)"')
    srcpat = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
    shapepat = re.compile(r"= ([a-z0-9]+\[[0-9,]*\])")
    meta, src, shape = {}, {}, {}
    for line in open(hlo_path):
        m = namepat.match(line)
        if not m:
            continue
        nm = m.group(1)
        o = oppat.search(line)
        if o:
            meta[nm] = o.group(1)
        s = srcpat.search(line)
        if s:
            src[nm] = f"{s.group(1).split('/')[-1]}:{s.group(2)}"
        sh = shapepat.search(line)
        if sh:
            shape[nm] = sh.group(1)
    return meta, src, shape


def bucket(opname):
    parts = opname.split("/")
    tag = "bwd" if any(p.startswith("transpose") for p in parts) else "fwd"
    mp = [p for p in parts
          if not p.startswith(("jit(", "jvp(", "transpose("))]
    return tag + ":" + "/".join(mp[:5])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/parq_trace")
    ap.add_argument("--hlo", required=True)
    ap.add_argument("--calls", type=int, default=3,
                    help="profiled calls (divide totals)")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    st = op_self_times(args.trace)
    meta, src, shape = hlo_metadata(args.hlo)
    c = args.calls * 1e3

    agg, asrc, miss = defaultdict(float), defaultdict(float), []
    for name, t in st.items():
        op = meta.get(name)
        if op is None:
            miss.append((t, name))
            continue
        agg[bucket(op)] += t
        asrc[src.get(name, "?")] += t
    print(f"total {sum(st.values()) / c:.2f} ms/call; "
          f"unattributed {sum(t for t, _ in miss) / c:.2f} ms/call")
    print("== by module path ==")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{v / c:8.3f} ms  {k}")
    print("== by source line ==")
    for k, v in sorted(asrc.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{v / c:8.3f} ms  {k}")
    print("== unattributed (layout/copy fusions etc.) ==")
    miss.sort(reverse=True)
    for t, n in miss[:args.top]:
        print(f"{t / c:8.3f} ms  {n}  {shape.get(n, '')}")


if __name__ == "__main__":
    main()
