#!/usr/bin/env python
"""Source-attributed profile: join a jax.profiler trace's per-op SELF times
with the optimized HLO's op metadata (op_name + source line), then aggregate
by source location / module path — turns the 'death by a thousand fusions'
tail into an actionable per-subsystem table.

Usage: python scripts/attr_profile.py <trace_dir> <hlo.txt> [group]
  group: 'source' (default) — parq_tpu source file:line
         'op'     — leading op_name path components (jvp/transpose + module)
"""
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from trace_utils import self_time_by_op  # noqa: E402


def parse_hlo_metadata(path: str):
    """name -> (op_name, source_file:line) for every HLO instruction."""
    meta = {}
    pat = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*.*?metadata=\{([^}]*)\}")
    op_pat = re.compile(r'op_name="([^"]*)"')
    src_pat = re.compile(r'source_file="([^"]*)"')
    line_pat = re.compile(r"source_line=(\d+)")
    with open(path) as fh:
        for line in fh:
            m = pat.match(line)
            if not m:
                continue
            name, md = m.group(1), m.group(2)
            op = op_pat.search(md)
            src = src_pat.search(md)
            ln = line_pat.search(md)
            meta[name] = (
                op.group(1) if op else "",
                (f"{src.group(1).split('/')[-1]}:{ln.group(1)}"
                 if src and ln else ""))
    return meta


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parq_trace"
    hlo = sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_grad_hlo.txt"
    group = sys.argv[3] if len(sys.argv) > 3 else "source"
    calls = float(sys.argv[4]) if len(sys.argv) > 4 else 3.0

    total, agg = self_time_by_op(trace_dir)
    meta = parse_hlo_metadata(hlo)

    def key_of(op_name: str):
        name = op_name.split(".clone")[0]
        op, src = meta.get(name, ("", ""))
        if not op and not src:
            return f"<unmapped> {name[:40]}"
        if group == "source":
            return src or op[:80]
        # op path: strip the jit wrapper, keep transpose/jvp + 2 components
        parts = op.split("/")
        parts = [p for p in parts if not p.startswith("jit(")]
        return "/".join(parts[:3])

    by = defaultdict(float)
    for name, us in agg.items():
        by[key_of(name)] += us
    print(f"# total {total / 1e3 / calls:.2f} ms/call over {calls:g} calls")
    for k, us in sorted(by.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{us / 1e3 / calls:9.3f} ms  {k}")


if __name__ == "__main__":
    main()
