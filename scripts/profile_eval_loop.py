#!/usr/bin/env python
"""Profile the eval fori-loop bench under both protocols (perturbed /
unperturbed input) and print the top device ops of each, to localize
protocol-sensitive costs."""
import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import dataclasses

import jax
import jax.numpy as jnp


def top_ops(trace_dir, label, top):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "device" in n.lower() or "Axon" in n}
    agg = defaultdict(float)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            agg[ev["name"]] += ev.get("dur", 0.0)
            total += ev.get("dur", 0.0)
    print(f"== {label}: total device {total/1e3:.2f} ms (10 loop iters)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3:9.3f} ms  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    from __graft_entry__ import _batch, _flagship_model

    model = _flagship_model()
    model = dataclasses.replace(model, compute_dtype="bfloat16")
    batch = _batch(model, 8)
    params = model.init(jax.random.PRNGKey(0), batch)
    iters = 10

    def fwd(b):
        return model.apply(params, b)

    def make(perturb):
        @jax.jit
        def run(batch):
            def body(i, acc):
                b = dict(batch)
                if perturb:
                    b["rgb_img"] = b["rgb_img"] + (acc * 1e-24).astype(
                        b["rgb_img"].dtype)
                out = fwd(b)
                s = sum(jnp.sum(leaf.astype(jnp.float32))
                        for leaf in jax.tree_util.tree_leaves(out))
                return acc + s
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    for perturb in (True, False):
        run = make(perturb)
        out = run(batch)
        jax.block_until_ready(out)
        d = f"/tmp/parq_evalloop_p{int(perturb)}"
        with jax.profiler.trace(d):
            out = run(batch)
            jax.block_until_ready(out)
        top_ops(d, f"perturb={int(perturb)}", args.top)


if __name__ == "__main__":
    main()
