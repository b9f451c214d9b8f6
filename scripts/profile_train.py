#!/usr/bin/env python
"""Capture a jax.profiler trace of the train forward/backward and print the
top device ops by self time (parses the trace.json.gz — no TensorBoard
needed)."""
import argparse, glob, gzip, json, os, sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import dataclasses
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batched-grad", default="on", choices=["on", "off"])
    ap.add_argument("--what", default="grad-full",
                    choices=["fwd", "grad-full", "grad-model", "step"])
    ap.add_argument("--out", default="/tmp/parq_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from __graft_entry__ import _batch, _flagship_model
    from parq_tpu.geometry import Obb3D, Pose
    from parq_tpu.losses import parse_targets
    from parq_tpu.losses.set_loss import set_loss
    from parq_tpu.train import create_train_state, make_optimizer

    model = _flagship_model()
    model = dataclasses.replace(model, compute_dtype=args.dtype,
                                batched_grad=args.batched_grad == "on")
    batch = _batch(model, args.batch)
    tx = make_optimizer(lambda s: 1e-4)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    targets = parse_targets(Obb3D(batch["obbs_padded"]),
                            Pose(batch["T_world_local"]), batch.get("sym"))

    def fwd(params, k):
        return state.apply_fn({"params": params, "frozen": state.frozen},
                              batch, deterministic=False,
                              rngs={"dropout": k})

    def out_sum(params, k):
        out = fwd(params, k)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    def loss_full(params, k):
        return set_loss(fwd(params, k), targets, k)["total_loss"]

    key = jax.random.PRNGKey(1)
    if args.what == "step":
        # the FULL optimization step (fwd+loss+bwd+clip+AdamW+metrics) —
        # what bench.py --train repeats; exposes the optimizer/metric tail
        # that the grad-only variants exclude
        from parq_tpu.train import LossConfig, make_jitted_train_step
        step = make_jitted_train_step(LossConfig(), donate=False)
        st, m = step(state, batch, key)
        jax.block_until_ready(m["total_loss"])
        with jax.profiler.trace(args.out):
            for i in range(3):
                st, m = step(st, batch, jax.random.fold_in(key, i))
                jax.block_until_ready(m["total_loss"])
    else:
        fns = {"fwd": out_sum,
               "grad-full": jax.grad(loss_full),
               "grad-model": jax.grad(out_sum)}
        f = jax.jit(fns[args.what])
        out = f(state.params, key)
        jax.block_until_ready(out)

        with jax.profiler.trace(args.out):
            for i in range(3):
                out = f(state.params, jax.random.fold_in(key, i))
                jax.block_until_ready(out)

    paths = sorted(glob.glob(os.path.join(
        args.out, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)

    # device "XLA Ops" lanes only (the Steps / XLA Modules lanes carry
    # markers that span whole calls and would double-count everything)
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

    # SELF time: within each track, nested events double-count their
    # parents — sort by (start, -dur) and subtract each event's duration
    # from the enclosing event on a stack.
    tracks = defaultdict(list)
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and (ev["pid"], ev.get("tid")) in ops_tracks:
            tracks[(ev["pid"], ev.get("tid"))].append(
                (ev["ts"], -ev.get("dur", 0.0), ev["name"]))
    agg = defaultdict(float)
    total = 0.0
    for evs in tracks.values():
        evs.sort()
        stack = []  # (end_ts, name, self_dur_accum_index)
        selfs = []
        for ts, ndur, name in evs:
            dur = -ndur
            while stack and stack[-1][0] <= ts + 1e-9:
                stack.pop()
            if stack:
                i = stack[-1][2]
                selfs[i][1] -= dur
            selfs.append([name, dur])
            stack.append((ts + dur, name, len(selfs) - 1))
        for name, sdur in selfs:
            if sdur > 0:
                agg[name] += sdur
                total += sdur
    print(f"# lanes: { {p: names[p] for p in dev_pids} }")
    print(f"# total device SELF time: {total/1e3/3:.2f} ms per call (3 calls)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{dur/1e3/3:9.3f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
