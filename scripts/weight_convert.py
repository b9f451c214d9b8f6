#!/usr/bin/env python
"""Convert a torch PARQ checkpoint (parq_release.ckpt layout) to orbax.

Offline equivalent of the reference's utils/weight_convert.py step, going
torch → flax/orbax instead of internal → torch. The key mapping lives in
parq_tpu/io/torch_convert.py.

Usage:
    python scripts/weight_convert.py --torch-ckpt parq_release.ckpt \
        --out ./checkpoint/parq_release_orbax
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--no-share-weights", action="store_true")
    args = ap.parse_args()

    import jax
    import orbax.checkpoint as ocp
    from parq_tpu.io import load_parq_checkpoint

    tree = load_parq_checkpoint(args.torch_ckpt, num_heads=args.heads,
                                share_weights=not args.no_share_weights)
    tree = jax.tree_util.tree_map(lambda x: x, tree)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(args.out), tree)
    ckpt.wait_until_finished()
    n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
    print(f"converted {n/1e6:.1f}M params -> {args.out}")


if __name__ == "__main__":
    main()
