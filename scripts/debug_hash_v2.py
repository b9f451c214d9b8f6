#!/usr/bin/env python
"""Minimal on-chip repro for the PARQ_DROPOUT_HASH=v2 TPU fault seen in
the r5 suite (train_hash_v2.log: UNAVAILABLE device error at run time;
interpret mode passes). Runs the flash forward alone at the training
shape with dropout>0 under v1 then v2 and compares to interpret mode."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    which = sys.argv[1] if len(sys.argv) > 1 else "v2"
    os.environ["PARQ_DROPOUT_HASH"] = which
    from parq_tpu.kernels.cross_attention_pallas import flash_cross_attention

    rng = np.random.RandomState(0)
    # training fold shape: q-tile 256, block_k 1440, grouped seeds
    B, H, Q, D, N = 2, 4, 256, 256, 2880
    q = jnp.asarray(rng.randn(B, H, Q, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, N, H * D) * 0.2, jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N, H * D), jnp.bfloat16)
    seeds = jnp.asarray([123], jnp.int32)

    out = flash_cross_attention(q, k, v, block_k=1440,
                                dropout_rate=0.1, dropout_seed=seeds)
    out = jax.block_until_ready(out)
    print(f"{which}: on-chip OK, mean={float(jnp.mean(out.astype(jnp.float32))):.6f}")

    ref = flash_cross_attention(q, k, v, block_k=1440,
                                dropout_rate=0.1, dropout_seed=seeds,
                                interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2)
    print(f"{which}: TPU == interpret")


if __name__ == "__main__":
    main()
