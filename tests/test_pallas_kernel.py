"""Pallas fused kernels vs XLA reference implementations
(interpret mode on CPU; the same code compiles on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from parq_tpu.geometry import Camera, Pose
from parq_tpu.kernels import pixel_aligned_features_pallas
from parq_tpu.kernels.cross_attention_pallas import (
    cross_attention_reference, flash_cross_attention)
from parq_tpu.ops.pixel_align import pixel_aligned_features


def setup(rng, B=2, T=3, H=6, W=8, C=128, Q=16):
    feats = rng.randn(B, T, H, W, C).astype(np.float32)
    cam = Camera(jnp.broadcast_to(
        Camera.from_params(float(W), float(H), 4.0, 4.0, W / 2, H / 2).data,
        (B, T, 6)))
    # slight per-view rotation/translation
    poses = []
    for t in range(T):
        th = 0.1 * t
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        poses.append(np.concatenate([R.reshape(9), [0.1 * t, 0, 0]]))
    Tcl = Pose(jnp.broadcast_to(jnp.asarray(np.stack(poses), jnp.float32),
                                (B, T, 12)))
    # queries spread in front, some projecting out of bounds
    q = rng.rand(B, Q, 3).astype(np.float32) * np.array([6, 4, 2],
                                                        np.float32)
    q = q - np.array([3, 2, 0], np.float32) + np.array([0, 0, 1.5],
                                                       np.float32)
    return jnp.asarray(feats), jnp.asarray(q), Tcl, cam, (W, H)


def test_pallas_matches_xla_reference(rng):
    feats, q, Tcl, cam, fs = setup(rng)
    ref, ref_im, ref_valid = pixel_aligned_features(feats, q, Tcl, cam, fs)
    # force=True: without it the f32 inputs delegate straight to the XLA
    # reference and the test is vacuous (round-1 gap)
    got, got_im, got_valid = pixel_aligned_features_pallas(feats, q, Tcl,
                                                           cam, fs,
                                                           force=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(ref_im),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_valid),
                                  np.asarray(ref_valid))


def test_pallas_gradients_match_reference(rng):
    feats, q, Tcl, cam, fs = setup(rng, B=1, T=2, H=4, W=8, C=32, Q=8)

    def loss_pallas(feats, q):
        out, _, _ = pixel_aligned_features_pallas(feats, q, Tcl, cam, fs,
                                                  force=True)
        return jnp.sum(out ** 2)

    def loss_ref(feats, q):
        out, _, _ = pixel_aligned_features(feats, q, Tcl, cam, fs)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(feats, q)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(feats, q)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_cross_attention_matches_reference(rng):
    """Online-softmax kernel == exact softmax, incl. a KV length that is
    NOT a block multiple (exercises the pad masking)."""
    B, H, Q, D, N = 2, 2, 16, 128, 300
    q = rng.randn(B, H, Q, D).astype(np.float32)
    k = rng.randn(B, H, N, D).astype(np.float32) * 0.3
    v = rng.randn(B, H, N, D).astype(np.float32)
    got = flash_cross_attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), block_k=128, interpret=True)
    want = cross_attention_reference(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_cross_attention_matches_flax(rng):
    """Kernel output == flax nn.dot_product_attention (the round-1 decoder
    path) on the same q/k/v, deterministic."""
    import flax.linen as nn
    B, H, Q, D, N = 1, 2, 8, 128, 256
    q = rng.randn(B, Q, H, D).astype(np.float32)
    k = rng.randn(B, N, H, D).astype(np.float32) * 0.2
    v = rng.randn(B, N, H, D).astype(np.float32)
    want = nn.dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), deterministic=True)
    got = flash_cross_attention(
        jnp.asarray(q).transpose(0, 2, 1, 3),
        jnp.asarray(k).transpose(0, 2, 1, 3),
        jnp.asarray(v).transpose(0, 2, 1, 3),
        block_k=128, interpret=True).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_cross_attention_bf16(rng):
    """bf16 inputs (the production dtype) stay close to the f32 oracle."""
    B, H, Q, D, N = 1, 1, 8, 128, 384
    q = rng.randn(B, H, Q, D).astype(np.float32)
    k = rng.randn(B, H, N, D).astype(np.float32) * 0.3
    v = rng.randn(B, H, N, D).astype(np.float32)
    got = flash_cross_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), block_k=128, interpret=True)
    want = cross_attention_reference(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=3e-2)


def test_pallas_all_invalid_queries(rng):
    feats, q, Tcl, cam, fs = setup(rng, B=1, T=2, H=4, W=8, C=32, Q=4)
    q_behind = q.at[..., 2].set(-5.0)  # all behind camera
    got, _, valid = pixel_aligned_features_pallas(feats, q_behind, Tcl, cam,
                                                   fs, force=True)
    assert not bool(jnp.any(valid))
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


def test_flash_cross_attention_grads_match_reference(rng):
    """Custom flash VJP (recompute-from-lse backward) == autodiff of the
    exact softmax, incl. a non-block-multiple KV length."""
    B, H, Q, D, N = 1, 2, 8, 128, 300
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))

    def loss_kernel(q, k, v):
        o = flash_cross_attention(q, k, v, block_k=128, interpret=True)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(cross_attention_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_flash_nc_layout_matches_reference(rng):
    """Zero-copy (B, N, H·D) K/V layout (NT in-kernel matmul, no padding,
    partial last block masked) == exact softmax, values AND grads."""
    B, H, Q, D, N = 2, 2, 16, 128, 300   # N % block_k != 0
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    k_nc = jnp.swapaxes(k, 1, 2).reshape(B, N, H * D)
    v_nc = jnp.swapaxes(v, 1, 2).reshape(B, N, H * D)

    got = flash_cross_attention(q, k_nc, v_nc, block_k=128, interpret=True)
    want = cross_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss_nc(q, k_nc, v_nc):
        o = flash_cross_attention(q, k_nc, v_nc, block_k=128,
                                  interpret=True)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(cross_attention_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_nc, argnums=(0, 1, 2))(q, k_nc, v_nc)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g2_nc = (g2[0],
             jnp.swapaxes(g2[1], 1, 2).reshape(B, N, H * D),
             jnp.swapaxes(g2[2], 1, 2).reshape(B, N, H * D))
    for a, b in zip(g1, g2_nc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_flash_nc_grouped_seeds_dropout(rng):
    """nc-layout dropout: folded grouped-seed call draws the same masks as
    the equivalent per-tile calls (the batched-grad path's contract)."""
    B, H, Q, D, N = 1, 2, 16, 128, 256
    G = 2
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k_nc = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32) * 0.3)
    v_nc = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32))
    seeds = jnp.asarray([17, 23], jnp.int32)

    folded = flash_cross_attention(q, k_nc, v_nc, block_k=128,
                                   dropout_rate=0.3, dropout_seed=seeds,
                                   interpret=True)
    for g in range(G):
        tile = flash_cross_attention(
            q[:, :, g * (Q // G):(g + 1) * (Q // G)], k_nc, v_nc,
            block_k=128, dropout_rate=0.3, dropout_seed=seeds[g],
            interpret=True)
        np.testing.assert_allclose(
            np.asarray(folded[:, :, g * (Q // G):(g + 1) * (Q // G)]),
            np.asarray(tile), atol=2e-5)


def test_dropout_mask_invariant_to_block_split(rng):
    """The in-kernel dropout draws depend only on (seed, head, tile row,
    GLOBAL kv column) — NOT on the kv-block split. The batched-grad
    training path relies on this: the trajectory pass and the folded
    precomputed-backward run with different block_k. Regression for a bug
    where grid-position seeding made fwd (block 1440) and bwd (block 1280)
    silently disagree at release shapes (small test shapes clamp both to
    the same block and could not catch it)."""
    from parq_tpu.kernels.cross_attention_pallas import (
        flash_cross_attention_fwd_lse, flash_cross_attention_precomputed)
    B, H, Q, D, N = 1, 2, 16, 128, 700
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k_nc = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32) * 0.3)
    v_nc = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32))
    seed = jnp.asarray([42], jnp.int32)

    # forward output itself must be block-split invariant under dropout
    o_a = flash_cross_attention(q, k_nc, v_nc, block_k=128,
                                dropout_rate=0.25, dropout_seed=seed,
                                interpret=True)
    o_b = flash_cross_attention(q, k_nc, v_nc, block_k=256,
                                dropout_rate=0.25, dropout_seed=seed,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(o_a), np.asarray(o_b), atol=2e-5)

    # phase-1 fwd at block 256 + precomputed backward at block 128 ==
    # self-consistent grads at block 128
    o, lse = flash_cross_attention_fwd_lse(
        q, k_nc, v_nc, block_k=256, dropout_rate=0.25, dropout_seed=seed,
        interpret=True)

    def loss_pre(q, k, v):
        out = flash_cross_attention_precomputed(
            q, k, v, jax.lax.stop_gradient(o), jax.lax.stop_gradient(lse),
            block_k=128, dropout_rate=0.25, dropout_seed=seed,
            interpret=True)
        return jnp.sum(out ** 2)

    def loss_direct(q, k, v):
        out = flash_cross_attention(q, k, v, block_k=128,
                                    dropout_rate=0.25, dropout_seed=seed,
                                    interpret=True)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_pre, argnums=(0, 1, 2))(q, k_nc, v_nc)
    g2 = jax.grad(loss_direct, argnums=(0, 1, 2))(q, k_nc, v_nc)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_fast_sampling_path_values_and_grads(rng):
    """pixel_aligned_features_fast (XLA-gather fwd + Pallas matmul bwd for
    d(memory)) == the pure-XLA reference in both values and gradients."""
    from parq_tpu.kernels import pixel_aligned_features_fast

    feats, q, Tcl, cam, fs = setup(rng, B=2, T=2, H=4, W=8, C=32, Q=8)

    ref, ref_im, ref_valid = pixel_aligned_features(feats, q, Tcl, cam, fs)
    got, got_im, got_valid = pixel_aligned_features_fast(
        feats, q, Tcl, cam, fs, force=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_valid),
                                  np.asarray(ref_valid))

    def loss_fast(feats, q):
        out, _, _ = pixel_aligned_features_fast(feats, q, Tcl, cam, fs,
                                                force=True)
        return jnp.sum(out ** 2)

    def loss_ref(feats, q):
        out, _, _ = pixel_aligned_features(feats, q, Tcl, cam, fs)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_fast, argnums=(0, 1))(feats, q)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(feats, q)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_grouped_seeds_match_per_tile_calls(rng):
    """A folded call with a (G,) seed vector draws bit-identical dropout to
    G separate per-tile calls — the decoder's batched-grad path contract —
    and the folded backward equals the per-tile backwards."""
    B, H, Q0, D, N, G = 2, 2, 16, 128, 384, 4
    q = jnp.asarray(rng.randn(B, H, G * Q0, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    seeds = jnp.arange(1, G + 1, dtype=jnp.int32)

    folded = flash_cross_attention(q, k, v, block_k=128, dropout_rate=0.3,
                                   dropout_seed=seeds, interpret=True)
    per_tile = jnp.concatenate([
        flash_cross_attention(q[:, :, g * Q0:(g + 1) * Q0], k, v,
                              block_k=128, dropout_rate=0.3,
                              dropout_seed=seeds[g], interpret=True)
        for g in range(G)], axis=2)
    np.testing.assert_array_equal(np.asarray(folded), np.asarray(per_tile))
    # dropout is live
    nodrop = flash_cross_attention(q, k, v, block_k=128, interpret=True)
    assert float(jnp.abs(folded - nodrop).max()) > 1e-2

    def loss_folded(q, k, v):
        o = flash_cross_attention(q, k, v, block_k=128, dropout_rate=0.3,
                                  dropout_seed=seeds, interpret=True)
        return jnp.sum(o ** 2)

    def loss_per_tile(q, k, v):
        o = jnp.concatenate([
            flash_cross_attention(q[:, :, g * Q0:(g + 1) * Q0], k, v,
                                  block_k=128, dropout_rate=0.3,
                                  dropout_seed=seeds[g], interpret=True)
            for g in range(G)], axis=2)
        return jnp.sum(o ** 2)

    gf = jax.grad(loss_folded, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss_per_tile, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_flash_q_tile_split_matches_single_tile(rng):
    """q_tile grid-splitting (no dropout) is numerically identical to the
    single-tile kernel."""
    B, H, Q, D, N = 1, 2, 64, 128, 300
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    a = flash_cross_attention(q, k, v, block_k=128, interpret=True)
    b = flash_cross_attention(q, k, v, block_k=128, q_tile=16,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flash_kv_fused_matches_separate(rng):
    """Eval-only fused (B, N, H·2D) head-INTERLEAVED K/V buffer (one
    projection matmul; the kernel fetches a head's K and V in one block
    DMA) == the separate-K/V call bit-for-bit, including a masked partial
    last block."""
    from parq_tpu.kernels.cross_attention_pallas import (
        flash_cross_attention_kv_fused)
    B, H, Q, D, N = 2, 4, 16, 128, 300   # N % block_k != 0
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32))
    kv = jnp.stack([k.reshape(B, N, H, D), v.reshape(B, N, H, D)],
                   axis=3).reshape(B, N, 2 * H * D)

    want = flash_cross_attention(q, k, v, n_valid=N, block_k=128,
                                 interpret=True)
    got = flash_cross_attention_kv_fused(q, kv, n_valid=N, block_k=128,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_flash_kv_fused_train_grads_match_split(rng):
    """The differentiable fused-K/V path (kv_fused_train): output AND
    gradients == the separate-K/V flash path, with dKV handed back in the
    fused head-interleaved layout (re-split here for comparison). Covers a
    masked partial last block and a grouped-seed dropout call — the exact
    contracts the fused TRAIN projections rely on."""
    from parq_tpu.kernels.cross_attention_pallas import (
        flash_cross_attention_kv_fused_train)
    B, H, Q, D, N = 2, 4, 16, 128, 300   # N % block_k != 0
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32))
    kv = jnp.stack([k.reshape(B, N, H, D), v.reshape(B, N, H, D)],
                   axis=3).reshape(B, N, 2 * H * D)

    def split_kv(dkv):
        x = dkv.reshape(B, N, H, 2, D)
        return x[:, :, :, 0].reshape(B, N, H * D), \
            x[:, :, :, 1].reshape(B, N, H * D)

    for rate, seeds in [(0.0, None), (0.3, jnp.asarray([17, 23], jnp.int32))]:
        def loss_split(q, k, v):
            o = flash_cross_attention(q, k, v, n_valid=N, block_k=128,
                                      dropout_rate=rate, dropout_seed=seeds,
                                      interpret=True)
            return jnp.sum(o ** 2)

        def loss_fused(q, kv):
            o = flash_cross_attention_kv_fused_train(
                q, kv, n_valid=N, block_k=128, dropout_rate=rate,
                dropout_seed=seeds, interpret=True)
            return jnp.sum(o ** 2)

        dq_s, dk_s, dv_s = jax.grad(loss_split, argnums=(0, 1, 2))(q, k, v)
        dq_f, dkv_f = jax.grad(loss_fused, argnums=(0, 1))(q, kv)
        dk_f, dv_f = split_kv(dkv_f)
        np.testing.assert_allclose(np.asarray(dq_f), np.asarray(dq_s),
                                   atol=5e-4, rtol=1e-3, err_msg=f"dq {rate}")
        np.testing.assert_allclose(np.asarray(dk_f), np.asarray(dk_s),
                                   atol=5e-4, rtol=1e-3, err_msg=f"dk {rate}")
        np.testing.assert_allclose(np.asarray(dv_f), np.asarray(dv_s),
                                   atol=5e-4, rtol=1e-3, err_msg=f"dv {rate}")


def test_flash_kv_fused_precomputed_matches_full(rng):
    """Fused trajectory pass (fwd_lse, zero-grad) + fused precomputed
    backward == the full fused custom VJP, with DIFFERENT block_k between
    the two passes (the batched-grad path's block-split contract), dropout
    on."""
    from parq_tpu.kernels.cross_attention_pallas import (
        flash_cross_attention_kv_fused_fwd_lse,
        flash_cross_attention_kv_fused_precomputed,
        flash_cross_attention_kv_fused_train)
    B, H, Q, D, N = 1, 2, 16, 128, 700
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32))
    kv = jnp.stack([k.reshape(B, N, H, D), v.reshape(B, N, H, D)],
                   axis=3).reshape(B, N, 2 * H * D)
    seeds = jnp.asarray([41, 43], jnp.int32)

    o, lse = flash_cross_attention_kv_fused_fwd_lse(
        q, kv, block_k=512, dropout_rate=0.25, dropout_seed=seeds,
        interpret=True)

    def loss_pre(q, kv):
        out = flash_cross_attention_kv_fused_precomputed(
            q, kv, o, lse, block_k=128, dropout_rate=0.25,
            dropout_seed=seeds, interpret=True)
        return jnp.sum(out ** 2)

    def loss_full(q, kv):
        out = flash_cross_attention_kv_fused_train(
            q, kv, block_k=128, dropout_rate=0.25, dropout_seed=seeds,
            interpret=True)
        return jnp.sum(out ** 2)

    # the precomputed forward must equal the full forward bit-for-bit
    o_full = flash_cross_attention_kv_fused_train(
        q, kv, block_k=512, dropout_rate=0.25, dropout_seed=seeds,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(o), np.asarray(o_full))

    g_pre = jax.grad(loss_pre, argnums=(0, 1))(q, kv)
    g_full = jax.grad(loss_full, argnums=(0, 1))(q, kv)
    for a, b, nm in zip(g_pre, g_full, ("dq", "dkv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5, err_msg=nm)


def _keep_mask_v2_numpy(seed, bh, QT, BK, col0, rate):
    """Numpy spec of the v2 (rank-1 + one-round finalizer) dropout hash —
    must stay in lockstep with _keep_mask's v2 branch."""
    u32 = np.uint32
    with np.errstate(over="ignore"):
        h0 = (u32(seed) * u32(2654435761)) ^ (u32(bh) * u32(2246822519))
        r = np.arange(QT, dtype=np.uint32).reshape(-1, 1)
        c = (np.arange(BK, dtype=np.uint32) + u32(col0)).reshape(1, -1)
        rv = (h0 + r) * u32(3266489917)
        rv = rv ^ (rv >> u32(15))
        rv = rv * u32(0x85EBCA6B)
        cv = c * u32(668265263)
        cv = cv ^ (cv >> u32(13))
        cv = cv * u32(0xC2B2AE35)
        h = rv + cv
        h = h ^ (h >> u32(16))
        h = h * u32(0x7FEB352D)
        bits = h ^ (h >> u32(15))
    thresh = np.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return bits >= thresh


def test_dropout_hash_v2_stats():
    """Statistical adequacy of the cheap v2 hash at the RELEASE folded
    backward shape (2048 rows x 14400 kv columns, rate 0.1): keep rate,
    row/col rate spread at the binomial sigma, and neighbor / cross-(b,h)
    / cross-seed joint-drop rates at independence."""
    rate = 0.1
    QT, BK = 2048, 14400
    m = _keep_mask_v2_numpy(12345, 7, QT, BK, 0, rate)
    assert abs(m.mean() - (1 - rate)) < 5e-4
    binom_row = np.sqrt(rate * (1 - rate) / BK)
    binom_col = np.sqrt(rate * (1 - rate) / QT)
    assert abs(m.mean(1).std() - binom_row) < 0.25 * binom_row
    assert abs(m.mean(0).std() - binom_col) < 0.25 * binom_col
    d = ~m
    indep = d.mean() ** 2
    adj_col = (d[:, :-1] & d[:, 1:]).mean()
    adj_row = (d[:-1, :] & d[1:, :]).mean()
    assert abs(adj_col - indep) < 0.05 * indep
    assert abs(adj_row - indep) < 0.05 * indep
    m_bh = _keep_mask_v2_numpy(12345, 8, QT, BK, 0, rate)
    m_seed = _keep_mask_v2_numpy(54321, 7, QT, BK, 0, rate)
    assert abs((d & ~m_bh).mean() - indep) < 0.05 * indep
    assert abs((d & ~m_seed).mean() - indep) < 0.05 * indep


def test_dropout_hash_v2_kernel_contracts(rng, monkeypatch):
    """With PARQ_DROPOUT_HASH=v2 the kernel contracts still hold:
    block-split-invariant forward, and the v2 masks differ from v1 (the
    knob is actually live)."""
    monkeypatch.setenv("PARQ_DROPOUT_HASH", "v2")
    B, H, Q, D, N = 1, 2, 16, 128, 700
    q = jnp.asarray(rng.randn(B, H, Q, D).astype(np.float32))
    k_nc = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32) * 0.3)
    v_nc = jnp.asarray(rng.randn(B, N, H * D).astype(np.float32))
    seed = jnp.asarray([42], jnp.int32)
    o_a = flash_cross_attention(q, k_nc, v_nc, block_k=128,
                                dropout_rate=0.25, dropout_seed=seed,
                                interpret=True)
    o_b = flash_cross_attention(q, k_nc, v_nc, block_k=256,
                                dropout_rate=0.25, dropout_seed=seed,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(o_a), np.asarray(o_b), atol=2e-5)
    monkeypatch.setenv("PARQ_DROPOUT_HASH", "v1")
    o_v1 = flash_cross_attention(q, k_nc, v_nc, block_k=128,
                                 dropout_rate=0.25, dropout_seed=seed,
                                 interpret=True)
    assert not np.allclose(np.asarray(o_a), np.asarray(o_v1), atol=1e-6)


def test_flash_fold_log2e_matches_reference(rng, monkeypatch):
    """PARQ_FOLD_LOG2E=1 (base-2 logits via the q pre-scale — the eval-only
    VPU lever) stays within f32-rounding tolerance of the exact-softmax
    oracle; the fold only applies to det/no-LSE forwards by construction."""
    monkeypatch.setenv("PARQ_FOLD_LOG2E", "1")
    B, H, Q, D, N = 2, 2, 16, 128, 300
    q = rng.randn(B, H, Q, D).astype(np.float32)
    k = rng.randn(B, H, N, D).astype(np.float32) * 0.3
    v = rng.randn(B, H, N, D).astype(np.float32)
    got = flash_cross_attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), block_k=128, interpret=True)
    want = cross_attention_reference(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v))
    # NOT bit-exact (LOG2E isn't dyadic — q rounds once pre-matmul); the
    # tolerance covers the extra rounding of the f32 q pre-scale
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_flash_static_shift_matches_reference(rng, monkeypatch):
    """PARQ_ATTN_STATICMAX (det-forward softmax with a static exponent
    shift instead of the running max) stays within f32 tolerance of the
    exact oracle — incl. a partial last block (NEG_INF pad → exact 0)."""
    monkeypatch.setenv("PARQ_FOLD_LOG2E", "1")
    monkeypatch.setenv("PARQ_ATTN_STATICMAX", "80")
    B, H, Q, D, N = 2, 2, 16, 128, 300
    q = rng.randn(B, H, Q, D).astype(np.float32)
    k = rng.randn(B, H, N, D).astype(np.float32) * 0.3
    v = rng.randn(B, H, N, D).astype(np.float32)
    got = flash_cross_attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), block_k=128, interpret=True)
    want = cross_attention_reference(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_sampler_transposed_w_matches(rng, monkeypatch):
    """PARQ_SAMPLER_WT=1 (sublane-stacked transposed W build + TN
    contraction) == the lane-concat form, both against the XLA reference
    path (same compares/multiplies, transposed layout only)."""
    feats, q, Tcl, cam, fs = setup(rng, B=2, T=3, H=6, W=8, C=32, Q=8)
    from parq_tpu.kernels.pixel_align_pallas import (
        pixel_aligned_features_pallas)
    base = pixel_aligned_features_pallas(feats, q, Tcl, cam, fs, force=True)
    monkeypatch.setenv("PARQ_SAMPLER_WT", "1")
    got = pixel_aligned_features_pallas(feats, q, Tcl, cam, fs, force=True)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(base)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
