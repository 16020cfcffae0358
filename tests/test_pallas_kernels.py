"""Pallas kernel correctness vs the XLA formulations (interpret mode on CPU;
the same kernels compile natively on TPU)."""
import numpy as np
import jax.numpy as jnp

from sam6d_tpu.ops.sampling import farthest_point_sample
from sam6d_tpu.kernels.fps import farthest_point_sample_pallas


def test_fps_pallas_matches_xla(rng):
    pts = rng.randn(2, 100, 3).astype(np.float32)
    want = np.asarray(farthest_point_sample(jnp.array(pts), 16))
    got = np.asarray(farthest_point_sample_pallas(jnp.array(pts), 16,
                                                  interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_valid_mask(rng):
    pts = rng.randn(1, 64, 3).astype(np.float32)
    pts[0, 40:] += 100.0
    mask = np.zeros((1, 64), bool)
    mask[0, :40] = True
    got = np.asarray(farthest_point_sample_pallas(
        jnp.array(pts), 8, jnp.array(mask), interpret=True))
    assert (got < 40).all()
    want = np.asarray(farthest_point_sample(jnp.array(pts), 8, jnp.array(mask)))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_padded_n(rng):
    # N not a lane multiple exercises the padding path
    pts = rng.randn(1, 77, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample_pallas(jnp.array(pts), 8,
                                                  interpret=True))
    want = np.asarray(farthest_point_sample(jnp.array(pts), 8))
    np.testing.assert_array_equal(got, want)


def test_flash_attention_relpos_matches_reference(rng):
    import jax
    from sam6d_tpu.kernels.flash_attention import flash_attention_relpos
    B, heads, H, W, hd = 1, 2, 8, 8, 16
    N = H * W
    q = rng.randn(B, heads, N, hd).astype(np.float32) * 0.5
    k = rng.randn(B, heads, N, hd).astype(np.float32) * 0.5
    v = rng.randn(B, heads, N, hd).astype(np.float32)
    Rh = rng.randn(2 * H - 1, hd).astype(np.float32) * 0.1
    Rw = rng.randn(2 * W - 1, hd).astype(np.float32) * 0.1

    # reference formulation (image_encoder.py:224-240, 325-361)
    idx_h = np.arange(H)[:, None] - np.arange(H)[None, :] + H - 1
    idx_w = np.arange(W)[:, None] - np.arange(W)[None, :] + W - 1
    Rh_g = Rh[idx_h]
    Rw_g = Rw[idx_w]
    qg = q.reshape(B, heads, H, W, hd)
    rel_h = np.einsum("bnhwc,hkc->bnhwk", qg, Rh_g)
    rel_w = np.einsum("bnhwc,wkc->bnhwk", qg, Rw_g)
    attn = np.einsum("bhnc,bhmc->bhnm", q * hd**-0.5, k)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(B, heads, N, N)
    attn = attn + bias
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    want = np.einsum("bhnm,bhmc->bhnc", attn, v)

    got = np.asarray(flash_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(Rh),
        jnp.asarray(Rw), (H, W), block_q=32, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_attention_relpos_windowed_unaligned(rng):
    """N = 7*7 = 49 exercises the key-padding/validity-column path (SAM's
    windowed blocks run at N=196, also not a lane multiple)."""
    from sam6d_tpu.kernels.flash_attention import flash_attention_relpos
    B, heads, H, W, hd = 2, 3, 7, 7, 16
    N = H * W
    q = rng.randn(B, heads, N, hd).astype(np.float32) * 0.5
    k = rng.randn(B, heads, N, hd).astype(np.float32) * 0.5
    v = rng.randn(B, heads, N, hd).astype(np.float32)
    Rh = rng.randn(2 * H - 1, hd).astype(np.float32) * 0.1
    Rw = rng.randn(2 * W - 1, hd).astype(np.float32) * 0.1

    idx_h = np.arange(H)[:, None] - np.arange(H)[None, :] + H - 1
    idx_w = np.arange(W)[:, None] - np.arange(W)[None, :] + W - 1
    qg = q.reshape(B, heads, H, W, hd)
    rel_h = np.einsum("bnhwc,hkc->bnhwk", qg, Rh[idx_h])
    rel_w = np.einsum("bnhwc,wkc->bnhwk", qg, Rw[idx_w])
    attn = np.einsum("bhnc,bhmc->bhnm", q * hd**-0.5, k)
    attn = attn + (rel_h[..., :, None] + rel_w[..., None, :]).reshape(
        B, heads, N, N)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    want = np.einsum("bhnm,bhmc->bhnc", attn, v)

    got = np.asarray(flash_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(Rh),
        jnp.asarray(Rw), (H, W), interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_attention_matches_softmax(rng):
    """Arbitrary-N fused attention (DINOv2 at 257 tokens, MAE ViT at 197)."""
    from sam6d_tpu.kernels.flash_attention import fused_attention
    B, heads, N, hd = 2, 4, 61, 32
    scale = hd ** -0.5
    q = rng.randn(B, heads, N, hd).astype(np.float32) * 0.5
    k = rng.randn(B, heads, N, hd).astype(np.float32) * 0.5
    v = rng.randn(B, heads, N, hd).astype(np.float32)
    attn = np.einsum("bhnc,bhmc->bhnm", q * scale, k)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    want = np.einsum("bhnm,bhmc->bhnc", attn, v)
    got = np.asarray(fused_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_attention_small_matches_softmax(rng):
    """Short-trunk kernel (no HBM-side padding): odd N + hd 64, the
    DINOv2-L shape class."""
    from sam6d_tpu.kernels.flash_attention import fused_attention_small
    B, heads, N, hd = 2, 4, 57, 64
    scale = hd ** -0.5
    q = rng.randn(B, heads, N, hd).astype(np.float32) * 0.5
    k = rng.randn(B, heads, N, hd).astype(np.float32) * 0.5
    v = rng.randn(B, heads, N, hd).astype(np.float32)
    attn = np.einsum("bhnc,bhmc->bhnm", q * scale, k)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    want = np.einsum("bhnm,bhmc->bhnc", attn, v)
    got = np.asarray(fused_attention_small(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_attention_small_bf16_consistent(rng):
    """bf16 path: the kernel's softmax numerator and denominator use the
    SAME cast probabilities, so it matches a from-spec oracle that casts p
    to bf16 before both PV and the normalizer (ADVICE round 4)."""
    import ml_dtypes
    from sam6d_tpu.kernels.flash_attention import fused_attention_small
    B, heads, N, hd = 2, 4, 57, 64
    scale = hd ** -0.5
    q = (rng.randn(B, heads, N, hd) * 0.5).astype(ml_dtypes.bfloat16)
    k = (rng.randn(B, heads, N, hd) * 0.5).astype(ml_dtypes.bfloat16)
    v = rng.randn(B, heads, N, hd).astype(ml_dtypes.bfloat16)
    s = np.einsum("bhnc,bhmc->bhnm", q.astype(np.float32),
                  k.astype(np.float32)) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    pc = p.astype(ml_dtypes.bfloat16).astype(np.float32)
    l = pc.sum(-1, keepdims=True)
    want = np.einsum("bhnm,bhmc->bhnc", pc, v.astype(np.float32)) / l
    got = np.asarray(fused_attention_small(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        interpret=True)).astype(np.float32)
    # the only remaining divergence is the bf16 output round-off
    np.testing.assert_allclose(got, want, atol=8e-3)


def test_fused_attention_qkv_matches_softmax(rng):
    """Token-layout kernel: heads sliced from the fused qkv channels in
    VMEM. Odd N + hd 64 (DINOv2-L shape class), plus a B that forces
    bb < B so the grid path is exercised."""
    from sam6d_tpu.kernels.flash_attention import fused_attention_qkv
    B, heads, N, hd = 3, 4, 57, 64
    C = heads * hd
    scale = hd ** -0.5
    qkv = rng.randn(B, N, 3 * C).astype(np.float32) * 0.5
    q = qkv[..., :C].reshape(B, N, heads, hd)
    k = qkv[..., C:2 * C].reshape(B, N, heads, hd)
    v = qkv[..., 2 * C:].reshape(B, N, heads, hd)
    attn = np.einsum("bnhc,bmhc->bhnm", q * scale, k)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    want = np.einsum("bhnm,bmhc->bnhc", attn, v).reshape(B, N, C)
    got = np.asarray(fused_attention_qkv(
        jnp.asarray(qkv), heads, scale=scale, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_attention_qkv_bf16_consistent(rng):
    """bf16: numerator and denominator use the same cast probabilities
    (matching _small_kernel's ADVICE-round-4 semantics)."""
    import ml_dtypes
    from sam6d_tpu.kernels.flash_attention import fused_attention_qkv
    B, heads, N, hd = 2, 4, 57, 64
    C = heads * hd
    scale = hd ** -0.5
    qkv = (rng.randn(B, N, 3 * C) * 0.5).astype(ml_dtypes.bfloat16)
    f = qkv.astype(np.float32)
    q = f[..., :C].reshape(B, N, heads, hd)
    k = f[..., C:2 * C].reshape(B, N, heads, hd)
    v = f[..., 2 * C:].reshape(B, N, heads, hd)
    s = np.einsum("bnhc,bmhc->bhnm", q, k) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    pc = p.astype(ml_dtypes.bfloat16).astype(np.float32)
    l = pc.sum(-1, keepdims=True)
    want = (np.einsum("bhnm,bmhc->bnhc", pc, v) /
            l.transpose(0, 2, 1, 3)).reshape(B, N, C)
    got = np.asarray(fused_attention_qkv(
        jnp.asarray(qkv), heads, scale=scale, interpret=True)
        ).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=8e-3)


def test_vit_attention_flash_matches_einsum(rng):
    """Module-level: Attention(use_flash) == Attention(einsum path)."""
    import jax
    from sam6d_tpu.models.vit import Attention
    x = jnp.asarray(rng.randn(2, 19, 64).astype(np.float32))
    a0 = Attention(64, 4, use_flash=False)
    v = a0.init(jax.random.PRNGKey(0), x)
    want = np.asarray(a0.apply(v, x))
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(Attention(64, 4, use_flash=True).apply(v, x))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_two_scale_ball_query_pallas_matches_xla(rng):
    from sam6d_tpu.kernels.ball_query import two_scale_ball_query_pallas
    from sam6d_tpu.ops.ball_query import two_scale_ball_query

    xyz = rng.rand(2, 80, 3).astype(np.float32)
    new_xyz = rng.rand(2, 64, 3).astype(np.float32)
    i1, i2 = two_scale_ball_query_pallas(
        jnp.asarray(xyz), jnp.asarray(new_xyz), 0.2, 4, 0.4, 8,
        block_m=32, interpret=True)
    w1, w2 = two_scale_ball_query(0.2, 4, 0.4, 8,
                                  jnp.asarray(xyz), jnp.asarray(new_xyz))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(w2))


def test_mask_tail_block_matches_naive():
    """Layout-clean block tail == naive per-pixel computation, and the
    shared (rank-mode) variant == batched variant on broadcast input."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sam6d_tpu.kernels.mask_tail import (mask_tail_block,
                                             mask_tail_block_shared,
                                             _gelu_exact)

    rng = np.random.RandomState(0)
    B, N, K, C = 2, 64, 4, 32  # g=8, C4=8, C8=4
    z = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 0.5)
    b1 = jnp.asarray(rng.randn(C // 4).astype(np.float32) * 0.1)
    gam = jnp.asarray(rng.rand(C // 4).astype(np.float32) + 0.5)
    bet = jnp.asarray(rng.randn(C // 4).astype(np.float32) * 0.1)
    k2m = jnp.asarray(rng.randn(C // 4, 4 * (C // 8)).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.randn(C // 8).astype(np.float32) * 0.1)
    hyper = jnp.asarray(rng.randn(B, K, C // 8).astype(np.float32) * 0.3)

    got = mask_tail_block(z, b1, gam, bet, k2m, b2, hyper)
    assert got.shape == (B, 4 * K, 4 * N)

    # naive reference in (n, pq, rs, c) order
    x = z.reshape(B, N, 4, C // 4) + b1
    u = x.mean(-1, keepdims=True)
    s = ((x - u) ** 2).mean(-1, keepdims=True)
    x = _gelu_exact((x - u) / jnp.sqrt(s + 1e-6) * gam + bet)
    y = jnp.einsum("bnpc,cd->bnpd", x, k2m).reshape(B, N, 4, 4, C // 8)
    y = _gelu_exact(y + b2)
    want = jnp.einsum("bnprc,bkc->bkrnp", y, hyper).reshape(B, 4 * K, 4 * N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # shared variant == batched variant with identical src
    z0 = z[:1]
    got_sh = mask_tail_block_shared(z0, b1, gam, bet, k2m, b2, hyper)
    want_b = mask_tail_block(jnp.broadcast_to(z0, z.shape), b1, gam, bet,
                             k2m, b2, hyper)
    np.testing.assert_allclose(np.asarray(got_sh), np.asarray(want_b),
                               atol=2e-5)


def test_mask_decoder_block_masks_matches_rowmajor():
    """MaskDecoder(block_masks=True) == row-major block path after the
    layout inversion, in both exact and rank_only modes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sam6d_tpu.models.sam import MaskDecoder, block_masks_to_rowmajor

    rng = np.random.RandomState(1)
    g, C = 8, 32
    dec_rm = MaskDecoder(transformer_dim=C, twoway_num_heads=4,
                         twoway_mlp_dim=64, block_layout=True)
    dec_bm = MaskDecoder(transformer_dim=C, twoway_num_heads=4,
                         twoway_mlp_dim=64, block_layout=True,
                         block_masks=True)
    emb = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    sparse = jnp.asarray(rng.randn(3, 2, C).astype(np.float32) * 0.3)
    dense = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    v = dec_rm.init(jax.random.PRNGKey(0), emb, pe, sparse, dense)
    for rank_only in (False, True):
        want_m, want_iou = dec_rm.apply(v, emb, pe, sparse, dense,
                                        rank_only=rank_only)
        got_m, got_iou = dec_bm.apply(v, emb, pe, sparse, dense,
                                      rank_only=rank_only)
        np.testing.assert_allclose(
            np.asarray(block_masks_to_rowmajor(got_m)),
            np.asarray(want_m), atol=3e-5)
        np.testing.assert_allclose(np.asarray(got_iou),
                                   np.asarray(want_iou), atol=3e-5)
