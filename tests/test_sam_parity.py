"""SAM component parity: flax vs torch oracles through the converter."""
import pytest
import numpy as np
import torch
import jax
import jax.numpy as jnp

from tests.torch_sam_ref import (
    TorchSAMEncoder,
    TorchPromptEncoder,
    TorchMaskDecoder,
)
from sam6d_tpu.models.sam import SAMImageEncoder, PromptEncoder, MaskDecoder
from sam6d_tpu.weights.convert_sam import (
    convert_sam_encoder,
    convert_sam_prompt_encoder,
    convert_sam_mask_decoder,
)

torch.manual_seed(2)


pytestmark = pytest.mark.core  # sub-5-min correctness core


def test_sam_encoder_parity(rng):
    tref = TorchSAMEncoder(img=64, patch=16, dim=32, depth=3, heads=4,
                           window=3, global_idx=(1,), out_ch=16).eval()
    params = convert_sam_encoder(tref.state_dict_flat(), depth=3, grid=4)
    enc = SAMImageEncoder(img_size=64, patch_size=16, embed_dim=32, depth=3,
                          num_heads=4, window_size=3, global_attn_indexes=(1,),
                          out_chans=16)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tref(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = enc.apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), atol=3e-4)
    # unrolled lowering (encoder_unroll): same param tree, same outputs
    enc_u = SAMImageEncoder(img_size=64, patch_size=16, embed_dim=32, depth=3,
                            num_heads=4, window_size=3,
                            global_attn_indexes=(1,), out_chans=16,
                            unroll=True)
    got_u = enc_u.apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(got),
                               atol=1e-5)
    # carried-window layout (encoder_carry_windows): same param tree,
    # same outputs — pad tokens re-zeroed per block exactly where the
    # reference re-pads with zeros (grid 4, window 3 -> pad 4->6 active)
    enc_c = SAMImageEncoder(img_size=64, patch_size=16, embed_dim=32,
                            depth=3, num_heads=4, window_size=3,
                            global_attn_indexes=(1,), out_chans=16,
                            carry_windows=True)
    got_c = enc_c.apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(got),
                               atol=1e-5)


def test_prompt_encoder_parity(rng):
    tref = TorchPromptEncoder(dim=32, input_size=(64, 64)).eval()
    params = convert_sam_prompt_encoder(tref.state_dict_flat())
    pe = PromptEncoder(embed_dim=32, input_image_size=(64, 64),
                       image_embedding_size=(4, 4))
    pts = (rng.rand(5, 1, 2) * 64).astype(np.float32)
    lbl = np.ones((5, 1), np.int32)
    with torch.no_grad():
        want = tref.embed_points(torch.from_numpy(pts), torch.from_numpy(lbl))
        want_dense = tref.dense_pe((4, 4))
    got = pe.apply({"params": params}, jnp.array(pts), jnp.array(lbl),
                   method="embed_points")
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)
    got_dense = pe.apply({"params": params}, method="dense_pe")
    np.testing.assert_allclose(np.asarray(got_dense), want_dense.numpy(), atol=2e-4)

    # box corners (reference _embed_boxes)
    boxes = (rng.rand(5, 4) * 64).astype(np.float32)
    with torch.no_grad():
        want_b = tref.embed_boxes(torch.from_numpy(boxes))
    got_b = pe.apply({"params": params}, jnp.array(boxes), method="embed_boxes")
    np.testing.assert_allclose(np.asarray(got_b), want_b.numpy(), atol=2e-4)

    # mask_downscaling (reference _embed_masks); input 4x the (4, 4) grid
    m = rng.randn(3, 16, 16).astype(np.float32)
    with torch.no_grad():
        want_m = tref.embed_masks(torch.from_numpy(m)[:, None])
    got_m = pe.apply({"params": params}, jnp.array(m[..., None]),
                     method="embed_masks")
    np.testing.assert_allclose(
        np.asarray(got_m), want_m.permute(0, 2, 3, 1).numpy(), atol=2e-4)

    # full forward: points + boxes (no pad point) + mask input
    with torch.no_grad():
        want_pts = tref.embed_points(torch.from_numpy(pts), torch.from_numpy(lbl))
    sparse, dense = pe.apply({"params": params}, jnp.array(pts),
                             jnp.array(lbl), jnp.array(boxes),
                             jnp.array(m[..., None]))
    assert sparse.shape == (5, 1 + 2, 32)  # 1 point (unpadded) + 2 corners
    np.testing.assert_allclose(np.asarray(sparse[:, 1:]), want_b.numpy(),
                               atol=2e-4)


def test_mask_decoder_parity(rng):
    tref = TorchMaskDecoder(dim=32, heads=4, mlp_dim=64).eval()
    params = convert_sam_mask_decoder(tref.state_dict_flat())
    dec = MaskDecoder(transformer_dim=32, twoway_num_heads=4, twoway_mlp_dim=64)
    H = W = 4
    img = rng.randn(H, W, 32).astype(np.float32)
    pe = rng.randn(H, W, 32).astype(np.float32)
    sparse = rng.randn(6, 2, 32).astype(np.float32)
    dense = rng.randn(H, W, 32).astype(np.float32)
    with torch.no_grad():
        want_m, want_iou = tref(*map(torch.from_numpy, (img, pe, sparse, dense)))
    got_m, got_iou = dec.apply({"params": params}, *map(jnp.array, (img, pe, sparse, dense)))
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(), atol=3e-4)


def test_skinny_attention_formulations_match_direct(rng):
    """DownsampleAttention's block-diagonal skinny routes (small-q /
    small-k with reassociated out_proj) and the shared-batch (Bk=1)
    broadcast forms all match the dense einsum fallback."""
    import jax
    import jax.numpy as jnp
    from sam6d_tpu.models.sam import DownsampleAttention

    C, heads = 64, 4
    attn = DownsampleAttention(C, heads, downsample_rate=2)

    def run(Nq, M, Bq, Bk):
        q = jnp.asarray(rng.randn(Bq, Nq, C).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.randn(Bk, M, C).astype(np.float32) * 0.3)
        v = jnp.asarray(rng.randn(Bk, M, C).astype(np.float32))
        variables = attn.init(jax.random.PRNGKey(0), q, k, v)
        got = attn.apply(variables, q, k, v)
        B = max(Bq, Bk)
        qf = jnp.broadcast_to(q, (B, Nq, C))
        kf = jnp.broadcast_to(k, (B, M, C))
        vf = jnp.broadcast_to(v, (B, M, C))
        # dense reference: same module on mid-sized shapes routes dense,
        # so compute the reference by slicing into mid-size? Instead use
        # explicit per-head einsum attention with the same params.
        p = variables["params"]

        def proj(name, x):
            return x @ p[name]["kernel"] + p[name]["bias"]
        d = C // 2
        hd = d // heads
        qq = (proj("q_proj", qf) / np.sqrt(hd)).reshape(B, Nq, heads, hd)
        kk = proj("k_proj", kf).reshape(B, M, heads, hd)
        vv = proj("v_proj", vf).reshape(B, M, heads, hd)
        a = jax.nn.softmax(jnp.einsum("bnhc,bmhc->bhnm", qq, kk), axis=-1)
        o = jnp.einsum("bhnm,bmhc->bnhc", a, vv).reshape(B, Nq, d)
        want = proj("out_proj", o)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    run(12, 512, 2, 2)    # small-q batched
    run(12, 512, 2, 1)    # small-q shared image side
    run(512, 12, 2, 2)    # small-k (reassociated out_proj)
    run(512, 12, 1, 2)    # small-k with shared q side (layer-1 i2t)
    run(64, 64, 2, 2)     # dense fallback
    run(64, 64, 1, 2)     # dense fallback, shared q


def test_mask_decoder_block_layout_matches_convtranspose(rng):
    """block_layout upscale (TPU inference path) == ConvTranspose path."""
    import jax
    import jax.numpy as jnp
    from sam6d_tpu.models.sam import MaskDecoder

    g, C = 8, 32
    dec = MaskDecoder(transformer_dim=C, twoway_num_heads=4,
                      twoway_mlp_dim=64, block_layout=False)
    emb = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    sparse = jnp.asarray(rng.randn(3, 2, C).astype(np.float32) * 0.3)
    dense = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    v = dec.init(jax.random.PRNGKey(0), emb, pe, sparse, dense)
    want_m, want_iou = dec.apply(v, emb, pe, sparse, dense)
    dec_b = MaskDecoder(transformer_dim=C, twoway_num_heads=4,
                        twoway_mlp_dim=64, block_layout=True)
    got_m, got_iou = dec_b.apply(v, emb, pe, sparse, dense)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_iou), np.asarray(want_iou),
                               atol=2e-5)


def test_mask_decoder_sel_channel_matches_full(rng):
    """sel_channel decode == the matching channel of the full decode, in
    both block-masks and row-major layouts."""
    import jax
    import jax.numpy as jnp
    from sam6d_tpu.models.sam import MaskDecoder

    g, C, B = 8, 32, 5
    emb = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    sparse = jnp.asarray(rng.randn(B, 2, C).astype(np.float32) * 0.3)
    dense = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    sel = jnp.asarray(rng.randint(0, 4, B).astype(np.int32))
    for block_masks in (False, True):
        dec = MaskDecoder(transformer_dim=C, twoway_num_heads=4,
                          twoway_mlp_dim=64, block_layout=True,
                          block_masks=block_masks)
        v = dec.init(jax.random.PRNGKey(0), emb, pe, sparse, dense)
        full_m, full_iou = dec.apply(v, emb, pe, sparse, dense)
        sel_m, sel_iou = dec.apply(v, emb, pe, sparse, dense,
                                   sel_channel=sel)
        np.testing.assert_allclose(np.asarray(sel_iou), np.asarray(full_iou),
                                   atol=1e-6)
        sel_np = np.asarray(sel)
        if block_masks:
            want = np.stack([np.asarray(full_m)[b, 4 * c:4 * c + 4]
                             for b, c in enumerate(sel_np)])
            got = np.asarray(sel_m)
        else:
            want = np.stack([np.asarray(full_m)[b, c]
                             for b, c in enumerate(sel_np)])[:, None]
            got = np.asarray(sel_m)
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_mask_decoder_iou_only_matches_full(rng):
    """iou_only (factored token-side pass, no mask tail) returns the same
    predicted IoU as the full decode — the AMG iou-prefix pass relies on
    this ranking being exact."""
    import jax
    import jax.numpy as jnp

    dec = MaskDecoder(transformer_dim=32, twoway_num_heads=4,
                      twoway_mlp_dim=64, block_layout=True, block_masks=True)
    g = 8
    emb = jnp.asarray(rng.randn(g, g, 32).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.randn(g, g, 32).astype(np.float32) * 0.3)
    sparse = jnp.asarray(rng.randn(6, 2, 32).astype(np.float32) * 0.3)
    dense = jnp.asarray(rng.randn(g, g, 32).astype(np.float32) * 0.3)
    v = dec.init(jax.random.PRNGKey(0), emb, pe, sparse, dense)
    _, want_iou = dec.apply(v, emb, pe, sparse, dense)
    none_m, got_iou = dec.apply(v, emb, pe, sparse, dense, iou_only=True)
    assert none_m is None
    np.testing.assert_allclose(np.asarray(got_iou), np.asarray(want_iou),
                               atol=1e-4)


def test_factored_keys_matches_standard(rng):
    """The factored image-side transformer (a*S + P@U carried through both
    layers + final attention) == the standard materialized path, exactly."""
    import jax
    import jax.numpy as jnp
    from sam6d_tpu.models.sam import MaskDecoder

    g, C = 8, 32
    dec_std = MaskDecoder(transformer_dim=C, twoway_num_heads=4,
                          twoway_mlp_dim=64, block_layout=True,
                          block_masks=True)
    dec_fac = MaskDecoder(transformer_dim=C, twoway_num_heads=4,
                          twoway_mlp_dim=64, block_layout=True,
                          block_masks=True, factored_keys=True)
    emb = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    sparse = jnp.asarray(rng.randn(5, 2, C).astype(np.float32) * 0.3)
    dense = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    v = dec_std.init(jax.random.PRNGKey(0), emb, pe, sparse, dense)
    want_m, want_iou = dec_std.apply(v, emb, pe, sparse, dense)
    got_m, got_iou = dec_fac.apply(v, emb, pe, sparse, dense)
    np.testing.assert_allclose(np.asarray(got_iou), np.asarray(want_iou),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               atol=1e-4)


def test_factored_t2i_kernel_matches_xla(rng):
    """The fused factored-t2i Pallas kernel (interpret mode) == the XLA
    factored chain, through the full iou_only decode (both P-carrying
    attentions exercised: layer-2 t2i at rank ~HT+3 and the final
    attention at ~2(HT+1)+4)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from sam6d_tpu.models.sam import MaskDecoder

    g, C = 8, 32
    dec = MaskDecoder(transformer_dim=C, twoway_num_heads=4,
                      twoway_mlp_dim=64, block_layout=True,
                      block_masks=True)
    dec_k = MaskDecoder(transformer_dim=C, twoway_num_heads=4,
                        twoway_mlp_dim=64, block_layout=True,
                        block_masks=True, factored_kernel=True)
    emb = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    sparse = jnp.asarray(rng.randn(5, 2, C).astype(np.float32) * 0.3)
    dense = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.3)
    v = dec.init(jax.random.PRNGKey(0), emb, pe, sparse, dense)
    _, want_iou = dec.apply(v, emb, pe, sparse, dense, iou_only=True)
    with pltpu.force_tpu_interpret_mode():
        _, got_iou = dec_k.apply(v, emb, pe, sparse, dense, iou_only=True)
    np.testing.assert_allclose(np.asarray(got_iou), np.asarray(want_iou),
                               atol=1e-4)
