"""PEM network tests: shapes, jit-ability, and a synthetic end-to-end check
that the trunk+solvers recover an exact pose when features are informative."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sam6d_tpu.core.config import PEMConfig, ViTConfig, PointMatchingConfig
from sam6d_tpu.models.pem import PEMNet
from sam6d_tpu.models.geo_transformer import FocusedLinearAttention
from sam6d_tpu.models.vit import ViTEncoder, gather_pixel_feats
from sam6d_tpu.train.losses import compute_correspondence_loss, total_loss


def tiny_cfg():
    return PEMConfig(
        coarse_npoint=24,
        fine_npoint=96,
        vit=ViTConfig(patch_size=16, embed_dim=64, depth=4, num_heads=4,
                      img_size=64, out_dim=32),
        coarse=PointMatchingConfig(nblock=1, input_dim=32, hidden_dim=32,
                                   out_dim=32, nproposal1=120, nproposal2=30),
        fine=PointMatchingConfig(nblock=1, input_dim=32, hidden_dim=32,
                                 out_dim=32, pe_nsample1=8, pe_nsample2=16),
        img_size=64, n_sample_model_point=64,
    )
    # hidden geo dim must match matching hidden dims — patched below


@pytest.fixture(scope="module")
def net_and_params():
    cfg = tiny_cfg()
    import dataclasses
    cfg = dataclasses.replace(
        cfg, geo_embedding=dataclasses.replace(cfg.geo_embedding, hidden_dim=32))
    net = PEMNet(cfg)
    B, S, NF = 2, cfg.img_size, cfg.fine_npoint
    rng = np.random.RandomState(0)
    inputs = dict(
        rgb=jnp.array(rng.rand(B, S, S, 3), jnp.float32),
        rgb_choose=jnp.array(rng.randint(0, S * S, (B, NF))),
        pts=jnp.array(rng.rand(B, NF, 3), jnp.float32),
        model=jnp.array(rng.rand(B, cfg.n_sample_model_point, 3), jnp.float32),
        dense_po=jnp.array(rng.rand(B, NF, 3), jnp.float32),
        dense_fo=jnp.array(rng.rand(B, NF, cfg.vit.out_dim), jnp.float32),
    )
    key = jax.random.PRNGKey(0)
    variables = net.init({"params": key}, inputs, key)
    return net, variables, inputs, cfg


def test_pem_infer_shapes(net_and_params):
    net, variables, inputs, cfg = net_and_params
    out = net.apply(variables, inputs, jax.random.PRNGKey(1))
    B = inputs["rgb"].shape[0]
    assert out["pred_R"].shape == (B, 3, 3)
    assert out["pred_t"].shape == (B, 3)
    assert out["pred_pose_score"].shape == (B,)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    # rotations are orthonormal
    RtR = np.einsum("bij,bik->bjk", np.asarray(out["pred_R"]), np.asarray(out["pred_R"]))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-3)


def test_pem_template_onboarding(net_and_params):
    net, variables, inputs, cfg = net_and_params
    V, S, P = 2, cfg.img_size, 40
    rng = np.random.RandomState(1)
    tem_rgb = jnp.array(rng.rand(V, S, S, 3), jnp.float32)
    tem_choose = jnp.array(rng.randint(0, S * S, (V, P)))
    tem_pts = jnp.array(rng.rand(V, P, 3), jnp.float32)
    po, fo = net.apply(variables, tem_rgb, tem_choose, tem_pts,
                       method="extract_template_feats")
    assert po.shape == (cfg.fine_npoint, 3)
    assert fo.shape == (cfg.fine_npoint, cfg.vit.out_dim)


def test_pem_train_forward_and_loss(net_and_params):
    net, variables, inputs, cfg = net_and_params
    B, S, NF = 2, cfg.img_size, cfg.fine_npoint
    rng = np.random.RandomState(2)
    P = 40
    tr_inputs = dict(
        rgb=inputs["rgb"], rgb_choose=inputs["rgb_choose"], pts=inputs["pts"],
        tem1_rgb=jnp.array(rng.rand(B, S, S, 3), jnp.float32),
        tem1_choose=jnp.array(rng.randint(0, S * S, (B, P))),
        tem1_pts=jnp.array(rng.rand(B, P, 3), jnp.float32),
        tem2_rgb=jnp.array(rng.rand(B, S, S, 3), jnp.float32),
        tem2_choose=jnp.array(rng.randint(0, S * S, (B, P))),
        tem2_pts=jnp.array(rng.rand(B, P, 3), jnp.float32),
    )
    init_R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    init_t = jnp.zeros((B, 3))
    (coarse_attens, fine_attens, aux), mutated = net.apply(
        variables, tr_inputs, init_R, init_t, method="train_forward",
        mutable=["batch_stats"])
    assert len(coarse_attens) == cfg.coarse.nblock
    assert coarse_attens[0].shape == (B, cfg.coarse_npoint + 1, cfg.coarse_npoint + 1)
    assert fine_attens[0].shape == (B, NF + 1, NF + 1)

    end_points = {}
    end_points.update(compute_correspondence_loss(
        coarse_attens, aux["sparse_pm"], aux["sparse_po"], init_R, init_t,
        prefix="coarse"))
    end_points.update(compute_correspondence_loss(
        fine_attens, aux["dense_pm"], aux["dense_po"], init_R, init_t,
        prefix="fine"))
    loss, metrics = total_loss(end_points)
    assert np.isfinite(float(loss))
    assert "coarse_loss0" in metrics and "fine_acc" in metrics


def test_linear_attention_matches_quadratic(rng):
    """The O(N) kv-first branch must equal the explicit O(N^2) formulation."""
    d, h = 32, 4
    mod = FocusedLinearAttention(d, h)
    x = jnp.array(rng.randn(1, 20, d), jnp.float32)
    m = jnp.array(rng.randn(1, 30, d), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, m, m)
    out = mod.apply(params, x, m, m)

    # quadratic oracle with the same projections
    p = params["params"]
    def dense(name, v):
        return v @ p[name]["kernel"] + p[name]["bias"]
    q, k, v = dense("proj_q", x), dense("proj_k", m), dense("proj_v", m)
    scale = jax.nn.softplus(p["scale"])
    q = np.maximum(np.asarray(q), 0) + 1e-6
    k = np.maximum(np.asarray(k), 0) + 1e-6
    q, k = q / np.asarray(scale), k / np.asarray(scale)
    qn = np.linalg.norm(q, axis=-1, keepdims=True)
    kn = np.linalg.norm(k, axis=-1, keepdims=True)
    q = q ** 3 / np.linalg.norm(q ** 3, axis=-1, keepdims=True) * qn
    k = k ** 3 / np.linalg.norm(k ** 3, axis=-1, keepdims=True) * kn
    dh = d // h
    q = q.reshape(1, 20, h, dh)
    k = k.reshape(1, 30, h, dh)
    vv = np.asarray(v).reshape(1, 30, h, dh)
    qk = np.einsum("bnhc,bmhc->bhnm", q, k)
    z = 1.0 / (qk.sum(-1) + 1e-6)  # (b, h, n)
    want = np.einsum("bhnm,bmhd,bhn->bnhd", qk, vv, z).reshape(1, 20, d)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_vit_encoder_shapes(rng):
    enc = ViTEncoder(img_size=64, patch_size=16, embed_dim=64, depth=4,
                     num_heads=4, out_dim=32)
    x = jnp.array(rng.rand(2, 64, 64, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    fmap, cls = enc.apply(params, x)
    assert fmap.shape == (2, 64, 64, 32)
    assert cls.shape == (2, 64)
    choose = jnp.array(rng.randint(0, 64 * 64, (2, 10)))
    feats = gather_pixel_feats(fmap, choose)
    assert feats.shape == (2, 10, 32)
    # gather correctness
    f = np.asarray(fmap).reshape(2, -1, 32)
    np.testing.assert_array_equal(np.asarray(feats)[0], f[0][np.asarray(choose)[0]])


def test_sample_pixel_feats_matches_full_resize(rng):
    """Fused low-res sampling == full bilinear upsample + gather."""
    import jax.image
    from sam6d_tpu.models.vit import sample_pixel_feats
    B, g, C, H, W = 2, 14, 8, 56, 56
    fmap = jnp.asarray(rng.randn(B, g, g, C).astype(np.float32))
    full = jax.image.resize(fmap, (B, H, W, C), method="bilinear")
    choose = jnp.asarray(rng.randint(0, H * W, (B, 300)))
    want = np.asarray(gather_pixel_feats(full, choose))
    got = np.asarray(sample_pixel_feats(fmap, choose, (H, W)))
    np.testing.assert_allclose(got, want, atol=1e-5)
