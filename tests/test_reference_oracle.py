"""Parity against the ACTUAL reference torch code (/root/reference), imported
through tests/ref_shims.py. Unlike tests/torch_ref.py (from-spec oracles),
these tests cannot agree with sam6d_tpu by shared misreading: the oracle is
the reference itself with randomized weights routed through the repo's
checkpoint converters.

Scope (VERDICT round 3 item 2):
- SAM: image encoder, prompt encoder, full mask decode
  (segment_anything/modeling/{image_encoder,prompt_encoder,mask_decoder}.py)
- PEM: GeometricStructureEmbedding, GeometricTransformer (RPE self + cross),
  LinearTransformerLayer, SparseToDenseTransformer
  (Pose_Estimation_Model/model/transformer.py:286-673)
- solvers: weighted_procrustes / compute_fine_Rt exact,
  compute_coarse_Rt statistical (utils/model_utils.py:187-363)
- ISM scores: Similarity / PairwiseSimilarity / MaskedPatch_MatrixSimilarity
  (Instance_Segmentation_Model/model/loss.py:8-116)
- pointnet2 CUDA semantics (shimmed) vs sam6d_tpu ops
"""
import sys
from functools import partial
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests import ref_shims

torch.manual_seed(7)


def _randomize_(module, scale=0.1, seed=0):
    """Replace every float PARAMETER with randn*scale (zero-init rel-pos
    tables and default-zero biases would otherwise hide parity bugs).
    Buffers (sinusoid div_term tables, BN stats, random PE matrices) keep
    their constructor values — they are model constants, not weights."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            if p.is_floating_point():
                p.copy_(torch.randn(p.shape, generator=g) * scale)
    return module


# ------------------------------------------------------------------- SAM ---

def test_ref_sam_image_encoder(rng):
    sam_pkg = ref_shims.load_sam_modeling()
    ImageEncoderViT = sam_pkg.modeling.ImageEncoderViT
    tref = ImageEncoderViT(
        img_size=64, patch_size=16, in_chans=3, embed_dim=32, depth=3,
        num_heads=4, mlp_ratio=4.0, out_chans=16, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        use_rel_pos=True, window_size=3, global_attn_indexes=(1,),
    ).eval()
    _randomize_(tref, seed=1)

    from sam6d_tpu.models.sam import SAMImageEncoder
    from sam6d_tpu.weights.convert_sam import convert_sam_encoder

    params = convert_sam_encoder(
        ref_shims.flat_sd(tref, "image_encoder."), depth=3, grid=4)
    enc = SAMImageEncoder(img_size=64, patch_size=16, embed_dim=32, depth=3,
                          num_heads=4, window_size=3, global_attn_indexes=(1,),
                          out_chans=16)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tref(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = enc.apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), atol=3e-4)


def test_ref_sam_prompt_encoder(rng):
    sam_pkg = ref_shims.load_sam_modeling()
    tref = sam_pkg.modeling.PromptEncoder(
        embed_dim=32, image_embedding_size=(4, 4),
        input_image_size=(64, 64), mask_in_chans=16).eval()
    _randomize_(tref, seed=2)

    from sam6d_tpu.models.sam import PromptEncoder
    from sam6d_tpu.weights.convert_sam import convert_sam_prompt_encoder

    params = convert_sam_prompt_encoder(
        ref_shims.flat_sd(tref, "prompt_encoder."))
    pe = PromptEncoder(embed_dim=32, input_image_size=(64, 64),
                       image_embedding_size=(4, 4))

    pts = (rng.rand(5, 1, 2) * 64).astype(np.float32)
    lbl = np.ones((5, 1), np.int32)
    with torch.no_grad():
        # pad=True: our embed_points always appends the pad point (the
        # reference pads whenever boxes are absent)
        want_pts = tref._embed_points(
            torch.from_numpy(pts), torch.from_numpy(lbl).long(), pad=True)
        want_dense = tref.get_dense_pe()
        boxes = (rng.rand(5, 4) * 64).astype(np.float32)
        want_boxes = tref._embed_boxes(torch.from_numpy(boxes))
        m = rng.randn(3, 16, 16).astype(np.float32)
        want_masks = tref._embed_masks(torch.from_numpy(m)[:, None])

    got_pts = pe.apply({"params": params}, jnp.array(pts), jnp.array(lbl),
                       method="embed_points")
    np.testing.assert_allclose(np.asarray(got_pts), want_pts.numpy(),
                               atol=2e-4)
    got_dense = pe.apply({"params": params}, method="dense_pe")
    np.testing.assert_allclose(np.asarray(got_dense),
                               want_dense[0].permute(1, 2, 0).numpy()
                               if want_dense.ndim == 4 else want_dense.numpy(),
                               atol=2e-4)
    got_boxes = pe.apply({"params": params}, jnp.array(boxes),
                         method="embed_boxes")
    np.testing.assert_allclose(np.asarray(got_boxes), want_boxes.numpy(),
                               atol=2e-4)
    got_masks = pe.apply({"params": params}, jnp.array(m[..., None]),
                         method="embed_masks")
    np.testing.assert_allclose(np.asarray(got_masks),
                               want_masks.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4)


def test_ref_sam_mask_decoder(rng):
    sam_pkg = ref_shims.load_sam_modeling()
    tref = sam_pkg.modeling.MaskDecoder(
        transformer_dim=32,
        transformer=sam_pkg.modeling.TwoWayTransformer(
            depth=2, embedding_dim=32, mlp_dim=64, num_heads=4),
        num_multimask_outputs=3,
        iou_head_depth=3, iou_head_hidden_dim=256).eval()
    _randomize_(tref, seed=3)

    from sam6d_tpu.models.sam import MaskDecoder
    from sam6d_tpu.weights.convert_sam import convert_sam_mask_decoder

    params = convert_sam_mask_decoder(ref_shims.flat_sd(tref, "mask_decoder."))
    dec = MaskDecoder(transformer_dim=32, twoway_num_heads=4,
                      twoway_mlp_dim=64)

    H = W = 4
    img = rng.randn(H, W, 32).astype(np.float32)
    pe = rng.randn(H, W, 32).astype(np.float32)
    sparse = rng.randn(6, 2, 32).astype(np.float32)
    dense = rng.randn(H, W, 32).astype(np.float32)
    with torch.no_grad():
        want_m, want_iou = tref.predict_masks(
            image_embeddings=torch.from_numpy(img).permute(2, 0, 1)[None],
            image_pe=torch.from_numpy(pe).permute(2, 0, 1)[None],
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense)
            .permute(2, 0, 1)[None].repeat(6, 1, 1, 1),
        )
    got_m, got_iou = dec.apply({"params": params},
                               *map(jnp.array, (img, pe, sparse, dense)))
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.numpy(),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(), atol=3e-4)


# ------------------------------------------------------------------- PEM ---

def test_ref_geo_embedding(rng):
    tr, _ = ref_shims.load_pem_modules()
    cfg = SimpleNamespace(hidden_dim=32, sigma_d=0.2, sigma_a=15.0,
                          angle_k=3, reduction_a="max")
    tref = tr.GeometricStructureEmbedding(cfg).eval()
    _randomize_(tref, seed=4)

    from sam6d_tpu.models.geo_transformer import GeometricStructureEmbedding
    from sam6d_tpu.weights.convert_pem import _linear

    sd = ref_shims.flat_sd(tref, "g.")
    params = {"proj_d": _linear(sd, "g.proj_d"),
              "proj_a": _linear(sd, "g.proj_a")}
    mod = GeometricStructureEmbedding(hidden_dim=32)
    pts = rng.rand(2, 17, 3).astype(np.float32)
    with torch.no_grad():
        want = tref(torch.from_numpy(pts)).numpy()
    got = np.asarray(mod.apply({"params": params}, jnp.array(pts)))
    # knn near-ties can reorder a handful of angle entries; compare robustly
    diff = np.abs(got - want)
    assert np.median(diff) < 2e-5
    assert (diff > 1e-3).mean() < 0.01


def test_ref_geometric_transformer(rng):
    tr, _ = ref_shims.load_pem_modules()
    tref = tr.GeometricTransformer(blocks=["self", "cross"], d_model=32,
                                   num_heads=4).eval()
    _randomize_(tref, seed=5)

    from sam6d_tpu.models.geo_transformer import GeometricTransformer
    from sam6d_tpu.weights.convert_pem import _geometric_transformer

    params = _geometric_transformer(ref_shims.flat_sd(tref, "g."), "g")
    mod = GeometricTransformer(d_model=32, num_heads=4)
    B, N0, N1 = 2, 9, 11
    f0 = rng.randn(B, N0, 32).astype(np.float32)
    f1 = rng.randn(B, N1, 32).astype(np.float32)
    e0 = rng.randn(B, N0, N0, 32).astype(np.float32)
    e1 = rng.randn(B, N1, N1, 32).astype(np.float32)
    with torch.no_grad():
        want0, want1 = tref(*map(torch.from_numpy, (f0, e0, f1, e1)))
    got0, got1 = mod.apply({"params": params},
                           *map(jnp.array, (f0, e0, f1, e1)))
    np.testing.assert_allclose(np.asarray(got0), want0.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got1), want1.numpy(), atol=3e-4)


def test_ref_linear_transformer_layer(rng):
    tr, _ = ref_shims.load_pem_modules()
    tref = tr.LinearTransformerLayer(d_model=32, num_heads=4).eval()
    _randomize_(tref, seed=6)

    from sam6d_tpu.models.geo_transformer import LinearTransformerLayer
    from sam6d_tpu.weights.convert_pem import _linear_transformer_layer

    params = _linear_transformer_layer(ref_shims.flat_sd(tref, "l."), "l")
    mod = LinearTransformerLayer(d_model=32, num_heads=4)
    x = rng.randn(2, 13, 32).astype(np.float32)
    mem = rng.randn(2, 21, 32).astype(np.float32)
    with torch.no_grad():
        want = tref(torch.from_numpy(x), torch.from_numpy(mem))
    got = mod.apply({"params": params}, jnp.array(x), jnp.array(mem))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-4)


def test_ref_sparse_to_dense_transformer(rng):
    tr, _ = ref_shims.load_pem_modules()
    tref = tr.SparseToDenseTransformer(
        d_model=32, sparse_blocks=["self", "cross"], num_heads=4).eval()
    _randomize_(tref, seed=7)

    from sam6d_tpu.models.geo_transformer import SparseToDenseTransformer
    from sam6d_tpu.weights.convert_pem import (_geometric_transformer,
                                               _linear_transformer_layer)

    sd = ref_shims.flat_sd(tref, "s.")
    params = {
        "sparse_layer": _geometric_transformer(sd, "s.sparse_layer"),
        "dense_layer": _linear_transformer_layer(sd, "s.dense_layer"),
    }
    mod = SparseToDenseTransformer(d_model=32, num_heads=4)
    B, Nd, Ns = 2, 33, 8
    dense0 = rng.randn(B, Nd + 1, 32).astype(np.float32)
    dense1 = rng.randn(B, Nd + 1, 32).astype(np.float32)
    # fps indices into the bg-PREPENDED tensor (the reference gathers with
    # them as-is, transformer.py:651-658)
    fi0 = np.stack([np.sort(rng.choice(Nd + 1, Ns, replace=False))
                    for _ in range(B)]).astype(np.int32)
    fi1 = np.stack([np.sort(rng.choice(Nd + 1, Ns, replace=False))
                    for _ in range(B)]).astype(np.int32)
    e0 = rng.randn(B, Ns + 1, Ns + 1, 32).astype(np.float32)
    e1 = rng.randn(B, Ns + 1, Ns + 1, 32).astype(np.float32)
    with torch.no_grad():
        want0, want1 = tref(
            torch.from_numpy(dense0), torch.from_numpy(e0),
            torch.from_numpy(fi0), torch.from_numpy(dense1),
            torch.from_numpy(e1), torch.from_numpy(fi1))
    got0, got1 = mod.apply(
        {"params": params}, jnp.array(dense0), jnp.array(e0), jnp.array(fi0),
        jnp.array(dense1), jnp.array(e1), jnp.array(fi1))
    np.testing.assert_allclose(np.asarray(got0), want0.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got1), want1.numpy(), atol=3e-4)


# --------------------------------------------------------------- solvers ---

def test_ref_weighted_procrustes(rng):
    _, mu = ref_shims.load_pem_modules()
    from sam6d_tpu.ops.geometry import weighted_procrustes

    src = rng.randn(4, 50, 3).astype(np.float32)
    ref = rng.randn(4, 50, 3).astype(np.float32)
    w = rng.rand(4, 50).astype(np.float32)
    with torch.no_grad():
        want_R, want_t = mu.weighted_procrustes(
            torch.from_numpy(src), torch.from_numpy(ref),
            torch.from_numpy(w), weight_thresh=0.3)
    got_R, got_t = weighted_procrustes(jnp.array(src), jnp.array(ref),
                                       jnp.array(w), weight_thresh=0.3)
    np.testing.assert_allclose(np.asarray(got_R), want_R.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(), atol=2e-4)


def _synthetic_pose_problem(rng, N1=60, N2=80, noise=0.0):
    """GT pose + correspondence-structured attention matrix."""
    from scipy.spatial.transform import Rotation

    R_gt = Rotation.random(random_state=3).as_matrix().astype(np.float32)
    t_gt = np.array([0.05, -0.03, 0.6], np.float32)
    pts2 = (rng.rand(N2, 3).astype(np.float32) - 0.5) * 0.2
    corr = rng.permutation(N2)[:N1]
    pts1 = pts2[corr] @ R_gt.T + t_gt
    if noise:
        pts1 = pts1 + rng.randn(N1, 3).astype(np.float32) * noise
    atten = rng.randn(N1 + 1, N2 + 1).astype(np.float32) * 0.05
    for i, j in enumerate(corr):
        atten[i + 1, j + 1] = 12.0
    return R_gt, t_gt, pts1, pts2, atten[None]


def _pose_err(R, t, R_gt, t_gt):
    dR = np.asarray(R) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    return ang, np.linalg.norm(np.asarray(t) - t_gt)


def test_ref_compute_fine_Rt(rng):
    _, mu = ref_shims.load_pem_modules()
    from sam6d_tpu.pose.solvers import compute_fine_Rt

    R_gt, t_gt, pts1, pts2, atten = _synthetic_pose_problem(rng, noise=1e-3)
    with torch.no_grad():
        want_R, want_t, want_s = mu.compute_fine_Rt(
            torch.from_numpy(atten), torch.from_numpy(pts1[None]),
            torch.from_numpy(pts2[None]))
    got_R, got_t, got_s = compute_fine_Rt(
        jnp.array(atten), jnp.array(pts1[None]), jnp.array(pts2[None]))
    np.testing.assert_allclose(np.asarray(got_R), want_R.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_s), want_s.numpy(), atol=1e-3)
    ang, terr = _pose_err(np.asarray(got_R)[0], np.asarray(got_t)[0],
                          R_gt, t_gt)
    assert ang < 2.0 and terr < 5e-3


def test_ref_compute_coarse_Rt_statistical(rng):
    """Sampling-based solver: both sides must recover the synthetic GT pose
    (bitwise index parity is impossible across RNGs)."""
    _, mu = ref_shims.load_pem_modules()
    from sam6d_tpu.pose.solvers import compute_coarse_Rt

    R_gt, t_gt, pts1, pts2, atten = _synthetic_pose_problem(rng)
    torch.manual_seed(11)
    with torch.no_grad():
        want_R, want_t = mu.compute_coarse_Rt(
            torch.from_numpy(atten), torch.from_numpy(pts1[None]),
            torch.from_numpy(pts2[None]), None, 600, 30)
    got_R, got_t = compute_coarse_Rt(
        jax.random.PRNGKey(11), jnp.array(atten), jnp.array(pts1[None]),
        jnp.array(pts2[None]), n_proposal1=600, n_proposal2=30)
    ang_ref, terr_ref = _pose_err(want_R.numpy()[0], want_t.numpy()[0],
                                  R_gt, t_gt)
    ang, terr = _pose_err(np.asarray(got_R)[0], np.asarray(got_t)[0],
                          R_gt, t_gt)
    assert ang_ref < 2.0 and terr_ref < 5e-3  # oracle solves it
    assert ang < 2.0 and terr < 5e-3          # ours solves it too


def test_ref_pairwise_distance_and_similarity(rng):
    _, mu = ref_shims.load_pem_modules()
    from sam6d_tpu.ops.geometry import pairwise_sq_distance

    x = rng.randn(2, 40, 3).astype(np.float32)
    y = rng.randn(2, 50, 3).astype(np.float32)
    with torch.no_grad():
        want = mu.pairwise_distance(torch.from_numpy(x), torch.from_numpy(y))
    got = pairwise_sq_distance(jnp.array(x), jnp.array(y))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


# ------------------------------------------------------------ ISM scores ---

def test_ref_ism_semantic_scores(rng):
    loss = ref_shims.load_ism_loss()
    from sam6d_tpu.models.ism_scoring import semantic_scores

    P, O, T, C = 12, 3, 42, 16
    q = rng.randn(P, C).astype(np.float32)
    r = rng.randn(O, T, C).astype(np.float32)
    sim_mod = loss.PairwiseSimilarity()
    with torch.no_grad():
        sim = sim_mod(torch.from_numpy(q), torch.from_numpy(r))  # (P, O, T)
        top5 = sim.topk(5, dim=-1).values.mean(-1)  # detector aggregation
        want_score, want_obj = top5.max(-1)
    got = semantic_scores(jnp.array(q), jnp.array(r),
                          jnp.ones((P,), bool), aggregation="avg_5",
                          confidence_thresh=0.2)
    np.testing.assert_allclose(np.asarray(got["score"]),
                               want_score.numpy(), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got["object_idx"]),
                                  want_obj.numpy())
    np.testing.assert_array_equal(
        np.asarray(got["selected"]), (want_score.numpy() > 0.2))


def test_ref_ism_appearance_and_visible_ratio(rng):
    loss = ref_shims.load_ism_loss()
    from sam6d_tpu.models.ism_scoring import appearance_scores, visible_ratio

    P, Np, Nr, C = 8, 30, 25, 16
    q = rng.randn(P, Np, C).astype(np.float32)
    # zero out some query patches (masked-out patches are zero vectors)
    q[:, -7:] = 0.0
    r = rng.randn(P, Nr, C).astype(np.float32)
    mod = loss.MaskedPatch_MatrixSimilarity()
    with torch.no_grad():
        want_app = mod.compute_straight(torch.from_numpy(q),
                                        torch.from_numpy(r))
        want_vis = mod.compute_visible_ratio(torch.from_numpy(q),
                                             torch.from_numpy(r), thred=0.5)
    got_app = appearance_scores(jnp.array(q), jnp.array(r))
    got_vis = visible_ratio(jnp.array(q), jnp.array(r), thresh=0.5)
    np.testing.assert_allclose(np.asarray(got_app), want_app.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_vis), want_vis.numpy(),
                               atol=1e-4)


def test_ref_ism_cosine_similarity(rng):
    loss = ref_shims.load_ism_loss()
    q = rng.randn(7, 16).astype(np.float32)
    r = rng.randn(7, 16).astype(np.float32)
    with torch.no_grad():
        want = loss.Similarity()(torch.from_numpy(q), torch.from_numpy(r))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    rn = r / np.linalg.norm(r, axis=-1, keepdims=True)
    got = np.clip((qn * rn).sum(-1), 0.0, 1.0)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


# -------------------------------------------------- pointnet2 CUDA parity ---

def test_ref_pointnet2_semantics_vs_ours(rng):
    """Our JAX sampling/grouping ops vs the CUDA kernel semantics (pure-torch
    shim of _ext: FPS starts at index 0; ball query pre-fills rows with the
    first hit; strict < on squared distance)."""
    pn2 = ref_shims.install_pointnet2_shim()
    from sam6d_tpu.ops.sampling import farthest_point_sample, gather_points
    from sam6d_tpu.ops.ball_query import ball_query, group_points

    B, N, C = 2, 64, 8
    xyz = rng.rand(B, N, 3).astype(np.float32)
    feats = rng.randn(B, N, C).astype(np.float32)

    want_fps = pn2.furthest_point_sample(torch.from_numpy(xyz), 16).numpy()
    got_fps = np.asarray(farthest_point_sample(jnp.array(xyz), 16))
    np.testing.assert_array_equal(got_fps, want_fps)

    idx = want_fps.astype(np.int64)
    want_gather = pn2.gather_operation(
        torch.from_numpy(feats).transpose(1, 2).contiguous(),
        torch.from_numpy(want_fps)).numpy()  # (B, C, 16)
    got_gather = np.asarray(gather_points(jnp.array(feats), jnp.array(idx)))
    np.testing.assert_allclose(got_gather,
                               np.transpose(want_gather, (0, 2, 1)),
                               atol=1e-6)

    centers = xyz[:, :10]
    radius, ns = 0.35, 8
    want_bq = pn2.ball_query(radius, ns, torch.from_numpy(xyz),
                             torch.from_numpy(centers)).numpy()
    got_bq = np.asarray(ball_query(radius, ns, jnp.array(xyz),
                                   jnp.array(centers)))
    np.testing.assert_array_equal(got_bq, want_bq)

    want_grp = pn2.grouping_operation(
        torch.from_numpy(feats).transpose(1, 2).contiguous(),
        torch.from_numpy(want_bq)).numpy()  # (B, C, 10, ns)
    got_grp = np.asarray(group_points(jnp.array(feats),
                                      jnp.array(want_bq.astype(np.int32))))
    np.testing.assert_allclose(
        got_grp, np.transpose(want_grp, (0, 2, 3, 1)), atol=1e-6)


# ----------------------------------------------------- PBR template miner ---

def test_ref_pbr_nearest_template_selection(rng):
    """The PBR miner's per-viewpoint crop selection must match the real
    reference NearestTemplateFinder.search_nearest_query (viewing-direction
    nearest, in-plane ignored — pose_utils.py:266-296, used by
    provider/bop_pbr.py:155-190). Template slot correspondence goes through
    the set-parity permutation (our pose order differs from the .npy)."""
    pu = ref_shims.load_ism_pose_utils()
    from sam6d_tpu.data.bop_pbr import viewing_direction_distance
    from sam6d_tpu.render.poses import (match_pose_order, template_cam_poses,
                                        template_obj_poses)

    finder = pu.NearestTemplateFinder(level_templates=0,
                                      pose_distribution="all",
                                      return_inplane=False)

    # random query object poses (rotation + arbitrary translation)
    M = 257
    A = rng.randn(M, 3, 3)
    U, _, Vt = np.linalg.svd(A)
    Rq = U @ Vt
    det = np.linalg.det(Rq)
    Rq[:, :, 0] *= det[:, None]  # proper rotations
    poses_q = np.tile(np.eye(4, dtype=np.float64), (M, 1, 1))
    poses_q[:, :3, :3] = Rq
    poses_q[:, :3, 3] = rng.randn(M, 3) * 100

    want = finder.search_nearest_query(poses_q)  # (42,) ref-order slots

    ours_T = template_obj_poses(0)[:, :3, :3]
    got = viewing_direction_distance(
        ours_T.astype(np.float64), Rq).argmin(axis=1)  # (42,) our order

    cam_ref = np.load(
        "/root/reference/SAM-6D/Instance_Segmentation_Model/utils/poses/"
        "predefined_poses/cam_poses_level0.npy")
    perm = match_pose_order(template_cam_poses(0), cam_ref)
    # our template perm[j] corresponds to reference template j
    np.testing.assert_array_equal(got[perm], want)
