"""ISM pipeline smoke tests with tiny random models (structure + plumbing;
numerical parity of each stage is covered by the dedicated parity tests)."""
import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from sam6d_tpu.core.config import (
    ISMConfig, SAMConfig, DINOv2Config, ISMMatchingConfig)
from sam6d_tpu.pipelines.sam_amg import SAMSegmentor, build_point_grid, bilinear_matrix
from sam6d_tpu.pipelines.ism import ISMPipeline, detections_to_bop_json


def tiny_sam_cfg():
    return SAMConfig(
        model_type="tiny", encoder_embed_dim=32, encoder_depth=2,
        encoder_num_heads=4, encoder_global_attn_indexes=(1,), img_size=64,
        patch_size=16, window_size=3, prompt_embed_dim=32, points_per_side=4,
        points_per_batch=8, pred_iou_thresh=-10.0, stability_score_thresh=0.0,
        segmentor_width_size=64, max_proposals=16)


def tiny_ism_cfg():
    return ISMConfig(
        sam=tiny_sam_cfg(),
        dinov2=DINOv2Config(model_name="tiny", patch_size=14, embed_dim=32,
                            depth=2, num_heads=4, img_size=28, chunk_size=8),
        matching=ISMMatchingConfig(confidence_thresh=-1.0),
        max_detections=8)


def test_build_point_grid():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert abs(g[0, 0] - 1 / 8) < 1e-9 and abs(g[-1, 1] - 7 / 8) < 1e-9


def test_bilinear_matrix_interpolates():
    M = bilinear_matrix(8, 4)
    x = np.arange(4, dtype=np.float32)
    np.testing.assert_allclose(M.sum(1), 1.0, atol=1e-6)
    y = M @ x
    assert y[0] == 0.0 and abs(y[-1] - 3.0) < 1e-6  # edge clamp
    # composition of two bilinear matrices == resize chain
    M2 = bilinear_matrix(16, 8) @ M
    np.testing.assert_allclose(M2.sum(1), 1.0, atol=1e-6)


def test_resize_logits_block_matches_plain(rng):
    """Block-layout resize (one transpose + two GEMMs) must equal the
    plain resize of the unpacked (4g, 4g) low-res logits."""
    seg = SAMSegmentor(tiny_sam_cfg(), seed=0)
    B, K, g = 2, 3, 8
    mb = jnp.asarray(rng.randn(B, 4 * K, 4 * g * g).astype(np.float32))
    Ry = jnp.asarray(rng.rand(17, 4 * g).astype(np.float32))
    Rx = jnp.asarray(rng.rand(23, 4 * g).astype(np.float32))
    got = np.asarray(seg._resize_logits_block(mb, Ry, Rx))
    # unpack by the documented index map: row 4i+2p+r, col 4j+2q+s
    m = np.asarray(mb).reshape(B, K, 2, 2, g, g, 2, 2)
    M = m.transpose(0, 1, 4, 6, 2, 5, 7, 3).reshape(B, K, 4 * g, 4 * g)
    want = np.asarray(seg._resize_logits(jnp.asarray(M), Ry, Rx))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def segmentor():
    return SAMSegmentor(tiny_sam_cfg(), seed=0)


def test_amg_generates_fixed_capacity(segmentor, rng):
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    out = segmentor.generate_masks(img)
    K = segmentor.cfg.max_proposals
    assert out["masks"].shape == (K, 48, 64)
    assert out["boxes"].shape == (K, 4)
    assert out["valid"].shape == (K,)
    assert out["boxes"][:, 0].min() >= 0 and out["boxes"][:, 2].max() <= 64
    # with thresholds disabled, at least one proposal should survive NMS
    assert out["valid"].any()


@pytest.mark.slow
def test_ism_pipeline_end_to_end(segmentor, tmp_path, rng):
    cfg = tiny_ism_cfg()
    pipe = ISMPipeline(cfg, segmentor=segmentor, seed=1)

    # synthetic template dir
    for i in range(42):
        rgb = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        m = np.zeros((32, 32), np.uint8)
        m[8:24, 8:24] = 255
        Image.fromarray(rgb).save(tmp_path / f"rgb_{i}.png")
        Image.fromarray(m).save(tmp_path / f"mask_{i}.png")
    ref = pipe.onboard_templates_from_dir(str(tmp_path))
    assert ref["descriptors"].shape == (1, 42, 32)
    assert ref["appe_descriptors"].shape[0:2] == (1, 42)
    assert ref["poses_R"].shape == (42, 3, 3)

    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    depth = (rng.rand(48, 64) * 1000 + 500).astype(np.float32)
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    clouds = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32) * 0.05)

    result = pipe.match_frame(img, depth, K, 1.0, clouds,
                              apply_nms_per_object=True)
    Kcap = cfg.sam.max_proposals
    assert result["scores"].shape == (Kcap,)
    for k in ["semantic_score", "appe_score", "geometric_score", "visible_ratio"]:
        assert np.isfinite(result[k][result["valid"]]).all()

    recs = detections_to_bop_json(result)
    assert len(recs) == result["valid"].sum()
    if recs:
        r = recs[0]
        assert set(r) == {"scene_id", "image_id", "category_id", "bbox",
                          "score", "time", "segmentation"}


def test_adaptive_describe_matches_full_for_valid_prefix(rng):
    """The dynamic-trip-count describe (only ceil(n_valid/chunk) DINOv2
    chunks run) must produce identical scores for valid proposals as the
    full fixed-capacity describe."""
    import jax

    cfg = tiny_ism_cfg()
    pipe = ISMPipeline(cfg)
    H, W = 48, 64
    K = 16
    rgb01 = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(K, H, W) > 0.7).astype(np.float32))
    boxes = np.zeros((K, 4), np.float32)
    boxes[:, 0] = rng.randint(0, W // 2, K)
    boxes[:, 1] = rng.randint(0, H // 2, K)
    boxes[:, 2] = boxes[:, 0] + rng.randint(8, W // 2, K)
    boxes[:, 3] = boxes[:, 1] + rng.randint(8, H // 2, K)
    boxes = jnp.asarray(boxes)
    # valid prefix of 5 (chunk size 8 -> 1 of 2 chunks needed)
    valid = jnp.asarray(np.arange(K) < 5)
    depth = jnp.asarray((rng.rand(H, W) * 900 + 100).astype(np.float32))
    Kmat = jnp.asarray(np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]],
                                np.float32))
    d = cfg.dinov2
    n_patch = (d.img_size // d.patch_size) ** 2
    ref_desc = jnp.asarray(rng.rand(1, 3, d.embed_dim).astype(np.float32))
    ref_appe = jnp.asarray(rng.rand(1, 3, n_patch, d.embed_dim).astype(np.float32))
    poses_R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (3, 1, 1)))
    clouds = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32) * 0.05)

    out = pipe._score_frame_impl(
        pipe.dinov2_vars, rgb01, masks, boxes, valid, depth, Kmat,
        jnp.float32(1.0), ref_desc, ref_appe, poses_R, clouds,
        apply_nms=False, apply_size_filters=False)
    # full describe on everything, scored identically
    cls_full, patch_full = pipe._describe_impl(
        pipe.dinov2_vars, rgb01, masks, boxes.astype(jnp.int32))
    from sam6d_tpu.models import ism_scoring
    sem = ism_scoring.semantic_scores(cls_full, ref_desc, valid,
                                      cfg.matching.aggregation_function,
                                      cfg.matching.confidence_thresh)
    v_idx = np.where(np.asarray(valid))[0]
    np.testing.assert_allclose(np.asarray(out["semantic_score"])[v_idx],
                               np.asarray(sem["score"])[v_idx], atol=1e-5)
    # invalid slots can never be selected
    assert not np.asarray(out["valid"])[5:].any()

    # the unrolled adaptive describe (Python chunks behind lax.cond — the
    # measured default) must be chunk-for-chunk identical to the while_loop
    # formulation
    from dataclasses import replace
    pipe_u = ISMPipeline(replace(
        cfg, dinov2=replace(cfg.dinov2, adaptive_unroll=True)))
    pipe = ISMPipeline(replace(
        cfg, dinov2=replace(cfg.dinov2, adaptive_unroll=False)))
    imgs = jnp.asarray(
        rng.rand(K, d.img_size, d.img_size, 3).astype(np.float32))
    for n in (0, 5, 9, K):
        cls_w, patch_w = pipe._dino_forward_chunked(
            pipe.dinov2_vars, imgs, jnp.int32(n))
        cls_u, patch_u = pipe_u._dino_forward_chunked(
            pipe.dinov2_vars, imgs, jnp.int32(n))
        np.testing.assert_allclose(np.asarray(cls_u), np.asarray(cls_w),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(patch_u), np.asarray(patch_w),
                                   atol=1e-6)


@pytest.mark.slow
def test_rank_mode_equals_exact_when_i2t_is_zero(rng):
    """MaskDecoder rank_only drops exactly the image<-token updates: with
    the i2t out-projections zeroed, rank mode == exact mode, and the
    preranked propose pipeline == the full-grid propose pipeline."""
    import jax
    import dataclasses

    cfg = dataclasses.replace(tiny_sam_cfg(), amg_prerank=8)
    seg = SAMSegmentor(cfg, seed=0)
    # zero the image<-token output projections in both two-way layers
    v = jax.tree.map(lambda x: x, seg.vars)  # shallow-copyable pytree
    import flax
    flat = flax.traverse_util.flatten_dict(v["mask_decoder"]["params"])
    for k in list(flat):
        if "cross_attn_image_to_token" in k and k[-2] == "out_proj":
            flat[k] = jnp.zeros_like(flat[k])
    v = dict(v, mask_decoder={"params": flax.traverse_util.unflatten_dict(flat)})
    seg.vars = v

    emb = jnp.asarray(rng.rand(4, 4, 32).astype(np.float32))
    dense_pe = seg.prompt_encoder.apply(v["prompt_encoder"], method="dense_pe")
    dense = seg.prompt_encoder.apply(v["prompt_encoder"],
                                     method="no_mask_dense")
    pts = jnp.asarray(build_point_grid(4) * 64)
    labels = jnp.ones(pts.shape[0], jnp.int32)[:, None]
    sparse, _ = seg.prompt_encoder.apply(v["prompt_encoder"],
                                         pts[:, None, :], labels)
    m_exact, iou_exact = seg.mask_decoder.apply(
        v["mask_decoder"], emb, dense_pe, sparse, dense)
    m_rank, iou_rank = seg.mask_decoder.apply(
        v["mask_decoder"], emb, dense_pe, sparse, dense, rank_only=True)
    np.testing.assert_allclose(np.asarray(m_rank), np.asarray(m_exact),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou_rank), np.asarray(iou_exact),
                               atol=1e-5)

    # full pipeline: prerank(8 of 16) vs exact full grid — identical
    # because the rank scores are now exact, so the true top-8 is kept
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    out_pre = seg.generate_masks(img)
    seg_full = SAMSegmentor(dataclasses.replace(cfg, amg_prerank=0), seed=0)
    seg_full.vars = v
    out_full = seg_full.generate_masks(img)
    kept_pre = np.asarray(out_pre["valid"])
    kept_full = np.asarray(out_full["valid"])
    # the survivors of the full path must all appear in the preranked path
    # (compare by boxes: order within equal scores may differ)
    b_pre = {tuple(np.round(b, 3)) for b in out_pre["boxes"][kept_pre]}
    b_full = {tuple(np.round(b, 3)) for b in out_full["boxes"][kept_full]}
    assert b_full <= b_pre or b_pre == b_full


@pytest.mark.slow
def test_nms_topk_truncation_matches_full(rng):
    """Greedy-NMS prefix truncation: keep decisions only depend on
    higher-scored candidates, so top-T NMS == full NMS for the selected
    top-K (fixed seed; ample kept candidates inside the prefix)."""
    import dataclasses

    base = tiny_sam_cfg()
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    seg_full = SAMSegmentor(dataclasses.replace(base, amg_nms_topk=0),
                            seed=0)
    out_full = seg_full.generate_masks(img)
    seg_trunc = SAMSegmentor(dataclasses.replace(base, amg_nms_topk=32),
                             seed=0)
    seg_trunc.vars = seg_full.vars
    out_trunc = seg_trunc.generate_masks(img)
    np.testing.assert_array_equal(out_full["valid"], out_trunc["valid"])
    # equal-scored candidates may reorder between the two sorts; compare
    # the kept detections as a set (boxes + scores, lexicographically)
    kf = out_full["valid"]
    kt = out_trunc["valid"]

    def canon(out, keep):
        rows = np.concatenate(
            [out["boxes"][keep], out["iou_preds"][keep][:, None]], axis=1)
        return rows[np.lexsort(rows.T[::-1])]

    np.testing.assert_allclose(canon(out_full, kf), canon(out_trunc, kt),
                               atol=1e-5)


@pytest.mark.slow
def test_crop_cascade_amg(rng):
    """crop_n_layers=1 runs the full image + 4 overlapping crops with a
    coarser per-layer grid and merges by cross-crop NMS (reference
    automatic_mask_generator.py:196-264). The full-image layer's
    detections must be representable in the merged set."""
    import dataclasses

    cfg = dataclasses.replace(tiny_sam_cfg(), crop_n_layers=1,
                              crop_n_points_downscale_factor=2,
                              max_proposals=16)
    seg = SAMSegmentor(cfg, seed=0)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    out = seg.generate_masks(img)
    K = cfg.max_proposals
    assert out["masks"].shape == (K, 48, 64)
    assert out["boxes"].shape == (K, 4)
    nv = int(out["valid"].sum())
    assert nv > 0
    # boxes inside the image, masks nonzero only for valid slots
    b = out["boxes"][out["valid"]]
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 64).all()
    assert (b[:, 1] >= 0).all() and (b[:, 3] <= 48).all()
    assert np.abs(out["masks"][~out["valid"]]).sum() == 0

    # crop boxes themselves follow the reference layout
    from sam6d_tpu.pipelines.sam_amg import generate_crop_boxes
    boxes, layers = generate_crop_boxes((48, 64), 1, 512 / 1500)
    assert boxes[0] == [0, 0, 64, 48] and layers[0] == 0
    assert len(boxes) == 5 and layers[1:] == [1, 1, 1, 1]


def test_propose_iou_prefix_matches_restricted_full(rng):
    """amg_iou_prefix: (a) the selected points are exactly the top-P of
    the iou-only ranking (which test_mask_decoder_iou_only_matches_full
    pins to the full decode's IoU), and (b) the prefix propose is
    bit-identical to the full propose RESTRICTED to those points — i.e.
    the pass is pure point-subsetting, no other semantic change. (End
    equality with the unrestricted full grid additionally needs the
    NMS-relevant prefix to fit in P — guaranteed only by the capacity
    margin, which tiny random weights don't provide: near-identical
    random masks make NMS suppress arbitrarily deep.)"""
    import jax

    base = dataclasses.replace(tiny_sam_cfg(), max_proposals=4,
                               amg_iou_prefix_factor=0.0)
    seg = SAMSegmentor(base, seed=0)
    frame = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    emb = seg._encode(seg.vars, jnp.asarray(canvas[None]))[0]

    # reproduce the selection with the public pieces
    dpe = seg.prompt_encoder.apply(seg.vars["prompt_encoder"],
                                   method="dense_pe")
    iou_a = seg._iou_all_impl(seg.vars, emb, dpe, jnp.asarray(pts))
    _, top = jax.lax.top_k(jnp.max(iou_a, axis=1), 8)
    restricted = seg._propose(seg.vars, emb, jnp.asarray(pts)[top], Ry, Rx,
                              hs=hs, ws=ws, h_in=h_in, w_in=w_in)

    # factor 2.0 at capacity 4, chunk 8 -> prefix = 8 of the 16 points
    segp = SAMSegmentor(dataclasses.replace(base, amg_iou_prefix_factor=2.0),
                        variables=seg.vars)
    pref = segp._propose(seg.vars, emb, pts, Ry, Rx, hs=hs, ws=ws,
                         h_in=h_in, w_in=w_in)
    for a, b, nm in zip(restricted, pref, ("masks", "boxes", "valid", "iou")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


def test_propose_gathered_low_masks_equal_redecode(rng):
    """_propose_impl now takes the selected proposals' masks from the
    score pass's kept low-res logits (gather) instead of re-decoding the
    selected (point, channel) pairs. The decode is deterministic, so both
    must be bit-identical (round-4 restructure, ~70 ms on v5e)."""
    import jax

    seg = SAMSegmentor(tiny_sam_cfg(), seed=0)
    frame = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    emb = seg._encode(seg.vars, jnp.asarray(canvas[None]))[0]

    masks, boxes, valid, iou = seg._propose(
        seg.vars, emb, pts, Ry, Rx, hs=hs, ws=ws, h_in=h_in, w_in=w_in)

    # reproduce the selection to get (point, channel) pairs, then re-decode
    iou_all, stab_all, boxes_all = seg._score_all_impl(
        seg.vars, emb, pts, Ry, Rx, hs, ws, h_in, w_in)
    cfg = seg.cfg
    valid_all = ((iou_all > cfg.pred_iou_thresh)
                 & (stab_all >= cfg.stability_score_thresh))
    from sam6d_tpu.ops.masks import box_iou, nms_masked
    T = iou_all.shape[0]
    keep = nms_masked(box_iou(boxes_all, boxes_all), iou_all, valid_all,
                      jnp.ones((T, T), bool), cfg.box_nms_thresh)
    score = jnp.where(keep, iou_all, -jnp.inf)
    _, order = jax.lax.top_k(score, cfg.max_proposals)
    redecoded = seg._masks_for_impl(
        seg.vars, emb, pts[np.asarray(order) // 3],
        (order % 3).astype(jnp.int32), Ry, Rx, hs, ws, h_in, w_in)
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(redecoded))
