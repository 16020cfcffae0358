#!/usr/bin/env python
"""Component-level TPU microbenchmarks for the three pipeline stages.

Usage: python scripts/profile_stages.py [group ...]
Groups: seg match pem (default: all). Prints one JSON line per component
using bench.py's median-minus-overhead timing.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import timed, init_like, _log

DTYPE = jnp.bfloat16
RESULTS = {}


def report(name, seconds):
    RESULTS[name] = round(seconds * 1e3, 2)
    _log(f"{name}: {seconds*1e3:.1f} ms")


def profile_seg():
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=DTYPE)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    canvas_j = jnp.asarray(canvas[None])
    g = cfg.img_size // cfg.patch_size
    emb = jnp.asarray(rng.rand(g, g, cfg.prompt_embed_dim).astype(np.float32))

    enc = jax.jit(lambda v, c: jnp.sum(
        seg.encoder.apply(v["image_encoder"], c)))
    report("seg.encoder", timed(lambda i: enc(seg.vars, canvas_j + i * 1e-6)))

    sa = jax.jit(lambda v, e: jnp.sum(seg._score_all_impl(
        v, e, pts, Ry, Rx, hs, ws, h_in, w_in)[2]))
    report("seg.score_all", timed(lambda i: sa(seg.vars, emb + i * 1e-6)))

    sel_pts = pts[:128]
    sel_ch = jnp.zeros((128,), jnp.int32)
    mf = jax.jit(lambda v, e: jnp.sum(seg._masks_for_impl(
        v, e, sel_pts, sel_ch, Ry, Rx, hs, ws, h_in, w_in)))
    report("seg.masks_for128", timed(lambda i: mf(seg.vars, emb + i * 1e-6)))

    pr = jax.jit(lambda v, e: jnp.sum(seg._propose_impl(
        v, e, pts, Ry, Rx, hs, ws, h_in, w_in)[1]))
    report("seg.propose_tail", timed(lambda i: pr(seg.vars, emb + i * 1e-6)))


def profile_match():
    from sam6d_tpu.core.config import ISMConfig, SAMConfig
    from sam6d_tpu.pipelines.ism import ISMPipeline
    from sam6d_tpu.models import ism_scoring

    P = 128
    cfg = ISMConfig(sam=SAMConfig(max_proposals=P))
    pipe = ISMPipeline(cfg, dinov2_variables="eval_shape", dtype=DTYPE)
    rng = np.random.RandomState(0)
    d = cfg.dinov2
    crops = jnp.asarray(rng.rand(P, d.img_size, d.img_size, 3).astype(np.float32))

    for chunk in (32, 64, 128):
        def fwd(v, x, chunk=chunk):
            xs = x.reshape(-1, chunk, *x.shape[1:])
            cls, _ = jax.lax.map(lambda c: pipe.dinov2.apply(v, c), xs)
            return jnp.sum(cls)
        f = jax.jit(fwd)
        report(f"match.dino_fwd128_c{chunk}",
               timed(lambda i: f(pipe.dinov2_vars, crops + i * 1e-6)))

    H, W = 480, 640
    rgb01 = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(P, H, W) > 0.9).astype(np.float32))
    boxes = np.zeros((P, 4), np.float32)
    boxes[:, 0] = rng.randint(0, W // 2, P)
    boxes[:, 1] = rng.randint(0, H // 2, P)
    boxes[:, 2] = boxes[:, 0] + rng.randint(20, W // 2, P)
    boxes[:, 3] = boxes[:, 1] + rng.randint(20, H // 2, P)
    boxes = jnp.asarray(boxes)

    de = jax.jit(lambda v, r: jnp.sum(pipe._describe_impl(
        v, r, masks, boxes.astype(jnp.int32))[0]))
    report("match.describe", timed(lambda i: de(pipe.dinov2_vars, rgb01 + i * 1e-6)))

    # scores alone, from fixed descriptors
    n_patch = (d.img_size // d.patch_size) ** 2
    q_cls = jnp.asarray(rng.rand(P, d.embed_dim).astype(np.float32))
    q_patch = jnp.asarray(rng.rand(P, n_patch, d.embed_dim).astype(np.float32))
    ref_desc = jnp.asarray(rng.rand(1, 42, d.embed_dim).astype(np.float32))
    ref_appe = jnp.asarray(rng.rand(1, 42, n_patch, d.embed_dim).astype(np.float32))
    valid = jnp.ones((P,), bool)
    depth = jnp.asarray((rng.rand(H, W) * 1000).astype(np.float32))
    K = jnp.asarray(np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32))
    poses_R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (42, 1, 1)))
    clouds = jnp.asarray(rng.rand(1, 2048, 3).astype(np.float32) * 0.05)

    def scores(qc, qp):
        sem = ism_scoring.semantic_scores(qc, ref_desc, valid, "avg_5", 0.2)
        ra = ref_appe[sem["object_idx"], sem["best_template"]]
        appe = ism_scoring.appearance_scores(qp, ra)
        vis = ism_scoring.visible_ratio(qp, ra, 0.5)
        geo = ism_scoring.geometric_scores(
            boxes, masks, depth, K, jnp.float32(1.0),
            poses_R[sem["best_template"]], clouds[sem["object_idx"]])
        return jnp.sum(ism_scoring.final_scores(sem["score"], appe, geo, vis))
    sc = jax.jit(scores)
    report("match.scores", timed(lambda i: sc(q_cls + i * 1e-6, q_patch)))


def profile_pem():
    from sam6d_tpu.core.config import PEMConfig
    from sam6d_tpu.models.pem import PEMNet
    from sam6d_tpu.models.coarse_matching import CoarsePointMatching
    from sam6d_tpu.models.fine_matching import FinePointMatching, PositionalEncoding
    from sam6d_tpu.models.geo_transformer import GeometricStructureEmbedding
    from sam6d_tpu.pose.solvers import compute_coarse_Rt, compute_fine_Rt
    from sam6d_tpu.ops.ball_query import ball_query
    from sam6d_tpu.ops.sampling import sample_pts_feats

    cfg = PEMConfig()
    net = PEMNet(cfg, dtype=DTYPE)
    rng = np.random.RandomState(0)
    B, S, NF, NC = 16, cfg.img_size, cfg.fine_npoint, cfg.coarse_npoint
    C = cfg.fine.hidden_dim
    inputs = dict(
        rgb=jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)),
        rgb_choose=jnp.asarray(rng.randint(0, S * S, (B, NF))),
        pts=jnp.asarray(rng.rand(B, NF, 3).astype(np.float32) * 0.1),
        model=jnp.asarray(rng.rand(B, cfg.n_sample_model_point, 3).astype(np.float32) * 0.1),
        dense_po=jnp.asarray((rng.rand(B, NF, 3).astype(np.float32) - 0.5) * 0.1),
        dense_fo=jnp.asarray(rng.rand(B, NF, cfg.vit.out_dim).astype(np.float32)),
        pe_o=jnp.asarray(rng.rand(B, NF, C).astype(np.float32)),
    )
    variables = init_like(lambda: net.init(
        {"params": jax.random.PRNGKey(0)}, inputs, jax.random.PRNGKey(0)))
    key = jax.random.PRNGKey(0)

    full = jax.jit(lambda v, i, k: jnp.sum(net.apply(v, i, k)["pred_R"]))
    report("pem.infer", timed(lambda i: full(
        variables, dict(inputs, rgb=inputs["rgb"] + i * 1e-6),
        jax.random.fold_in(key, i))))

    trunk = jax.jit(lambda v, i: jnp.sum(
        net.apply(v, i, method=PEMNet._shared_trunk)["geo_m"]))
    report("pem.trunk", timed(lambda i: trunk(
        variables, dict(inputs, rgb=inputs["rgb"] + i * 1e-6))))

    vitf = jax.jit(lambda v, r, ch: jnp.sum(
        net.apply(v, r, ch, method=PEMNet.extract_img_feats)))
    report("pem.vit_feats", timed(lambda i: vitf(
        variables, inputs["rgb"] + i * 1e-6, inputs["rgb_choose"])))

    # geometric embedding alone
    geo_mod = GeometricStructureEmbedding(dtype=DTYPE)
    geo_vars = {"params": variables["params"]["geo_embedding"]}
    sp = jnp.asarray(rng.rand(B, NC + 1, 3).astype(np.float32))
    geof = jax.jit(lambda v, p: jnp.sum(geo_mod.apply(v, p)))
    report("pem.geo_embed", timed(lambda i: geof(geo_vars, sp + i * 1e-6)))

    # FPS
    fpsf = jax.jit(lambda p, f: jnp.sum(sample_pts_feats(p, f, NC)[0]))
    fo = jnp.asarray(rng.rand(B, NF, cfg.vit.out_dim).astype(np.float32))
    report("pem.fps2048to196", timed(lambda i: fpsf(inputs["pts"] + i * 1e-6, fo)))

    # fine PE (incl. two ball queries)
    pe_mod = PositionalEncoding(C, cfg.fine.pe_radius1, cfg.fine.pe_radius2,
                                cfg.fine.pe_nsample1, cfg.fine.pe_nsample2,
                                dtype=DTYPE)
    pe_vars = {"params": variables["params"]["fine_pe"]}
    pef = jax.jit(lambda v, p: jnp.sum(pe_mod.apply(v, p)))
    report("pem.fine_pe", timed(lambda i: pef(pe_vars, inputs["pts"] + i * 1e-6)))

    bq = jax.jit(lambda p: ball_query(0.1, 32, p, p).sum()
                 + ball_query(0.2, 64, p, p).sum())
    report("pem.ball_query_x2", timed(lambda i: bq(inputs["pts"] + i * 1e-6)))

    # coarse head + solver
    cm = cfg.coarse
    coarse_mod = CoarsePointMatching(
        nblock=cm.nblock, input_dim=cm.input_dim, hidden_dim=cm.hidden_dim,
        out_dim=cm.out_dim, num_heads=cm.num_heads, temp=cm.temp,
        normalize_feat=cm.normalize_feat, dtype=DTYPE)
    coarse_vars = {"params": variables["params"]["coarse_point_matching"]}
    f_m = jnp.asarray(rng.rand(B, NC, cfg.vit.out_dim).astype(np.float32))
    f_o = jnp.asarray(rng.rand(B, NC, cfg.vit.out_dim).astype(np.float32))
    geo_m = jnp.asarray(rng.rand(B, NC + 1, NC + 1, 256).astype(np.float32))
    ch = jax.jit(lambda v, a, b: jnp.sum(coarse_mod.apply(v, a, geo_m, b, geo_m)[-1]))
    report("pem.coarse_head", timed(lambda i: ch(coarse_vars, f_m + i * 1e-6, f_o)))

    atten = jnp.asarray(rng.rand(B, NC + 1, NC + 1).astype(np.float32))
    p1 = jnp.asarray(rng.rand(B, NC, 3).astype(np.float32))
    p2 = jnp.asarray(rng.rand(B, NC, 3).astype(np.float32))
    mdl = jnp.asarray(rng.rand(B, cfg.n_sample_model_point, 3).astype(np.float32))
    cs = jax.jit(lambda k, a: jnp.sum(compute_coarse_Rt(
        k, a, p1, p2, mdl, cfg.coarse.nproposal1, cfg.coarse.nproposal2)[0]))
    report("pem.coarse_solver", timed(lambda i: cs(
        jax.random.fold_in(key, i), atten + i * 1e-6)))

    # fine head + solver
    fm = cfg.fine
    fine_mod = FinePointMatching(
        nblock=fm.nblock, input_dim=fm.input_dim, hidden_dim=fm.hidden_dim,
        out_dim=fm.out_dim, num_heads=fm.num_heads, temp=fm.temp,
        normalize_feat=fm.normalize_feat, focusing_factor=fm.focusing_factor,
        dtype=DTYPE)
    fine_vars = {"params": variables["params"]["fine_point_matching"]}
    pe1 = jnp.asarray(rng.rand(B, NF, C).astype(np.float32))
    pe2 = inputs["pe_o"]
    df_m = jnp.asarray(rng.rand(B, NF, cfg.vit.out_dim).astype(np.float32))
    df_o = inputs["dense_fo"]
    fps_i = jnp.asarray(rng.randint(0, NF, (B, NC)).astype(np.int32))
    fh = jax.jit(lambda v, a: jnp.sum(fine_mod.apply(
        v, pe1, a, geo_m, fps_i, pe2, df_o, geo_m, fps_i)[-1]))
    report("pem.fine_head", timed(lambda i: fh(fine_vars, df_m + i * 1e-6)))

    atten_f = jnp.asarray(rng.rand(B, NF + 1, NF + 1).astype(np.float32))
    pf1 = jnp.asarray(rng.rand(B, NF, 3).astype(np.float32))
    pf2 = jnp.asarray(rng.rand(B, NF, 3).astype(np.float32))
    fs = jax.jit(lambda a: jnp.sum(compute_fine_Rt(a, pf1, pf2, mdl)[0]))
    report("pem.fine_solver", timed(lambda i: fs(atten_f + i * 1e-6)))


def main():
    groups = sys.argv[1:] or ["pem", "seg", "match"]
    t0 = time.time()
    for g in groups:
        _log(f"=== group {g} ===")
        try:
            dict(seg=profile_seg, match=profile_match, pem=profile_pem)[g]()
        except Exception as e:
            _log(f"group {g} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
