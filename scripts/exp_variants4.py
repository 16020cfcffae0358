#!/usr/bin/env python
"""Experiment matrix #4: seg decode after skinny attention; NMS cost; PEM pieces."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import timed, init_like, _log
from sam6d_tpu.core.params import cast_float_params

RESULTS = {}


def report(name, seconds):
    RESULTS[name] = round(seconds * 1e3, 2)
    _log(f"{name}: {seconds*1e3:.1f} ms")


def exp_seg():
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.ops.masks import box_iou, nms_masked

    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    g = cfg.img_size // cfg.patch_size
    emb = jnp.asarray(rng.rand(g, g, cfg.prompt_embed_dim).astype(np.float32))

    def decode_only(v, e):
        dense_pe = seg.prompt_encoder.apply(v["prompt_encoder"], method="dense_pe")
        P = pts.shape[0]

        def one(p):
            m, iou = seg._decode_chunk(v, e, dense_pe, p)
            return jnp.sum(m), jnp.sum(iou)
        ms, io = jax.lax.map(one, pts.reshape(P // 128, 128, 2))
        return jnp.sum(ms) + jnp.sum(io)
    f = jax.jit(decode_only)
    report("seg.decode_skinny", timed(lambda i: f(seg.vars, emb + i * 1e-6)))

    sa = jax.jit(lambda v, e: jnp.sum(seg._score_all_impl(
        v, e, pts, Ry, Rx, hs, ws, h_in, w_in)[2]))
    report("seg.score_all_skinny", timed(lambda i: sa(seg.vars, emb + i * 1e-6)))

    pr = jax.jit(lambda v, e: jnp.sum(seg._propose_impl(
        v, e, pts, Ry, Rx, hs, ws, h_in, w_in)[1]))
    report("seg.propose_skinny", timed(lambda i: pr(seg.vars, emb + i * 1e-6)))

    # NMS alone at 3072 candidates
    N = 3072
    boxes = np.zeros((N, 4), np.float32)
    boxes[:, 0] = rng.randint(0, 500, N)
    boxes[:, 1] = rng.randint(0, 400, N)
    boxes[:, 2] = boxes[:, 0] + rng.randint(10, 140, N)
    boxes[:, 3] = boxes[:, 1] + rng.randint(10, 140, N)
    boxes_j = jnp.asarray(boxes)
    scores = jnp.asarray(rng.rand(N).astype(np.float32))
    valid = jnp.ones((N,), bool)
    same = jnp.ones((N, N), bool)

    def nms_prog(sc):
        iou = box_iou(boxes_j, boxes_j)
        return jnp.sum(nms_masked(iou, sc, valid, same, 0.7))
    fn = jax.jit(nms_prog)
    report("seg.nms3072", timed(lambda i: fn(scores + i * 1e-7)))


def exp_pem():
    from sam6d_tpu.core.config import PEMConfig
    from sam6d_tpu.models.pem import PEMNet
    from sam6d_tpu.models.fine_matching import FinePointMatching, PositionalEncoding
    from sam6d_tpu.pose.solvers import compute_coarse_Rt, compute_fine_Rt

    cfg = PEMConfig()
    net = PEMNet(cfg, dtype=jnp.bfloat16)
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
    variables = cast_float_params(init_like(lambda: net.init(
        {"params": jax.random.PRNGKey(0)}, inputs, jax.random.PRNGKey(0))),
        jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    trunk = jax.jit(lambda v, i: jnp.sum(
        net.apply(v, i, method=PEMNet._shared_trunk)["geo_m"]))
    report("pem.trunk2", timed(lambda i: trunk(
        variables, dict(inputs, rgb=inputs["rgb"] + i * 1e-6))))

    pe_mod = PositionalEncoding(C, cfg.fine.pe_radius1, cfg.fine.pe_radius2,
                                cfg.fine.pe_nsample1, cfg.fine.pe_nsample2,
                                dtype=jnp.bfloat16)
    pe_vars = {"params": variables["params"]["fine_pe"],
               "batch_stats": variables.get("batch_stats", {}).get("fine_pe", {})}
    pef = jax.jit(lambda v, p: jnp.sum(pe_mod.apply(v, p)))
    report("pem.fine_pe2", timed(lambda i: pef(pe_vars, inputs["pts"] + i * 1e-6)))

    fm = cfg.fine
    fine_mod = FinePointMatching(
        nblock=fm.nblock, input_dim=fm.input_dim, hidden_dim=fm.hidden_dim,
        out_dim=fm.out_dim, num_heads=fm.num_heads, temp=fm.temp,
        normalize_feat=fm.normalize_feat, focusing_factor=fm.focusing_factor,
        dtype=jnp.bfloat16)
    fine_vars = {"params": variables["params"]["fine_point_matching"]}
    geo_m = jnp.asarray(rng.rand(B, NC + 1, NC + 1, 256).astype(np.float32)).astype(jnp.bfloat16)
    pe1 = jnp.asarray(rng.rand(B, NF, C).astype(np.float32))
    df_m = jnp.asarray(rng.rand(B, NF, cfg.vit.out_dim).astype(np.float32))
    fps_i = jnp.asarray(rng.randint(0, NF, (B, NC)).astype(np.int32))
    fh = jax.jit(lambda v, a: jnp.sum(fine_mod.apply(
        v, pe1, a, geo_m, fps_i, inputs["pe_o"], inputs["dense_fo"], geo_m, fps_i)[-1]))
    report("pem.fine_head2", timed(lambda i: fh(fine_vars, df_m + i * 1e-6)))

    atten = jnp.asarray(rng.rand(B, NC + 1, NC + 1).astype(np.float32))
    p1 = jnp.asarray(rng.rand(B, NC, 3).astype(np.float32))
    p2 = jnp.asarray(rng.rand(B, NC, 3).astype(np.float32))
    mdl = jnp.asarray(rng.rand(B, cfg.n_sample_model_point, 3).astype(np.float32))
    cs = jax.jit(lambda k, a: jnp.sum(compute_coarse_Rt(
        k, a, p1, p2, mdl, cfg.coarse.nproposal1, cfg.coarse.nproposal2)[0]))
    report("pem.coarse_solver2", timed(lambda i: cs(
        jax.random.fold_in(key, i), atten + i * 1e-6)))

    atten_f = jnp.asarray(rng.rand(B, NF + 1, NF + 1).astype(np.float32))
    pf1 = jnp.asarray(rng.rand(B, NF, 3).astype(np.float32))
    pf2 = jnp.asarray(rng.rand(B, NF, 3).astype(np.float32))
    fs = jax.jit(lambda a: jnp.sum(compute_fine_Rt(a, pf1, pf2, mdl)[0]))
    report("pem.fine_solver2", timed(lambda i: fs(atten_f + i * 1e-6)))


def main():
    groups = sys.argv[1:] or ["seg", "pem"]
    for g in groups:
        _log(f"=== {g} ===")
        try:
            dict(seg=exp_seg, pem=exp_pem)[g]()
        except Exception as e:
            _log(f"{g} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
