#!/usr/bin/env python
"""Unified TPU microbenchmark probe driver (replaces exp_variants2..24).

Usage:
    python scripts/probe.py EXP [EXP ...]      # run experiment group(s)
    python scripts/probe.py --list             # show available groups

Every experiment uses the same trustworthy harness: the op under test is
wrapped in an 8-iteration on-device `lax.map` (so tunnel dispatch noise is
amortized 8x) and timed with bench.timed (median minus measured dispatch
overhead). Only numbers from the SAME process/run are comparable
(see PERFORMANCE.md "Lessons"). Results print as one JSON line per group.
"""
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

from bench import timed, _log, init_like

RESULTS = {}
EXPS = {}


def exp(name):
    def deco(fn):
        EXPS[name] = fn
        return fn
    return deco


def report(name, seconds, per=8):
    RESULTS[name] = round(seconds * 1e3 / per, 3)
    _log(f"{name}: {seconds*1e3:.1f} ms total ({seconds*1e3/per:.2f}/iter)")


def map8(body, *args):
    """jit(sum(lax.map(body over 8 perturbed copies)))."""
    def fn(*a):
        def one(i):
            return jnp.sum(body(i, *a))
        return jnp.sum(jax.lax.map(one, jnp.arange(8, dtype=jnp.float32)))
    return jax.jit(fn)


# --------------------------------------------------------------------- geo

@exp("geo")
def exp_geo():
    """GeometricStructureEmbedding at PEM shapes (B=16, N=197): round-2
    formulation vs the round-3 planar/fused-sin rewrite."""
    from sam6d_tpu.models.geo_transformer import GeometricStructureEmbedding
    from sam6d_tpu.ops.embedding import (
        sinusoidal_embedding, geometric_embedding_indices)

    rng = np.random.RandomState(0)
    B, N, C = 16, 197, 256
    pts = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    mod = GeometricStructureEmbedding(hidden_dim=C, dtype=jnp.bfloat16)
    v = init_like(lambda: mod.init(jax.random.PRNGKey(0), pts))
    p = v["params"]

    def old_impl(i, pts, p):
        d_idx, a_idx = geometric_embedding_indices(pts + i * 1e-6, 0.2, 15.0, 3)
        d = sinusoidal_embedding(d_idx, C).astype(jnp.bfloat16)
        a = sinusoidal_embedding(a_idx, C).astype(jnp.bfloat16)
        d = d @ p["proj_d"]["kernel"].astype(jnp.bfloat16) + p["proj_d"]["bias"].astype(jnp.bfloat16)
        a = a @ p["proj_a"]["kernel"].astype(jnp.bfloat16) + p["proj_a"]["bias"].astype(jnp.bfloat16)
        return d + jnp.max(a, axis=3)

    def new_impl(i, pts, v):
        return mod.apply(v, pts + i * 1e-6)

    f_old = map8(old_impl, pts, p)
    f_new = map8(new_impl, pts, v)
    report("geo.old", timed(lambda i: f_old(pts + i * 1e-7, p)))
    report("geo.new", timed(lambda i: f_new(pts + i * 1e-7, v)))


# -------------------------------------------------------------------- finepe

@exp("finepe")
def exp_finepe():
    """Fine positional encoding at PEM shapes (B=16, N=2048): round-2 raw
    coordinate gathers vs round-3 pre-projected 32-channel gathers."""
    from sam6d_tpu.models.fine_matching import PositionalEncoding, SharedMLP
    from sam6d_tpu.ops.ball_query import group_points

    rng = np.random.RandomState(0)
    B, N = 16, 2048
    pts = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 0.4 - 0.2)
    pe = PositionalEncoding(dtype=jnp.bfloat16)
    v = init_like(lambda: pe.init(jax.random.PRNGKey(0), pts))

    f_new = map8(lambda i, pts, v: pe.apply(v, pts + i * 1e-6), pts, v)
    report("finepe.new", timed(lambda i: f_new(pts + i * 1e-7, v)))

    # isolated gather comparison: (B, N, 96) idx rows of width 3 vs 32
    idx = jnp.asarray(rng.randint(0, N, (B, N, 96)).astype(np.int32))
    feat3 = pts
    feat32 = jnp.asarray(rng.rand(B, N, 32).astype(np.float32)).astype(jnp.bfloat16)

    g3 = map8(lambda i, f, ix: group_points(f + i * 1e-6, ix), feat3, idx)
    g32 = map8(lambda i, f, ix: group_points(f + i * 1e-6, ix), feat32, idx)
    report("finepe.gather3", timed(lambda i: g3(feat3 + i * 1e-7, idx)))
    report("finepe.gather32", timed(lambda i: g32(feat32 + i * 1e-7, idx)))


# ----------------------------------------------------------------------- pem

@exp("pem")
def exp_pem():
    """Full PEM forward (B=16): with vs without the onboarding caches."""
    from sam6d_tpu.core.config import PEMConfig
    from sam6d_tpu.models.pem import PEMNet
    from sam6d_tpu.core.params import cast_float_params

    cfg = PEMConfig()
    net = PEMNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    B, S, NF = 16, cfg.img_size, cfg.fine_npoint
    base = dict(
        rgb=jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)),
        rgb_choose=jnp.asarray(rng.randint(0, S * S, (B, NF))),
        pts=jnp.asarray(rng.rand(B, NF, 3).astype(np.float32) * 0.1),
        model=jnp.asarray(rng.rand(B, cfg.n_sample_model_point, 3).astype(np.float32) * 0.1),
        dense_po=jnp.asarray((rng.rand(B, NF, 3).astype(np.float32) - 0.5) * 0.1),
        dense_fo=jnp.asarray(rng.rand(B, NF, cfg.vit.out_dim).astype(np.float32)),
    )
    cached = dict(
        base,
        pe_o=jnp.asarray(rng.rand(1, NF, cfg.fine.hidden_dim).astype(np.float32)),
        sparse_po=jnp.asarray((rng.rand(1, cfg.coarse_npoint, 3) - 0.5).astype(np.float32)),
        sparse_fo=jnp.asarray(rng.rand(1, cfg.coarse_npoint, cfg.vit.out_dim).astype(np.float32)),
        fps_idx_o=jnp.asarray(rng.randint(0, NF, (1, cfg.coarse_npoint)).astype(np.int32)),
        geo_o=jnp.asarray(rng.rand(1, cfg.coarse_npoint + 1, cfg.coarse_npoint + 1,
                                   cfg.geo_embedding.hidden_dim).astype(np.float32)),
    )
    v = cast_float_params(init_like(lambda: net.init(
        {"params": jax.random.PRNGKey(0)}, base, jax.random.PRNGKey(0))),
        jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    import dataclasses
    from sam6d_tpu.core.config import ViTConfig, PointMatchingConfig
    cfg_u = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, unroll=True),
        coarse=dataclasses.replace(cfg.coarse, unroll=True),
        fine=dataclasses.replace(cfg.fine, unroll=True))
    net_u = PEMNet(cfg_u, dtype=jnp.bfloat16)  # same param tree

    for name, network, inputs in (("pem.nocache", net, base),
                                  ("pem.cached", net, cached),
                                  ("pem.cached_unrolled", net_u, cached)):
        fwd = jax.jit(lambda v, i, k, n=network: jnp.sum(
            n.apply(v, i, k)["pred_R"]))

        def body(i, inputs=inputs, fwd=fwd):
            inp = dict(inputs, rgb=inputs["rgb"] + i * 1e-6)
            return fwd(v, inp, jax.random.fold_in(key, i))

        report(name, timed(body), per=1)


# ----------------------------------------------------------------------- enc

@exp("enc")
def exp_enc():
    """SAM ViT-H encoder decomposition: where do the ~112 ms go?"""
    from sam6d_tpu.models.sam import SAMImageEncoder
    from sam6d_tpu.core.params import cast_float_params

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 1024, 1024, 3).astype(np.float32)).astype(jnp.bfloat16)

    def run(name, **kw):
        kw.setdefault("use_flash", True)
        enc = SAMImageEncoder(dtype=jnp.bfloat16, **kw)
        v = cast_float_params(init_like(
            lambda: enc.init(jax.random.PRNGKey(0), x)), jnp.bfloat16)
        fwd = jax.jit(lambda v, x: jnp.sum(enc.apply(v, x)))
        report(name, timed(lambda i: fwd(v, x + i * 1e-6)), per=1)

    run("enc.full")
    run("enc.noflash", use_flash=False)  # XLA attend path (bias einsums)


@exp("dino")
def exp_dino():
    """DINOv2-L describe chunk (16 crops): block scan vs unrolled."""
    from sam6d_tpu.core.config import DINOv2Config
    from sam6d_tpu.models.dinov2 import DINOv2
    from sam6d_tpu.core.params import cast_float_params

    rng = np.random.RandomState(0)
    c = DINOv2Config()
    x = jnp.asarray(rng.rand(16, 224, 224, 3).astype(np.float32)).astype(
        jnp.bfloat16)
    cases = (("dino.scan16", True, 16), ("dino.unrolled16", True, 16),
             ("dino.noflash16", False, 16), ("dino.flash32", True, 32),
             ("dino.noflash32", False, 32))
    for name, flash, bsz in cases:
        unroll = name == "dino.unrolled16"
        net = DINOv2(patch_size=c.patch_size, embed_dim=c.embed_dim,
                     depth=c.depth, num_heads=c.num_heads,
                     dtype=jnp.bfloat16, use_flash=flash, unroll=unroll)
        v = cast_float_params(init_like(
            lambda: net.init(jax.random.PRNGKey(0), x[:1])), jnp.bfloat16)
        xb = jnp.concatenate([x] * (bsz // 16))
        fwd = jax.jit(lambda v, xx: jnp.sum(net.apply(v, xx)[0]))
        report(name, timed(lambda i: fwd(v, xb + i * 1e-6)), per=1)


@exp("encmlp")
def exp_encmlp():
    """Pure GEMM-stack calibration at encoder shapes: 32 x (qkv+proj+MLP)
    over (4096, 1280) tokens — the encoder's floor if attention were free."""
    rng = np.random.RandomState(0)
    D = 1280
    x = jnp.asarray(rng.rand(4096, D).astype(np.float32)).astype(jnp.bfloat16)
    Wqkv = jnp.asarray(rng.rand(32, D, 3 * D).astype(np.float32) * 0.01).astype(jnp.bfloat16)
    Wp = jnp.asarray(rng.rand(32, D, D).astype(np.float32) * 0.01).astype(jnp.bfloat16)
    W1 = jnp.asarray(rng.rand(32, D, 4 * D).astype(np.float32) * 0.01).astype(jnp.bfloat16)
    W2 = jnp.asarray(rng.rand(32, 4 * D, D).astype(np.float32) * 0.01).astype(jnp.bfloat16)

    def block(x, w):
        wqkv, wp, w1, w2 = w
        h = x @ wqkv
        h = h[:, :D] + h[:, D:2 * D] * 0.1 + h[:, 2 * D:] * 0.1
        x = x + h @ wp
        return x + jax.nn.gelu(x @ w1) @ w2

    @jax.jit
    def fwd(x, ws):
        y, _ = jax.lax.scan(lambda c, w: (block(c, w), None), x, ws)
        return jnp.sum(y)

    flops = 32 * (4096 * D * 3 * D + 4096 * D * D + 2 * 4096 * D * 4 * D) * 2
    sec = timed(lambda i: fwd(x + i * 1e-6, (Wqkv, Wp, W1, W2)))
    report("encmlp.scan32", sec, per=1)
    _log(f"encmlp: {flops/sec/1e12:.1f} TF/s")


# -------------------------------------------------------------------- geobits

@exp("geobits")
def exp_geobits():
    """Bisect the 18 ms geo embedding: indices/angles vs sin vs GEMMs."""
    from sam6d_tpu.ops.embedding import (pairwise_planar_diffs,
                                         sinusoid_phase_tables)
    from sam6d_tpu.ops.geometry import pairwise_sq_distance

    rng = np.random.RandomState(0)
    B, N, C = 16, 197, 256
    pts = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    Wd = jnp.asarray(rng.rand(C, C).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    def angles_only(i, pts):
        p = pts + i * 1e-6
        ax, ay, az = pairwise_planar_diffs(p)
        d2 = ax * ax + ay * ay + az * az
        d2s = pairwise_sq_distance(p, p)
        _, knn = jax.lax.top_k(-d2s, 4)
        knn = knn[..., 1:]
        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
        flat = knn.reshape(B, N * 3)
        kx = jnp.take_along_axis(px, flat, 1).reshape(B, N, 3)
        ky = jnp.take_along_axis(py, flat, 1).reshape(B, N, 3)
        kz = jnp.take_along_axis(pz, flat, 1).reshape(B, N, 3)
        rx, ry, rz = kx - px[..., None], ky - py[..., None], kz - pz[..., None]
        acc = jnp.sqrt(d2)
        for kk in range(3):
            rxe, rye, rze = (rx[..., kk:kk+1], ry[..., kk:kk+1], rz[..., kk:kk+1])
            cx = rye * az - rze * ay
            cy = rze * ax - rxe * az
            cz = rxe * ay - rye * ax
            sv = jnp.sqrt(cx*cx + cy*cy + cz*cz)
            cv = rxe*ax + rye*ay + rze*az + 0.0
            acc = acc + jnp.arctan2(sv, cv)
        return acc

    div, phase = sinusoid_phase_tables(C, 5.0)
    ang = jnp.asarray(rng.rand(B, N, N).astype(np.float32))

    def sin_only(i, ang):
        return jnp.sin((ang + i * 1e-6)[..., None] * div + phase)

    def sin_gemm(i, ang):
        s = jnp.sin((ang + i * 1e-6)[..., None] * div + phase)
        return s.astype(jnp.bfloat16) @ Wd

    def sin_bf16(i, ang):
        a16 = (ang + i * 1e-6)[..., None].astype(jnp.bfloat16)
        return jnp.sin(a16 * div.astype(jnp.bfloat16)
                       + phase.astype(jnp.bfloat16)) @ Wd

    for name, fn, arg in (("geobits.angles", angles_only, pts),
                          ("geobits.sin", sin_only, ang),
                          ("geobits.sin_gemm", sin_gemm, ang),
                          ("geobits.sin_bf16_gemm", sin_bf16, ang)):
        f = map8(fn, arg)
        report(name, timed(lambda i, f=f, a=arg: f(a + i * 1e-7)))


# ------------------------------------------------------------------- gather2

@exp("gather2")
def exp_gather2():
    """Gather alternatives at fine-PE shapes: XLA row gather vs one-hot
    matmul (chunked) vs sorted-index gather."""
    rng = np.random.RandomState(0)
    B, N, S, C = 16, 2048, 96, 32
    U = jnp.asarray(rng.rand(B, N, C).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, N, (B, N, S)).astype(np.int32))

    from sam6d_tpu.ops.ball_query import group_points

    g = map8(lambda i, f, ix: group_points(f + i * 1e-6, ix), U, idx)
    report("gather2.rowgather", timed(lambda i: g(U + i * 1e-7, idx)))

    def onehot_chunked(i, U, idx):
        Ui = U + i * 1e-6
        flat = idx.reshape(B, N * S)

        def chunk(c):
            sl = jax.lax.dynamic_slice_in_dim(flat, c * 8192, 8192, axis=1)
            oh = (sl[..., None] == jnp.arange(N, dtype=jnp.int32)
                  ).astype(jnp.bfloat16)
            return jnp.einsum("bmn,bnc->bmc", oh, Ui)
        out = jax.lax.map(chunk, jnp.arange(N * S // 8192))
        return out

    f_oh = map8(onehot_chunked, U, idx)
    report("gather2.onehot", timed(lambda i: f_oh(U + i * 1e-7, idx)))

    # sorted indices (spatial locality surrogate): does ordering matter?
    idx_sorted = jnp.sort(idx, axis=-1)
    g2 = map8(lambda i, f, ix: group_points(f + i * 1e-6, ix), U, idx_sorted)
    report("gather2.sortedgather", timed(lambda i: g2(U + i * 1e-7, idx_sorted)))

    # fewer, wider rows: same payload as (B, N, S) x 32ch but S/4 rows of 128ch
    U4 = jnp.asarray(rng.rand(B, N, 4 * C).astype(np.float32)).astype(jnp.bfloat16)
    idx4 = idx[..., ::4]
    g3 = map8(lambda i, f, ix: group_points(f + i * 1e-6, ix), U4, idx4)
    report("gather2.quarter_rows_128ch", timed(lambda i: g3(U4 + i * 1e-7, idx4)))


# ------------------------------------------------------------------- pembits

@exp("pembits")
def exp_pembits():
    """Stage-level bisection of the cached PEM forward (B=16)."""
    from sam6d_tpu.core.config import PEMConfig
    from sam6d_tpu.models.pem import PEMNet
    from sam6d_tpu.core.params import cast_float_params
    from sam6d_tpu.pose.solvers import compute_coarse_Rt, compute_fine_Rt

    cfg = PEMConfig()
    net = PEMNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    B, S, NF, NC = 16, cfg.img_size, cfg.fine_npoint, cfg.coarse_npoint
    base = dict(
        rgb=jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)),
        rgb_choose=jnp.asarray(rng.randint(0, S * S, (B, NF))),
        pts=jnp.asarray(rng.rand(B, NF, 3).astype(np.float32) * 0.1),
        model=jnp.asarray(rng.rand(B, cfg.n_sample_model_point, 3).astype(np.float32) * 0.1),
        dense_po=jnp.asarray((rng.rand(B, NF, 3).astype(np.float32) - 0.5) * 0.1),
        dense_fo=jnp.asarray(rng.rand(B, NF, cfg.vit.out_dim).astype(np.float32)),
    )
    v = cast_float_params(init_like(lambda: net.init(
        {"params": jax.random.PRNGKey(0)}, base, jax.random.PRNGKey(0))),
        jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    def stage(name, fn, *args):
        f = jax.jit(lambda *a: jnp.sum(jnp.asarray(
            jax.tree_util.tree_leaves(fn(*a))[0], jnp.float32)))
        report(name, timed(lambda i: f(*args)), per=1)

    # trunk: image feats
    stage("pembits.imgfeats",
          lambda v, rgb, ch: net.apply(v, rgb, ch, method="extract_img_feats"),
          v, base["rgb"], base["rgb_choose"])
    # geo embedding (one call)
    from sam6d_tpu.models.geo_transformer import GeometricStructureEmbedding
    geo_mod = GeometricStructureEmbedding(hidden_dim=256, dtype=jnp.bfloat16)
    pts197 = jnp.asarray(rng.rand(B, NC + 1, 3).astype(np.float32) - 0.5)
    stage("pembits.geo",
          lambda v, p: geo_mod.apply(
              {"params": v["params"]["geo_embedding"]}, p),
          v, pts197)
    # coarse heads
    from sam6d_tpu.models.coarse_matching import CoarsePointMatching
    cm = cfg.coarse
    coarse_mod = CoarsePointMatching(
        nblock=cm.nblock, input_dim=cm.input_dim, hidden_dim=cm.hidden_dim,
        out_dim=cm.out_dim, num_heads=cm.num_heads, temp=cm.temp,
        normalize_feat=cm.normalize_feat, dtype=jnp.bfloat16)
    fm = jnp.asarray(rng.rand(B, NC, cfg.coarse.input_dim).astype(np.float32)).astype(jnp.bfloat16)
    geo = jnp.asarray(rng.rand(B, NC + 1, NC + 1, 256).astype(np.float32)).astype(jnp.bfloat16)
    stage("pembits.coarseheads",
          lambda v, fm, geo: coarse_mod.apply(
              {"params": v["params"]["coarse_point_matching"]}, fm, geo, fm, geo)[-1],
          v, fm, geo)
    # coarse solver
    atten = jnp.asarray(rng.rand(B, NC + 1, NC + 1).astype(np.float32))
    sp = jnp.asarray(rng.rand(B, NC, 3).astype(np.float32))
    mdl = jnp.asarray(rng.rand(B, cfg.n_sample_model_point, 3).astype(np.float32))
    f_solver = jax.jit(lambda k, a, p1, p2, m: jnp.sum(compute_coarse_Rt(
        k, a, p1, p2, m, cfg.coarse.nproposal1, cfg.coarse.nproposal2)[0]))
    report("pembits.coarsesolver",
           timed(lambda i: f_solver(jax.random.fold_in(key, i), atten, sp, sp, mdl)),
           per=1)
    # fine PE (pe1 per frame)
    from sam6d_tpu.models.fine_matching import (PositionalEncoding,
                                                FinePointMatching)
    fmc = cfg.fine
    pe_mod = PositionalEncoding(
        fmc.hidden_dim, fmc.pe_radius1, fmc.pe_radius2,
        fmc.pe_nsample1, fmc.pe_nsample2, dtype=jnp.bfloat16)
    ptsf = jnp.asarray(rng.rand(B, NF, 3).astype(np.float32) * 0.4 - 0.2)
    stage("pembits.finepe",
          lambda v, p: pe_mod.apply(
              {"params": v["params"]["fine_pe"],
               "batch_stats": v["batch_stats"]["fine_pe"]}, p),
          v, ptsf)
    # fine heads
    fine_mod = FinePointMatching(
        nblock=fmc.nblock, input_dim=fmc.input_dim, hidden_dim=fmc.hidden_dim,
        out_dim=fmc.out_dim, num_heads=fmc.num_heads, temp=fmc.temp,
        normalize_feat=fmc.normalize_feat,
        focusing_factor=fmc.focusing_factor, dtype=jnp.bfloat16)
    pe = jnp.asarray(rng.rand(B, NF, 256).astype(np.float32)).astype(jnp.bfloat16)
    ff = jnp.asarray(rng.rand(B, NF, cfg.fine.input_dim).astype(np.float32)).astype(jnp.bfloat16)
    fidx = jnp.asarray(rng.randint(0, NF, (B, NC)).astype(np.int32))
    stage("pembits.fineheads",
          lambda v, pe, ff, geo, fidx: fine_mod.apply(
              {"params": v["params"]["fine_point_matching"]},
              pe, ff, geo, fidx, pe, ff, geo, fidx)[-1],
          v, pe, ff, geo, fidx)
    # fine solver
    attf = jnp.asarray(rng.rand(B, NF + 1, NF + 1).astype(np.float32))
    f_fine = jax.jit(lambda a, p1, p2, m: jnp.sum(compute_fine_Rt(
        a, p1, p2, m, dis_thres=cfg.dis_thres)[0]))
    report("pembits.finesolver",
           timed(lambda i: f_fine(attf + i * 1e-7, ptsf, ptsf, mdl)), per=1)


# ------------------------------------------------------------------- maploop

@exp("maploop")
def exp_maploop():
    """The XLA mid-trip-count loop pathology (r2 lever 4): identical
    bodies cost ~2x/iter at ~8 trips vs 2 or 24+. Does lax.scan unroll
    escape it?"""
    rng = np.random.RandomState(0)
    D = 1024
    x = jnp.asarray(rng.rand(256, D).astype(np.float32)).astype(jnp.bfloat16)
    W = jnp.asarray(rng.rand(D, D).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    def body(c):
        h = c
        for _ in range(6):
            h = jnp.tanh(h @ W)
        return h

    for trips in (2, 8, 24):
        for unroll in (1, 2, 4):
            if unroll > trips:
                continue

            def run(i, x, W, trips=trips, unroll=unroll):
                def step(c, _):
                    return body(c), None
                out, _ = jax.lax.scan(step, x + i * 1e-6, None,
                                      length=trips, unroll=unroll)
                return out

            f = map8(run, x, W)
            sec = timed(lambda i: f(x + i * 1e-7, W))
            report(f"maploop.t{trips}_u{unroll}", sec, per=8 * trips)


# -------------------------------------------------------------------- encbits

@exp("encbits")
def exp_encbits():
    """Decompose the SAM windowed block (25 windows x 196 tokens x 16 heads
    x hd 80): where do the ~18.5 ms/28 blocks go, and what do candidate
    reformulations of the rel-pos prep cost?"""
    from sam6d_tpu.kernels.flash_attention import (
        flash_attention_relpos, _fused_attention, _pad_axis, _round_up)

    rng = np.random.RandomState(0)
    B, heads, ws, hd = 25, 16, 14, 80
    N = ws * ws
    dim = heads * hd

    def mk(*shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32) * 0.1).astype(
            jnp.bfloat16)

    q = mk(B, heads, N, hd)
    k = mk(B, heads, N, hd)
    v = mk(B, heads, N, hd)
    rel_h = mk(2 * ws - 1, hd)
    rel_w = mk(2 * ws - 1, hd)

    # 1. full windowed flash call (prep + kernel), per single block
    f_full = map8(lambda i, q, k, v: flash_attention_relpos(
        q + i * 1e-6, k, v, rel_h, rel_w, (ws, ws)), q, k, v)
    report("encbits.flash_full", timed(lambda i: f_full(q + i * 1e-7, k, v)))

    # 2. the thin-table einsum pair alone (current prep formulation)
    idx = np.arange(ws)[:, None] - np.arange(ws)[None, :] + (ws - 1)
    Rh = rel_h[jnp.asarray(idx)]
    Rw = rel_w[jnp.asarray(idx)]

    def prep(i, q):
        qg = (q + i * 1e-6).reshape(B, heads, ws, ws, hd)
        rel_h_q = jnp.einsum("bnhwc,hkc->bnhwk", qg, Rh)
        rel_w_q = jnp.einsum("bnhwc,wkc->bnhwk", qg, Rw)
        return rel_h_q.reshape(B, heads, N, ws), rel_w_q.reshape(B, heads, N, ws)

    f_prep = map8(lambda i, q: sum(jnp.sum(t) for t in prep(i, q)), q)
    report("encbits.prep_einsums", timed(lambda i: f_prep(q + i * 1e-7)))

    # 3. concat/broadcast/pad of augmented operands alone (tables given)
    rhq = mk(B, heads, N, ws)
    rwq = mk(B, heads, N, ws)
    rows = np.repeat(np.arange(ws), ws)
    cols = np.tile(np.arange(ws), ws)
    eye_h = jnp.asarray(np.eye(ws, dtype=np.float32)[rows])
    eye_w = jnp.asarray(np.eye(ws, dtype=np.float32)[cols])

    def aug(i, q, k, rhq, rwq):
        dt = q.dtype
        scale = hd ** -0.5
        parts_q = [(q + i * 1e-6) * jnp.asarray(scale, dt), rhq, rwq,
                   jnp.ones((B, heads, N, 1), dt)]
        parts_k = [k, jnp.broadcast_to(eye_h, (B, heads, N, ws)).astype(dt),
                   jnp.broadcast_to(eye_w, (B, heads, N, ws)).astype(dt),
                   jnp.zeros((B, heads, N, 1), dt)]
        q_aug = jnp.concatenate(parts_q, axis=-1)
        k_aug = jnp.concatenate(parts_k, axis=-1)
        Da = _round_up(q_aug.shape[-1], 128)
        return _pad_axis(q_aug, 3, Da), _pad_axis(k_aug, 3, Da)

    f_aug = map8(lambda i, q, k, rhq, rwq: sum(
        jnp.sum(t) for t in aug(i, q, k, rhq, rwq)), q, k, rhq, rwq)
    report("encbits.aug_concat", timed(lambda i: f_aug(q + i * 1e-7, k, rhq, rwq)))

    # 4. kernel alone on prebuilt aligned operands
    Nk_pad = _round_up(N, 128)
    bq = _round_up(N, 16)
    q_aug = mk(B, heads, bq, 128)
    k_aug = mk(B, heads, Nk_pad, 128)
    v_p = mk(B, heads, Nk_pad, 128)
    f_kern = map8(lambda i, qa, ka, vp: _fused_attention(
        qa + i * 1e-6, ka, vp, bq, False), q_aug, k_aug, v_p)
    report("encbits.kernel", timed(lambda i: f_kern(q_aug + i * 1e-7, k_aug, v_p)))

    # 5. single clean GEMM producing the FULL qR tables (no extraction):
    #    (B*heads*N, hd) @ (hd, 2*N) — upper bound on a no-thin-GEMM prep
    Rfull = mk(hd, 2 * N)
    qf = q.reshape(B * heads * N, hd)
    f_gemm = map8(lambda i, qf, Rf: (qf + i * 1e-6) @ Rf, qf, Rfull)
    report("encbits.qR_fullgemm", timed(lambda i: f_gemm(qf + i * 1e-7, Rfull)))

    # 6. merged batched einsum variant: one (28,...) batched GEMM for both
    #    tables (batch h- and w- slots together, N still 14)
    qg_h = q.reshape(B, heads, ws, ws, hd)

    def prep_merged(i, q):
        qg = (q + i * 1e-6).reshape(B, heads, ws, ws, hd)
        qT = qg.transpose(0, 1, 3, 2, 4)  # (B, heads, w, h, hd)
        stacked_q = jnp.concatenate([
            qg.transpose(2, 0, 1, 3, 4).reshape(ws, -1, hd),
            qT.transpose(3, 0, 1, 2, 4).reshape(ws, -1, hd)], axis=0)
        stacked_R = jnp.concatenate([Rh, Rw], axis=0)  # (2ws, ws, hd)
        out = jnp.einsum("snc,skc->snk", stacked_q, stacked_R)
        return out

    f_pm = map8(lambda i, q: jnp.sum(prep_merged(i, q)), q)
    report("encbits.prep_merged", timed(lambda i: f_pm(q + i * 1e-7)))

    # 7. window partition/unpartition round trip at encoder shape
    x = mk(1, 64, 64, dim)
    from sam6d_tpu.models.sam import window_partition, window_unpartition

    def roundtrip(i, x):
        w_, pad_hw = window_partition(x + i * 1e-6, ws)
        return window_unpartition(w_ * 1.0001, ws, pad_hw, (64, 64))

    f_rt = map8(roundtrip, x)
    report("encbits.win_roundtrip", timed(lambda i: f_rt(x + i * 1e-7)))

    # 8. qkv reshape/transpose to (3, B, heads, N, hd) layout alone
    qkv = mk(B, ws, ws, 3 * dim)

    def split(i, qkv):
        t = (qkv + i * 1e-6).reshape(B, N, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        return t[0] + t[1] * 0.1 + t[2] * 0.01

    f_sp = map8(split, qkv)
    report("encbits.qkv_split", timed(lambda i: f_sp(qkv + i * 1e-7)))


# ------------------------------------------------------------------- amgchunk

@exp("amgchunk")
def exp_amgchunk():
    """The AMG fused tail (_propose) vs decode chunk size. 1024 prompts /
    points_per_batch trips: 128 -> 8 trips sits in the measured mid-trip
    XLA pathology zone (r2 lever 4); sweep the real program."""
    import dataclasses
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    rng = np.random.RandomState(0)
    image = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    base = SAMConfig()
    seg0 = SAMSegmentor(base, variables="eval_shape", dtype=jnp.bfloat16)
    canvas, _, (hs, ws), (h_in, w_in) = seg0.preprocess_frame(image)
    Ry, Rx, pts_in = seg0.frame_constants(hs, ws, h_in, w_in)
    g = base.img_size // base.patch_size
    emb = jnp.asarray(rng.rand(g, g, base.prompt_embed_dim).astype(
        np.float32) * 0.1).astype(jnp.bfloat16)

    for chunk in (32, 64, 128, 256):
        cfg = dataclasses.replace(base, points_per_batch=chunk)
        seg = SAMSegmentor(cfg, variables=seg0.vars, dtype=jnp.bfloat16)
        f = seg._propose
        f(seg.vars, emb, pts_in, Ry, Rx, hs=hs, ws=ws, h_in=h_in,
          w_in=w_in)[0].block_until_ready()
        report(f"amgchunk.propose_c{chunk}",
               timed(lambda i: f(seg.vars, emb + i * 1e-6, pts_in, Ry, Rx,
                                 hs=hs, ws=ws, h_in=h_in, w_in=w_in)[0]),
               per=1)


# ----------------------------------------------------------------- solverbits

@exp("solverbits")
def exp_solverbits():
    """Bisect the 28.7 ms coarse solver at B=16 / 6000 proposals."""
    from sam6d_tpu.pose.solvers import (soft_assignment,
                                        _chunked_min_dist_to_model)
    from sam6d_tpu.ops.sampling import multinomial_from_weights
    from sam6d_tpu.ops.geometry import (weighted_procrustes,
                                        inverse_transform_points,
                                        pairwise_sq_distance)

    rng = np.random.RandomState(0)
    B, N1, N2, P1, P2, M = 16, 196, 196, 6000, 300, 1024
    key = jax.random.PRNGKey(0)
    atten = jnp.asarray(rng.rand(B, N1 + 1, N2 + 1).astype(np.float32))
    pts1 = jnp.asarray(rng.rand(B, N1, 3).astype(np.float32))
    pts2 = jnp.asarray(rng.rand(B, N2, 3).astype(np.float32))
    model = jnp.asarray(rng.rand(B, M, 3).astype(np.float32))

    f_soft = map8(lambda i, a: soft_assignment(a + i * 1e-6)[0], atten)
    report("solverbits.softassign", timed(lambda i: f_soft(atten + i * 1e-7)))

    flat = jnp.asarray(rng.rand(B, N1 * N2).astype(np.float32))
    f_mult = map8(lambda i, w: multinomial_from_weights(
        jax.random.fold_in(key, i.astype(jnp.int32)), w, P1 * 3), flat)
    report("solverbits.multinomial", timed(lambda i: f_mult(flat + i * 1e-7)))

    p1 = jnp.asarray(rng.rand(B, P1, 3, 3).astype(np.float32))
    p2 = jnp.asarray(rng.rand(B, P1, 3, 3).astype(np.float32))
    f_proc = map8(lambda i, a, b: weighted_procrustes(a + i * 1e-6, b)[0],
                  p1, p2)
    report("solverbits.procrustes6k", timed(lambda i: f_proc(p1 + i * 1e-7, p2)))

    Rs = jnp.asarray(rng.rand(B, P2, 3, 3).astype(np.float32))
    ts = jnp.asarray(rng.rand(B, P2, 3).astype(np.float32))

    def mindist(i, pts1, Rs, ts, model, chunk):
        tr = inverse_transform_points(pts1[:, None, :, :] + i * 1e-6, Rs, ts)
        return _chunked_min_dist_to_model(tr, model, chunk)

    for chunk in (30, 100, 300):
        f_md = map8(lambda i, a, b, c, d, ch=chunk: mindist(i, a, b, c, d, ch),
                    pts1, Rs, ts, model)
        report(f"solverbits.mindist_chunk{chunk}",
               timed(lambda i: f_md(pts1 + i * 1e-7, Rs, ts, model)))

    # model-chunked running-min variant (scan over model points, no P-chunk)
    def mindist_modelchunk(i, pts1, Rs, ts, model):
        tr = inverse_transform_points(pts1[:, None, :, :] + i * 1e-6, Rs, ts)
        trf = tr.reshape(B, P2 * N1, 3)

        def body(carry, mstart):
            msl = jax.lax.dynamic_slice_in_dim(model, mstart, 256, axis=1)
            d2 = pairwise_sq_distance(trf, msl)
            return jnp.minimum(carry, jnp.min(d2, axis=-1)), None

        init = jnp.full((B, P2 * N1), 1e30, trf.dtype)
        out, _ = jax.lax.scan(body, init, jnp.arange(0, M, 256))
        return jnp.sqrt(out)

    f_mc = map8(mindist_modelchunk, pts1, Rs, ts, model)
    report("solverbits.mindist_modelchunk256",
           timed(lambda i: f_mc(pts1 + i * 1e-7, Rs, ts, model)))


# ------------------------------------------------------------------------ amg

@exp("amg")
def exp_amg():
    """Decompose the AMG tail (~147 ms at seg 224.5 - enc 77.5): full
    propose, pass-1 score_all at chunk 128/256/512 (mid-trip-count test:
    1024 prompts -> 8/4/2 lax.map trips), decode-only, resize+stability+
    boxes-only, pass-2 masks_for."""
    import dataclasses
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    hs, ws, h_in, w_in = 480, 640, 768, 1024
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)

    segs = {}
    for chunk in (128, 256, 512):
        segs[chunk] = SAMSegmentor(
            dataclasses.replace(cfg, points_per_batch=chunk),
            variables="eval_shape", dtype=jnp.bfloat16)
    seg = segs[128]
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)

    # full fused propose (the bench seg tail)
    def run_prop(i, s=seg):
        out = s._propose(s.vars, emb + i * 1e-6, pts, Ry, Rx,
                         hs=hs, ws=ws, h_in=h_in, w_in=w_in)
        return jnp.sum(out[3])
    f = jax.jit(run_prop)
    report("amg.propose_full", timed(lambda i: f(i)), per=1)

    # pass 1 at each chunk size
    for chunk, s in segs.items():
        g = jax.jit(lambda v, e, p, ry, rx, s=s: jnp.sum(s._score_all_impl(
            v, e, p, ry, rx, hs, ws, h_in, w_in)[0]))
        report(f"amg.score_all_c{chunk}",
               timed(lambda i: g(s.vars, emb + i * 1e-7, pts, Ry, Rx)), per=1)

    # decode alone (no resize/stability/boxes), 8 chunks via lax.map
    def score_decode_only(v, e, p):
        dense_pe = seg.prompt_encoder.apply(v["prompt_encoder"],
                                            method="dense_pe")

        def one(c):
            masks, iou = seg._decode_chunk(v, e, dense_pe, c)
            return jnp.sum(masks) + jnp.sum(iou)
        return jnp.sum(jax.lax.map(one, p.reshape(8, 128, 2)))
    g = jax.jit(score_decode_only)
    report("amg.decode_only_c128",
           timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)

    # resize + stability + boxes alone on prebuilt block-layout masks
    from sam6d_tpu.ops.masks import masks_to_boxes
    mb = jnp.asarray(rng.rand(128, 12, 4 * 64 * 64).astype(np.float32)
                     - 0.5).astype(jnp.bfloat16)

    def tail_only(mbt):
        def one(c):
            hi = seg._resize_logits_block(mbt + c * 1e-6, Ry, Rx)
            inter = jnp.sum(hi > cfg.stability_score_offset, axis=(-1, -2))
            union = jnp.sum(hi > -cfg.stability_score_offset, axis=(-1, -2))
            flat = hi.reshape(-1, hs, ws)
            boxes = masks_to_boxes((flat > 0.0).astype(jnp.float32))
            return (jnp.sum(inter / jnp.maximum(union, 1))
                    + jnp.sum(boxes))
        return jnp.sum(jax.lax.map(one, jnp.arange(8, dtype=mbt.dtype)))
    g = jax.jit(tail_only)
    report("amg.resize_tail_x8", timed(lambda i: g(mb + i * 1e-7)), per=1)

    # pass 2: top-128 mask materialization
    selp = pts[:128]
    selc = jnp.zeros((128,), jnp.int32)
    g = jax.jit(lambda v, e: jnp.sum(seg._masks_for_impl(
        v, e, selp, selc, Ry, Rx, hs, ws, h_in, w_in)))
    report("amg.masks_for_128",
           timed(lambda i: g(seg.vars, emb + i * 1e-7)), per=1)

    # fused ablations: which composition adds the ~60 ms over the parts?
    import sam6d_tpu.pipelines.sam_amg as sam_amg_mod

    def nms_select(iou, stab, boxes, p):
        cfgl = seg.cfg
        valid = ((iou > cfgl.pred_iou_thresh)
                 & (stab >= cfgl.stability_score_thresh))
        iou_mat = sam_amg_mod.box_iou(boxes, boxes)
        T = iou.shape[0]
        same = jnp.ones((T, T), bool)
        keep = sam_amg_mod.nms_masked(iou_mat, iou, valid, same,
                                      cfgl.box_nms_thresh)
        K = cfgl.max_proposals
        score = jnp.where(keep, iou, -jnp.inf)
        order = jnp.argsort(-score)[:K]
        return keep[order], p[order // 3], (order % 3).astype(jnp.int32)

    # (a) score + NMS + select, no mask materialization
    def prog_a(v, e, p, ry, rx):
        iou, stab, boxes = seg._score_all_impl(v, e, p, ry, rx,
                                               hs, ws, h_in, w_in)
        sv, sp, sc = nms_select(iou, stab, boxes, p)
        return jnp.sum(sv) + jnp.sum(sp) + jnp.sum(sc)
    g = jax.jit(prog_a)
    report("amg.fused_score_nms",
           timed(lambda i: g(seg.vars, emb + i * 1e-7, pts, Ry, Rx)), per=1)

    # (b) score + masks_for on a FIXED selection (no NMS dependency)
    def prog_b(v, e, p, ry, rx):
        iou, stab, boxes = seg._score_all_impl(v, e, p, ry, rx,
                                               hs, ws, h_in, w_in)
        masks = seg._masks_for_impl(v, e, p[:128],
                                    jnp.zeros((128,), jnp.int32),
                                    ry, rx, hs, ws, h_in, w_in)
        return jnp.sum(iou) + jnp.sum(masks)
    g = jax.jit(prog_b)
    report("amg.fused_score_masks",
           timed(lambda i: g(seg.vars, emb + i * 1e-7, pts, Ry, Rx)), per=1)

    # (c) full propose but NMS as fixed 16-round fori_loop (no while_loop)
    def prog_c(v, e, p, ry, rx):
        iou, stab, boxes = seg._score_all_impl(v, e, p, ry, rx,
                                               hs, ws, h_in, w_in)
        cfgl = seg.cfg
        valid = ((iou > cfgl.pred_iou_thresh)
                 & (stab >= cfgl.stability_score_thresh))
        iou_mat = sam_amg_mod.box_iou(boxes, boxes)
        T = iou.shape[0]
        order0 = jnp.argsort(-jnp.where(valid, iou, -jnp.inf))
        iou_s = iou_mat[order0][:, order0]
        rank = jnp.arange(T)
        O = (iou_s > cfgl.box_nms_thresh) & (rank[None, :] < rank[:, None])

        def round_(_, state):
            kept, supp = state
            und = ~kept & ~supp
            hu = jnp.any(O & ~supp[None, :], axis=1)
            hk = jnp.any(O & kept[None, :], axis=1)
            return kept | (und & ~hu), supp | (und & hk)
        kept, _ = jax.lax.fori_loop(
            0, 16, round_, (jnp.zeros((T,), bool), ~valid[order0]))
        keep = jnp.zeros((T,), bool).at[order0].set(kept)
        K = cfgl.max_proposals
        score = jnp.where(keep, iou, -jnp.inf)
        order = jnp.argsort(-score)[:K]
        masks = seg._masks_for_impl(v, e, p[order // 3],
                                    (order % 3).astype(jnp.int32),
                                    ry, rx, hs, ws, h_in, w_in)
        return jnp.sum(masks) + jnp.sum(keep[order])
    g = jax.jit(prog_c)
    report("amg.fused_fori16",
           timed(lambda i: g(seg.vars, emb + i * 1e-7, pts, Ry, Rx)), per=1)

    # NMS over T=3072 candidates (the propose tail between the passes)
    from sam6d_tpu.ops.masks import nms_masked, box_iou
    T = 3072
    boxes = jnp.asarray(rng.rand(T, 4).astype(np.float32)) * 400
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + 20 + boxes[:, 2:] * 0.2)
    scores = jnp.asarray(rng.rand(T).astype(np.float32))
    validv = jnp.asarray(rng.rand(T) > 0.3)

    def nms_full(b, s, val):
        m = box_iou(b, b)
        keep = nms_masked(m, s, val, jnp.ones((T, T), bool), 0.7)
        return jnp.sum(keep)
    g = jax.jit(nms_full)
    report("amg.nms3072",
           timed(lambda i: g(boxes + i * 1e-7, scores, validv)), per=1)


# ------------------------------------------------------------------------ amgx

@exp("amgx")
def exp_amgx():
    """Isolate the AMG in-program NMS composition overhead: same matmul
    fixed-point rounds, varying ONLY the loop construct (no loop / fori-4 /
    while_loop) plus a no-NMS control. All fused with score_all."""
    import dataclasses
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    import sam6d_tpu.pipelines.sam_amg as sam_amg_mod

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    hs, ws, h_in, w_in = 480, 640, 768, 1024
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)

    def score(v, e, p):
        return seg._score_all_impl(v, e, p, Ry, Rx, hs, ws, h_in, w_in)

    def mk_prog(loop):
        def prog(v, e, p):
            iou, stab, boxes = score(v, e, p)
            valid = ((iou > cfg.pred_iou_thresh)
                     & (stab >= cfg.stability_score_thresh))
            im = sam_amg_mod.box_iou(boxes, boxes)
            s = jnp.where(valid, iou, -jnp.inf)
            T = s.shape[0]
            idx = jnp.arange(T)
            beats = (s[None, :] > s[:, None]) | (
                (s[None, :] == s[:, None]) & (idx[None, :] < idx[:, None]))
            O = (im > cfg.box_nms_thresh) & beats
            Of = O.astype(jnp.bfloat16)

            def round_fn(state):
                kept, supp = state
                und = ~kept & ~supp
                S = jnp.stack([(~supp).astype(jnp.bfloat16),
                               kept.astype(jnp.bfloat16)], axis=1)
                R = jax.lax.dot_general(Of, S, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                return (kept | (und & ~(R[:, 0] > 0)),
                        supp | (und & (R[:, 1] > 0)))

            st = (jnp.zeros((T,), bool), ~valid)
            if loop == "none":
                st = round_fn(st)
            elif loop == "fori4":
                st = jax.lax.fori_loop(0, 4, lambda _, s_: round_fn(s_), st)
            elif loop == "while":
                st = jax.lax.while_loop(
                    lambda s_: jnp.any(~s_[0] & ~s_[1]), round_fn, st)
            keep = st[0]
            K = cfg.max_proposals
            order = jnp.argsort(-jnp.where(keep, iou, -jnp.inf))[:K]
            return jnp.sum(order) + jnp.sum(keep)
        return jax.jit(prog)

    for loop in ("none", "fori4", "while"):
        g = mk_prog(loop)
        report(f"amgx.loop_{loop}",
               timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)

    # control: score_all alone in the identical harness
    g = jax.jit(lambda v, e, p: jnp.sum(score(v, e, p)[0]))
    report("amgx.score_only",
           timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)

    # bisect the (T, T) section: which constituent triggers the +107 ms?
    def mk_bisect(which):
        def prog(v, e, p):
            iou, stab, boxes = score(v, e, p)
            s = jnp.where(iou > cfg.pred_iou_thresh, iou, -jnp.inf)
            acc = jnp.sum(iou) + jnp.sum(stab)
            T = iou.shape[0]
            if which in ("box_iou", "both"):
                im = sam_amg_mod.box_iou(boxes, boxes)
                acc = acc + jnp.sum(im)
            if which in ("beats", "both"):
                idx = jnp.arange(T)
                beats = (s[None, :] > s[:, None]) | (
                    (s[None, :] == s[:, None])
                    & (idx[None, :] < idx[:, None]))
                acc = acc + jnp.sum(beats)
            if which == "outer_dummy":
                # same-size (T, T) tensor from constants, NOT map outputs
                z = jnp.arange(T, dtype=jnp.float32)
                acc = acc + jnp.sum((z[None, :] > z[:, None]) & (
                    (emb[0, 0, 0] + 1) > 0))
            return acc
        return jax.jit(prog)

    for which in ("box_iou", "beats", "both", "outer_dummy"):
        g = mk_bisect(which)
        report(f"amgx.bisect_{which}",
               timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)


@exp("amgy")
def exp_amgy():
    """Scaling law of the coexistence pathology: score_all (8-trip map)
    + a (T, T) outer op of varying T; plus the outer op without the map."""
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    hs, ws, h_in, w_in = 480, 640, 768, 1024
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)

    def outer(iou0, T):
        z = jnp.arange(T, dtype=jnp.float32) + iou0
        return jnp.sum((z[None, :] > z[:, None]).astype(jnp.float32))

    for T in (256, 1024, 3072):
        def prog(v, e, p, T=T):
            iou, stab, boxes = seg._score_all_impl(v, e, p, Ry, Rx,
                                                   hs, ws, h_in, w_in)
            return jnp.sum(iou) + outer(iou[0], T)
        g = jax.jit(prog)
        report(f"amgy.map_outer{T}",
               timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)

    # outer op alone (no map in program)
    for T in (3072,):
        g = jax.jit(lambda x, T=T: outer(x[0, 0, 0], T))
        report(f"amgy.outer{T}_alone",
               timed(lambda i: g(emb + i * 1e-7)), per=1)

    # scan-free score pass (Python-unrolled 8 chunks) +/- the outer op:
    # is the pathology scan-coexistence specifically?
    def score_unrolled(v, e, p):
        dense_pe = seg.prompt_encoder.apply(v["prompt_encoder"],
                                            method="dense_pe")
        from sam6d_tpu.ops.masks import masks_to_boxes
        cfgl = seg.cfg
        iou_l, stab_l, box_l = [], [], []
        for c in range(8):
            pc = jax.lax.dynamic_slice_in_dim(p, c * 128, 128, axis=0)
            masks, iou = seg._decode_chunk(v, e, dense_pe, pc)
            hi = seg._resize_logits_block(masks, Ry, Rx)
            inter = jnp.sum(hi > cfgl.stability_score_offset, axis=(-1, -2))
            union = jnp.sum(hi > -cfgl.stability_score_offset, axis=(-1, -2))
            iou_l.append(iou.reshape(-1))
            stab_l.append((inter / jnp.maximum(union, 1)).reshape(-1))
            box_l.append(masks_to_boxes(
                (hi.reshape(-1, hs, ws) > 0.0).astype(jnp.float32)))
        return (jnp.concatenate(iou_l), jnp.concatenate(stab_l),
                jnp.concatenate(box_l))

    g = jax.jit(lambda v, e, p: jnp.sum(score_unrolled(v, e, p)[0]))
    report("amgy.unrolled_score",
           timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)

    def prog_u(v, e, p):
        iou, stab, boxes = score_unrolled(v, e, p)
        return jnp.sum(iou) + outer(iou[0], 3072)
    g = jax.jit(prog_u)
    report("amgy.unrolled_outer3072",
           timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)


# ----------------------------------------------------------------------- amgz

@exp("amgz")
def exp_amgz():
    """Residual propose composition drag: which NMS-tail construct drags
    the fused propose program ~45 ms past its sum of parts? Variants of
    the FULL propose shape (score + NMS + top-K + mask materialization),
    one process, cheapest-compile first:

      nonms          — no NMS at all (composition floor)
      fixed16        — 16 unrolled fixed-point rounds, NO while_loop
      unroll12_while — 12 unrolled rounds + while_loop fallback (exact)
      while          — production while_loop fixed point (exact)
      topk1024       — while NMS on the top-1024 score prefix
      nomasks        — while NMS, no mask materialization (masks_for cost)
    """
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    import sam6d_tpu.pipelines.sam_amg as sam_amg_mod
    from sam6d_tpu.ops import masks as masks_mod

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    hs, ws, h_in, w_in = 480, 640, 768, 1024
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)

    def nms_fixed_rounds(im, sc, va, th, rounds):
        """fixed-point NMS body unrolled `rounds` times, no while_loop."""
        N = sc.shape[0]
        s = jnp.where(va, sc, -jnp.inf)
        idx = jnp.arange(N)
        beats = (s[None, :] > s[:, None]) | (
            (s[None, :] == s[:, None]) & (idx[None, :] < idx[:, None]))
        Of = ((im > th) & beats).astype(jnp.bfloat16)
        kept, supp = jnp.zeros((N,), bool), ~va
        for _ in range(rounds):
            und = ~kept & ~supp
            S = jnp.stack([(~supp).astype(jnp.bfloat16),
                           kept.astype(jnp.bfloat16)], axis=1)
            R = jax.lax.dot_general(Of, S, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            kept = kept | (und & ~(R[:, 0] > 0))
            supp = supp | (und & (R[:, 1] > 0))
        return kept

    def propose_like(v, e, p, mode):
        iou, stab, boxes = seg._score_all_impl(v, e, p, Ry, Rx,
                                               hs, ws, h_in, w_in)
        valid = ((iou > cfg.pred_iou_thresh)
                 & (stab >= cfg.stability_score_thresh))
        T = iou.shape[0]
        iou_t, valid_t, boxes_t, top = iou, valid, boxes, None
        if mode == "topk1024":
            _, top = jax.lax.top_k(jnp.where(valid, iou, -jnp.inf), 1024)
            iou_t, valid_t, boxes_t = iou[top], valid[top], boxes[top]
            T = 1024
        if mode == "nonms":
            keep = valid_t
        elif mode == "fixed16":
            im = sam_amg_mod.box_iou(boxes_t, boxes_t)
            keep = nms_fixed_rounds(im, iou_t, valid_t,
                                    cfg.box_nms_thresh, 16)
        else:
            im = sam_amg_mod.box_iou(boxes_t, boxes_t)
            same = jnp.ones((T, T), bool)
            keep = masks_mod.nms_masked(
                im, iou_t, valid_t, same, cfg.box_nms_thresh,
                unroll_rounds=12 if mode == "unroll12_while" else 0)
        K = cfg.max_proposals
        order_t = jnp.argsort(-jnp.where(keep, iou_t, -jnp.inf))[:K]
        order = top[order_t] if top is not None else order_t
        acc = jnp.sum(keep[order_t]) + jnp.sum(boxes[order])
        if mode != "nomasks":
            masks = seg._masks_for_impl(v, e, p[order // 3],
                                        (order % 3).astype(jnp.int32),
                                        Ry, Rx, hs, ws, h_in, w_in)
            acc = acc + jnp.sum(masks)
        return acc

    for mode in ("nonms", "fixed16", "unroll12_while", "while",
                 "topk1024", "nomasks"):
        g = jax.jit(lambda v, e, p, m=mode: propose_like(v, e, p, m))
        report(f"amgz.{mode}",
               timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)


@exp("amgw")
def exp_amgw():
    """What should propose OUTPUT instead of (K, hs, ws) bool masks?
    The amgz round-4 numbers showed NMS costs ~0.5 ms and the masks_for
    tail ~70 ms in composition. Variants of the full propose shape
    (score + while-NMS + top-K + <tail>), one process:

      boolout   — production tail: full-res bool masks (baseline)
      lowout    — channel-selected low-res block logits only (no resize)
      lowsums   — low logits + per-candidate full-res reductions computed
                  in-chunk: mask area, depth-weighted sums (the geometric
                  score's translation numerators), never writing hi-res
      lowfull   — lowsums + the 224^2 mask/rgb crop gathers (the describe
                  stage's input) fused where hi exists; outputs crops
    """
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    import sam6d_tpu.pipelines.sam_amg as sam_amg_mod
    from sam6d_tpu.ops import masks as masks_mod
    from sam6d_tpu.ops.images import masked_crop_resize_pad_nearest

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    hs, ws, h_in, w_in = 480, 640, 768, 1024
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    depth = jnp.asarray((rng.rand(hs, ws) * 1000).astype(np.float32))
    rgb01 = jnp.asarray(rng.rand(hs, ws, 3).astype(np.float32))
    Kmat = jnp.asarray(np.array([[600.0, 0, 320], [0, 600.0, 240],
                                 [0, 0, 1]], np.float32))

    def select(v, e, p):
        iou, stab, boxes = seg._score_all_impl(v, e, p, Ry, Rx,
                                               hs, ws, h_in, w_in)
        valid = ((iou > cfg.pred_iou_thresh)
                 & (stab >= cfg.stability_score_thresh))
        T = iou.shape[0]
        im = sam_amg_mod.box_iou(boxes, boxes)
        same = jnp.ones((T, T), bool)
        keep = masks_mod.nms_masked(im, iou, valid, same, cfg.box_nms_thresh)
        K = cfg.max_proposals
        _, order = jax.lax.top_k(jnp.where(keep, iou, -jnp.inf), K)
        return order, boxes[order], keep[order]

    def low_chunks(v, e, order):
        """Channel-selected decode of the K selected candidates, chunked
        like _masks_for_impl; yields (chunk, 4, 4g^2) block logits."""
        dense_pe = seg.prompt_encoder.apply(
            v["prompt_encoder"], method="dense_pe")
        K = order.shape[0]
        chunk = min(cfg.points_per_batch, K)
        sel_points = pts[order // 3]
        sel_channel = (order % 3).astype(jnp.int32)
        outs = []
        for c in range(K // chunk):
            low, _ = seg._decode_chunk(
                v, e, dense_pe,
                jax.lax.dynamic_slice_in_dim(sel_points, c * chunk, chunk, 0),
                sel_channel=jax.lax.dynamic_slice_in_dim(
                    sel_channel, c * chunk, chunk, 0))
            outs.append(low)
        return outs

    # depth-weighted fields for the geometric translation (X, Y, Z planes)
    Zs = depth / 1000.0
    u = jnp.arange(ws, dtype=jnp.float32)[None, :]
    vv = jnp.arange(hs, dtype=jnp.float32)[:, None]
    Xf = (u - Kmat[0, 2]) * Zs / Kmat[0, 0]
    Yf = (vv - Kmat[1, 2]) * Zs / Kmat[1, 1]
    fields = jnp.stack([Xf, Yf, Zs, (Zs > 0).astype(jnp.float32)])  # (4,hs,ws)

    def tail_sums(hi_bool):
        """(chunk, hs, ws) bool -> per-candidate (chunk, 5): area + the
        4 depth-field sums over mask & depth>0 pixels."""
        m = hi_bool.astype(jnp.bfloat16)
        area = jnp.sum(m, axis=(1, 2))
        mz = m * (Zs > 0).astype(jnp.bfloat16)[None]
        sums = jnp.einsum("khw,fhw->kf", mz, fields.astype(jnp.bfloat16))
        return jnp.concatenate([area[:, None], sums], axis=1)

    def propose_like(v, e, p, rgb, mode):
        order, boxes_k, keep_k = select(v, e, p)
        acc = jnp.sum(boxes_k) + jnp.sum(keep_k)
        if mode == "boolout":
            masks = seg._masks_for_impl(
                v, e, pts[order // 3], (order % 3).astype(jnp.int32),
                Ry, Rx, hs, ws, h_in, w_in)
            return acc + jnp.sum(masks)
        lows = low_chunks(v, e, order)
        if mode == "lowout":
            return acc + sum(jnp.sum(lo) for lo in lows)
        # lowsums / lowfull: resize per chunk, reduce in place
        hi_chunks = [seg._resize_logits_block(lo, Ry, Rx)[:, 0] > 0.0
                     for lo in lows]
        sums = jnp.concatenate([tail_sums(h) for h in hi_chunks])
        acc = acc + jnp.sum(sums) + sum(jnp.sum(lo) for lo in lows)
        if mode == "lowfull":
            masks_full = jnp.concatenate(hi_chunks)
            crops, mask_crops = masked_crop_resize_pad_nearest(
                rgb, masks_full, boxes_k, 224)
            acc = acc + jnp.sum(crops) + jnp.sum(mask_crops)
        return acc

    for mode in ("lowout", "lowsums", "lowfull", "boolout"):
        g = jax.jit(lambda v, e, p, r, m=mode: propose_like(v, e, p, r, m))
        report(f"amgw.{mode}",
               timed(lambda i: g(seg.vars, emb + i * 1e-7, pts, rgb01)),
               per=1)


@exp("amgv")
def exp_amgv():
    """The ~70 ms composition drag is the masks_for RE-DECODE (amgw: lowout
    ~= boolout; amgz: nomasks -70). Alternatives, one process:

      boolout        — production: channel-selected re-decode (baseline)
      keeplow        — NO re-decode: the score pass stores every candidate's
                       low-res block logits (402 MB bf16); selection gathers
                       128 rows, resize+threshold as today
      redecode_nosel — re-decode all 3 channels, one-hot channel contraction
                       (the pre-e71ac39 path)
      redecode_fixed — channel-selected re-decode of NMS-INDEPENDENT inputs
                       (pts[:K//3] x iota channels): isolates the cost of
                       the data dependence on the NMS order
    """
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    import sam6d_tpu.pipelines.sam_amg as sam_amg_mod
    from sam6d_tpu.ops import masks as masks_mod

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    hs, ws, h_in, w_in = 480, 640, 768, 1024
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    K = cfg.max_proposals

    def score_all_keep(v, e, p):
        """_score_all_impl body, also returning the low block logits
        (3P, 4, N4) in candidate order (p*3 + channel)."""
        dense_pe = seg.prompt_encoder.apply(
            v["prompt_encoder"], method="dense_pe")
        chunk = cfg.points_per_batch
        P = p.shape[0]
        iou_l, stab_l, box_l, low_l = [], [], [], []
        for c in range(P // chunk):
            pc = jax.lax.dynamic_slice_in_dim(p, c * chunk, chunk, 0)
            masks, iou = seg._decode_chunk(v, e, dense_pe, pc)
            hi = seg._resize_logits_block(masks, Ry, Rx)
            inter = jnp.sum(hi > cfg.stability_score_offset, axis=(-1, -2))
            union = jnp.sum(hi > -cfg.stability_score_offset, axis=(-1, -2))
            stability = inter / jnp.maximum(union, 1)
            flat = hi.reshape(-1, hs, ws)
            boxes = masks_mod.masks_to_boxes((flat > 0.0).astype(jnp.float32))
            iou_l.append(iou.reshape(-1))
            stab_l.append(stability.reshape(-1))
            box_l.append(boxes)
            N4 = masks.shape[-1]
            low_l.append(masks.reshape(chunk, 3, 4, N4).reshape(
                chunk * 3, 4, N4))
        return (jnp.concatenate(iou_l), jnp.concatenate(stab_l),
                jnp.concatenate(box_l), jnp.concatenate(low_l))

    def select(iou, stab, boxes):
        valid = ((iou > cfg.pred_iou_thresh)
                 & (stab >= cfg.stability_score_thresh))
        T = iou.shape[0]
        im = sam_amg_mod.box_iou(boxes, boxes)
        same = jnp.ones((T, T), bool)
        keep = masks_mod.nms_masked(im, iou, valid, same, cfg.box_nms_thresh)
        _, order = jax.lax.top_k(jnp.where(keep, iou, -jnp.inf), K)
        return order, keep

    def propose_like(v, e, p, mode):
        if mode == "keeplow":
            iou, stab, boxes, low = score_all_keep(v, e, p)
        else:
            iou, stab, boxes = seg._score_all_impl(v, e, p, Ry, Rx,
                                                   hs, ws, h_in, w_in)
        if mode == "scoreonly":
            return jnp.sum(iou) + jnp.sum(stab) + jnp.sum(boxes)
        order, keep = select(iou, stab, boxes)
        if mode == "scoretopk":
            return jnp.sum(boxes[order]) + jnp.sum(keep[order])
        acc = jnp.sum(boxes[order]) + jnp.sum(keep[order])
        if mode == "keeplow":
            sel_low = low[order]                       # (K, 4, N4)
            masks = seg._resize_logits_block(sel_low, Ry, Rx)[:, 0] > 0.0
            return acc + jnp.sum(masks)
        if mode == "boolout":
            masks = seg._masks_for_impl(
                v, e, pts[order // 3], (order % 3).astype(jnp.int32),
                Ry, Rx, hs, ws, h_in, w_in)
            return acc + jnp.sum(masks)
        dense_pe = seg.prompt_encoder.apply(
            v["prompt_encoder"], method="dense_pe")
        if mode == "redecode_nosel":
            sel_pts = pts[order // 3]
            chunk = min(cfg.points_per_batch, K)
            outs = []
            for c in range(K // chunk):
                m12, _ = seg._decode_chunk(
                    v, e, dense_pe,
                    jax.lax.dynamic_slice_in_dim(sel_pts, c * chunk, chunk, 0))
                ch = jax.lax.dynamic_slice_in_dim(order % 3, c * chunk,
                                                  chunk, 0)
                oh = jax.nn.one_hot(ch, 3, dtype=m12.dtype)
                N4 = m12.shape[-1]
                m_sel = jnp.einsum("kc,kcrn->krn", oh,
                                   m12.reshape(chunk, 3, 4, N4))
                outs.append(seg._resize_logits_block(m_sel, Ry, Rx)[:, 0] > 0.0)
            return acc + sum(jnp.sum(o) for o in outs)
        if mode == "redecode_fixed":
            fixed_pts = pts[:K]
            fixed_ch = (jnp.arange(K) % 3).astype(jnp.int32)
            masks = seg._masks_for_impl(v, e, fixed_pts, fixed_ch,
                                        Ry, Rx, hs, ws, h_in, w_in)
            return acc + jnp.sum(masks)
        raise ValueError(mode)

    for mode in ("scoreonly", "scoretopk", "keeplow", "redecode_nosel",
                 "redecode_fixed", "boolout"):
        g = jax.jit(lambda v, e, p, m=mode: propose_like(v, e, p, m))
        report(f"amgv.{mode}",
               timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)


# ----------------------------------------------------------------------- seg

@exp("seg")
def exp_seg():
    """Full seg stage (encoder + propose in ONE program — the bench_seg /
    production shape): does the encoder 32-block scan pay the
    scan-coexistence tax next to the AMG tail's (T, T) ops? scan vs
    unrolled encoder, encoder alone as the floor."""
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    results = {}
    # (the encoder_unroll knob was deleted after round-4 measurement:
    # fused_unroll 227.9 vs fused_scan 228.0 — no effect)
    for name, prefix in (("seg.fused_prefix0", 0.0),
                         ("seg.fused_prefix256", 2.0),
                         ("seg.fused_prefix128", 1.0)):
        cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                        stability_score_thresh=0.0,
                        amg_iou_prefix_factor=prefix)
        seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
        canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
        Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
        canvas_j = jnp.asarray(canvas[None])

        def run(v, c):
            masks, boxes, valid, iou = seg._propose_impl(
                v, seg.encoder.apply(v["image_encoder"], c)[0],
                pts, Ry, Rx, hs, ws, h_in, w_in)
            return (jnp.sum(masks) + jnp.sum(boxes) + jnp.sum(valid)
                    + jnp.sum(iou))

        prog = jax.jit(run)
        report(name, timed(lambda i: prog(seg.vars, canvas_j + i * 1e-6)),
               per=1)
        if prefix == 0:
            enc = jax.jit(lambda v, c: jnp.sum(
                seg.encoder.apply(v["image_encoder"], c)))
            report("seg.enc_only_scan",
                   timed(lambda i: enc(seg.vars, canvas_j + i * 1e-6)),
                   per=1)
        if prefix == 1.0:
            # exact-score decode with factored keys + kernels: round-2
            # measured factored LOSING 6.7 vs 6.1 ms/chunk pre-kernels —
            # re-decide now that the factored machinery is kernel-backed
            from sam6d_tpu.models.sam import MaskDecoder
            import jax as _jax
            seg.mask_decoder = MaskDecoder(
                transformer_dim=cfg.prompt_embed_dim, block_layout=True,
                block_masks=True, factored_keys=True,
                factored_kernel=(_jax.default_backend() == "tpu"),
                dtype=jnp.bfloat16)
            prog_f = jax.jit(run)
            report("seg.fused_prefix128_factored_decode",
                   timed(lambda i: prog_f(seg.vars, canvas_j + i * 1e-6)),
                   per=1)


# ---------------------------------------------------------------------- match

@exp("match")
def exp_match():
    """ISM match stage decomposition at capacity 128: full fused score
    program (adaptive while_loop describe) vs describe alone vs an
    unrolled describe (Python chunk loop, lax.cond-gated per chunk for
    adaptivity) fused with the scores."""
    from sam6d_tpu.core.config import ISMConfig, SAMConfig
    from sam6d_tpu.pipelines.ism import ISMPipeline

    rng = np.random.RandomState(0)
    P = 128
    cfg = ISMConfig(sam=SAMConfig(max_proposals=P))
    pipe = ISMPipeline(cfg, dinov2_variables="eval_shape",
                       dtype=jnp.bfloat16)
    H, W = 480, 640
    rgb01 = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(P, H, W) > 0.9).astype(np.float32))
    boxes_np = np.zeros((P, 4), np.float32)
    boxes_np[:, 0] = rng.randint(0, W // 2, P)
    boxes_np[:, 1] = rng.randint(0, H // 2, P)
    boxes_np[:, 2] = boxes_np[:, 0] + rng.randint(20, W // 2, P)
    boxes_np[:, 3] = boxes_np[:, 1] + rng.randint(20, H // 2, P)
    boxes = jnp.asarray(boxes_np)
    valid = jnp.ones((P,), bool)
    depth = jnp.asarray((rng.rand(H, W) * 1000).astype(np.float32))
    Kmat = jnp.asarray(np.array([[600.0, 0, 320], [0, 600.0, 240],
                                 [0, 0, 1]], np.float32))
    d = cfg.dinov2
    ref_desc = jnp.asarray(rng.rand(1, 42, d.embed_dim).astype(np.float32))
    n_patch = (d.img_size // d.patch_size) ** 2
    ref_appe = jnp.asarray(
        rng.rand(1, 42, n_patch, d.embed_dim).astype(np.float32))
    poses_R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (42, 1, 1)))
    clouds = jnp.asarray(rng.rand(1, 2048, 3).astype(np.float32) * 0.05)

    args = (masks, boxes, valid, depth, Kmat, jnp.float32(1.0),
            ref_desc, ref_appe, poses_R, clouds)

    g = jax.jit(lambda v, r, *a: jnp.sum(pipe._score_frame_impl(
        v, r, *a, apply_nms=True)["scores"]))
    report("match.full128",
           timed(lambda i: g(pipe.dinov2_vars, rgb01 + i * 1e-7, *args)), per=1)

    # describe alone (adaptive while_loop, all 128 needed)
    g = jax.jit(lambda v, r, m, b: jnp.sum(pipe._describe_impl(
        v, r, m, b, jnp.int32(P))[0]))
    report("match.describe_while128",
           timed(lambda i: g(pipe.dinov2_vars, rgb01 + i * 1e-7, masks,
                             boxes.astype(jnp.int32))), per=1)

    # unrolled describe: Python loop over chunks, each behind lax.cond
    from sam6d_tpu.models.dinov2 import masked_patch_descriptors
    from sam6d_tpu.ops.images import (masked_crop_resize_pad_nearest,
                                      normalize_imagenet)
    chunk = d.chunk_size

    def describe_unrolled(v, rgb01_, masks_, boxes_, n_needed):
        rgb = normalize_imagenet(rgb01_)
        crops, mask_crops = masked_crop_resize_pad_nearest(
            rgb, masks_, boxes_, d.img_size)
        n_chunks = P // chunk
        cls_l, patch_l = [], []
        shapes = jax.eval_shape(
            lambda x: pipe.dinov2.apply(v, x), crops[:chunk])
        for c in range(n_chunks):
            x = jax.lax.dynamic_slice_in_dim(crops, c * chunk, chunk, 0)
            cls_c, patch_c = jax.lax.cond(
                n_needed > c * chunk,
                lambda x: pipe.dinov2.apply(v, x),
                lambda x: (jnp.zeros(shapes[0].shape, shapes[0].dtype),
                           jnp.zeros(shapes[1].shape, shapes[1].dtype)),
                x)
            cls_l.append(cls_c)
            patch_l.append(patch_c)
        cls = jnp.concatenate(cls_l)
        patch = jnp.concatenate(patch_l)
        patch = masked_patch_descriptors(patch, mask_crops, d.patch_size,
                                         d.validity_thresh)
        return cls, patch

    g = jax.jit(lambda v, r, m, b: jnp.sum(describe_unrolled(
        v, r, m, b, jnp.int32(P))[0]))
    report("match.describe_unrolled128",
           timed(lambda i: g(pipe.dinov2_vars, rgb01 + i * 1e-7, masks,
                             boxes.astype(jnp.int32))), per=1)
    g48 = jax.jit(lambda v, r, m, b: jnp.sum(
        describe_unrolled(v, r, m, b, jnp.int32(48))[0]))
    report("match.describe_unrolled48",
           timed(lambda i: g48(pipe.dinov2_vars, rgb01 + i * 1e-7, masks,
                               boxes.astype(jnp.int32))), per=1)


@exp("amgu")
def exp_amgu():
    """Score-pass floor decomposition (amgv.scoreonly = 151 ms for 8
    unrolled chunks of 128 prompts): which part of the chunk body costs?
    Each mode is the FULL 8-chunk unrolled program, one process:

      dec        — decode only (block logits + iou)
      resize     — + block resize to (chunk, 3, hs, ws), summed
      stab       — + stability counts (no boxes)
      boxes      — + masks_to_boxes (no stability)
      full       — the production one() (= amgv.scoreonly)
    """
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.ops.masks import masks_to_boxes

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    hs, ws, h_in, w_in = 480, 640, 768, 1024
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    off = cfg.stability_score_offset

    def run(v, e, p, mode):
        dense_pe = seg.prompt_encoder.apply(
            v["prompt_encoder"], method="dense_pe")
        chunk = cfg.points_per_batch
        acc = jnp.float32(0)
        for c in range(p.shape[0] // chunk):
            pc = jax.lax.dynamic_slice_in_dim(p, c * chunk, chunk, 0)
            masks, iou = seg._decode_chunk(v, e, dense_pe, pc)
            acc = acc + jnp.sum(iou)
            if mode == "dec":
                acc = acc + jnp.sum(masks)
                continue
            hi = seg._resize_logits_block(masks, Ry, Rx)
            if mode == "resize":
                acc = acc + jnp.sum(hi)
                continue
            if mode in ("stab", "full"):
                inter = jnp.sum(hi > off, axis=(-1, -2))
                union = jnp.sum(hi > -off, axis=(-1, -2))
                acc = acc + jnp.sum(inter / jnp.maximum(union, 1))
            if mode in ("boxes", "full"):
                flat = hi.reshape(-1, hs, ws)
                acc = acc + jnp.sum(masks_to_boxes(
                    (flat > 0.0).astype(jnp.float32)))
        return acc

    for mode in ("dec", "resize", "stab", "boxes", "full"):
        g = jax.jit(lambda v, e, p, m=mode: run(v, e, p, m))
        report(f"amgu.{mode}",
               timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)


@exp("amgt")
def exp_amgt():
    """Decode-floor variants (amgu.dec = 130 ms for 8x128 chunks ~= 4x its
    FLOP+bandwidth floor): factored keys, chunk size, rank-only floor.
    Each mode is the full 8-chunk unrolled decode-only program."""
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)

    def run(name, chunk, factored=False, rank_only=False):
        seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
        if factored:
            import dataclasses
            seg.mask_decoder = dataclasses.replace(
                seg.mask_decoder, factored_keys=True)
        _, _, pts = seg.frame_constants(480, 640, 768, 1024)

        def prog(v, e, p):
            dense_pe = seg.prompt_encoder.apply(
                v["prompt_encoder"], method="dense_pe")
            acc = jnp.float32(0)
            for c in range(p.shape[0] // chunk):
                pc = jax.lax.dynamic_slice_in_dim(p, c * chunk, chunk, 0)
                m, iou = seg._decode_chunk(v, e, dense_pe, pc,
                                           rank_only=rank_only)
                acc = acc + jnp.sum(m) + jnp.sum(iou)
            return acc

        g = jax.jit(prog)
        report(name, timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)),
               per=1)

    run("amgt.dec128", 128)
    run("amgt.dec128_factored", 128, factored=True)
    run("amgt.dec64", 64)
    run("amgt.dec256", 256)
    run("amgt.dec128_rankonly", 128, rank_only=True)


@exp("amgs")
def exp_amgs():
    """Exact two-pass decode: an iou-only factored pass (no (B,N,C)
    tensors, no mask tail — exact token outputs) over all 1024 points,
    then the full exact decode on the top-P points only. Compare against
    amgt.dec128 = 126.2 ms (8x128 exact chunks)."""
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    _, _, pts = seg.frame_constants(480, 640, 768, 1024)

    def iou_pass(v, e, p, chunk):
        dense_pe = seg.prompt_encoder.apply(
            v["prompt_encoder"], method="dense_pe")
        ious = []
        for c in range(p.shape[0] // chunk):
            pc = jax.lax.dynamic_slice_in_dim(p, c * chunk, chunk, 0)
            _, iou = seg._decode_chunk(v, e, dense_pe, pc, iou_only=True)
            ious.append(iou)
        return jnp.concatenate(ious)

    for chunk in (128, 256, 512):
        g = jax.jit(lambda v, e, p, c=chunk: jnp.sum(iou_pass(v, e, p, c)))
        report(f"amgs.iou{chunk}",
               timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)

    def twopass(v, e, p, topp):
        dense_pe = seg.prompt_encoder.apply(
            v["prompt_encoder"], method="dense_pe")
        iou_a = iou_pass(v, e, p, 256)              # (P, 3) exact
        key = jnp.max(iou_a, axis=1)
        _, top = jax.lax.top_k(key, topp)
        sel = p[top]
        acc = jnp.float32(0)
        for c in range(topp // 128):
            pc = jax.lax.dynamic_slice_in_dim(sel, c * 128, 128, 0)
            m, iou = seg._decode_chunk(v, e, dense_pe, pc)
            acc = acc + jnp.sum(m) + jnp.sum(iou)
        return acc + jnp.sum(iou_a)

    for topp in (128, 256):
        g = jax.jit(lambda v, e, p, t=topp: twopass(v, e, p, t))
        report(f"amgs.twopass{topp}",
               timed(lambda i: g(seg.vars, emb + i * 1e-7, pts)), per=1)


@exp("dinof")
def exp_dinof():
    """Match-stage itemization at capacity 128: GEMM floor, bare trunk
    (8x16 chunks, one jit), cond-gated trunk (production shape), single
    batch-128 apply, crop-gather alone. Finds where the describe loses
    ~2x vs the ViT-L GEMM floor (~101 ms for 8 chunks at 197 TF/s)."""
    from sam6d_tpu.core.config import DINOv2Config
    from sam6d_tpu.models.dinov2 import DINOv2
    from sam6d_tpu.core.params import cast_float_params

    rng = np.random.RandomState(0)
    c = DINOv2Config()
    D, Hd = c.embed_dim, c.num_heads
    M = 16 * 257

    # 1) pure GEMM stack floor at trunk shapes
    x = jnp.asarray(rng.rand(M, D).astype(np.float32)).astype(jnp.bfloat16)
    Wqkv = jnp.asarray(rng.rand(c.depth, D, 3 * D).astype(np.float32) * .01
                       ).astype(jnp.bfloat16)
    Wp = jnp.asarray(rng.rand(c.depth, D, D).astype(np.float32) * .01
                     ).astype(jnp.bfloat16)
    W1 = jnp.asarray(rng.rand(c.depth, D, 4 * D).astype(np.float32) * .01
                     ).astype(jnp.bfloat16)
    W2 = jnp.asarray(rng.rand(c.depth, 4 * D, D).astype(np.float32) * .01
                     ).astype(jnp.bfloat16)

    def block(h, w):
        wqkv, wp, w1, w2 = w
        q = h @ wqkv
        q = q[:, :D] + q[:, D:2 * D] * 0.1 + q[:, 2 * D:] * 0.1
        h = h + q @ wp
        return h + jax.nn.gelu(h @ w1) @ w2

    @jax.jit
    def gemm8(x, ws):
        acc = jnp.float32(0)
        for i in range(8):
            y, _ = jax.lax.scan(lambda cc, w: (block(cc, w), None),
                                x + i * 1e-6, ws)
            acc += jnp.sum(y)
        return acc

    sec = timed(lambda i: gemm8(x + i * 1e-6, (Wqkv, Wp, W1, W2)))
    report("dinof.gemm8x16", sec, per=1)
    flops = 8 * c.depth * (M * D * 3 * D + M * D * D + 2 * M * D * 4 * D) * 2
    _log(f"dinof.gemm8x16: {flops/sec/1e12:.1f} TF/s")

    net = DINOv2(patch_size=c.patch_size, embed_dim=D, depth=c.depth,
                 num_heads=Hd, dtype=jnp.bfloat16)
    xi = jnp.asarray(rng.rand(16, 224, 224, 3).astype(np.float32)).astype(
        jnp.bfloat16)
    v = cast_float_params(init_like(
        lambda: net.init(jax.random.PRNGKey(0), xi[:1])), jnp.bfloat16)

    @jax.jit
    def trunk8(v, xx):
        acc = jnp.float32(0)
        for i in range(8):
            cls, patch = net.apply(v, xx + i * 1e-6)
            acc += jnp.sum(cls) + jnp.sum(patch)
        return acc
    report("dinof.trunk8x16", timed(lambda i: trunk8(v, xi + i * 1e-6)),
           per=1)

    netf = DINOv2(patch_size=c.patch_size, embed_dim=D, depth=c.depth,
                  num_heads=Hd, dtype=jnp.bfloat16, use_flash=True)

    @jax.jit
    def trunkf8(v, xx):
        acc = jnp.float32(0)
        for i in range(8):
            cls, patch = netf.apply(v, xx + i * 1e-6)
            acc += jnp.sum(cls) + jnp.sum(patch)
        return acc
    report("dinof.trunkflash8x16",
           timed(lambda i: trunkf8(v, xi + i * 1e-6)), per=1)

    @jax.jit
    def cond8(v, xx, n):
        acc = jnp.float32(0)
        for i in range(8):
            cls, patch = jax.lax.cond(
                n > i * 16,
                lambda q: net.apply(v, q),
                lambda q: (jnp.zeros((16, D), jnp.bfloat16),
                           jnp.zeros((16, 256, D), jnp.bfloat16)),
                xx + i * 1e-6)
            acc += jnp.sum(cls) + jnp.sum(patch)
        return acc
    report("dinof.cond8x16",
           timed(lambda i: cond8(v, xi + i * 1e-6, jnp.int32(128))), per=1)

    xb = jnp.concatenate([xi] * 8)

    @jax.jit
    def batch128(v, xx):
        cls, patch = net.apply(v, xx)
        return jnp.sum(cls) + jnp.sum(patch)
    report("dinof.batch128", timed(lambda i: batch128(v, xb + i * 1e-6)),
           per=1)

    # crop-gather alone at capacity
    from sam6d_tpu.ops.images import masked_crop_resize_pad_nearest
    rgb = jnp.asarray(rng.rand(480, 640, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(128, 480, 640) > 0.7).astype(np.float32))
    boxes = jnp.asarray(
        np.stack([np.full(128, 10.), np.full(128, 10.),
                  np.full(128, 500.), np.full(128, 400.)], -1)
        .astype(np.float32))

    @jax.jit
    def cropg(rgb, masks, boxes):
        cr, mc = masked_crop_resize_pad_nearest(rgb, masks, boxes, 224)
        return jnp.sum(cr) + jnp.sum(mc)
    report("dinof.crop128",
           timed(lambda i: cropg(rgb + i * 1e-6, masks, boxes)), per=1)


@exp("dinoi")
def exp_dinoi():
    """Pinpoint the DINOv2 trunk's ~93 ms non-GEMM overhead (dinof:
    trunk8x16 204.2 vs gemm8x16 110.1): incrementally add the attention
    einsum chain, LayerNorms, LayerScale to the pure GEMM stack. All
    variants run the same 8-chunk x 24-block x (4112, 1024) shapes."""
    from sam6d_tpu.core.config import DINOv2Config

    rng = np.random.RandomState(0)
    c = DINOv2Config()
    D, Hd, depth = c.embed_dim, c.num_heads, c.depth
    B, N = 16, 257
    hd = D // Hd
    x0 = jnp.asarray(rng.rand(B, N, D).astype(np.float32)).astype(
        jnp.bfloat16)
    mk = lambda *sh: jnp.asarray(
        rng.rand(*sh).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    ws = dict(wqkv=mk(depth, D, 3 * D), wp=mk(depth, D, D),
              w1=mk(depth, D, 4 * D), w2=mk(depth, 4 * D, D),
              g1=mk(depth, D), b1=mk(depth, D), g2=mk(depth, D),
              b2=mk(depth, D), ls1=mk(depth, D), ls2=mk(depth, D))

    def ln(x, g, b):
        m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        return (((x - m) * jax.lax.rsqrt(v + 1e-6)).astype(x.dtype)
                * g + b)

    def block(x, w, attn, norms, scale):
        wqkv, wp, w1, w2, g1, b1, g2, b2, ls1, ls2 = w
        h = ln(x, g1, b1) if norms else x
        qkv = h @ wqkv
        if attn:
            qkv = qkv.reshape(B, N, 3, Hd, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            a = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(
                x.dtype)
            a = jax.nn.softmax(a, axis=-1)
            o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, D)
        else:
            o = (qkv[..., :D] + qkv[..., D:2 * D] * 0.1
                 + qkv[..., 2 * D:] * 0.1)
        o = o @ wp
        x = x + (ls1 * o if scale else o)
        h = ln(x, g2, b2) if norms else x
        o = jax.nn.gelu(h @ w1) @ w2
        return x + (ls2 * o if scale else o)

    order = ("wqkv", "wp", "w1", "w2", "g1", "b1", "g2", "b2", "ls1", "ls2")
    wtup = tuple(ws[k] for k in order)

    def run(name, attn, norms, scale):
        @jax.jit
        def prog(x, ws):
            acc = jnp.float32(0)
            for i in range(8):
                y, _ = jax.lax.scan(
                    lambda cc, w: (block(cc, w, attn, norms, scale), None),
                    x + i * 1e-6, ws)
                acc += jnp.sum(y)
            return acc
        report(name, timed(lambda i: prog(x0 + i * 1e-6, wtup)), per=1)

    run("dinoi.gemm", False, False, False)
    run("dinoi.gemm_attn", True, False, False)
    run("dinoi.gemm_ln", False, True, False)
    run("dinoi.gemm_attn_ln", True, True, False)
    run("dinoi.full", True, True, True)


@exp("dinoi2")
def exp_dinoi2():
    """Close the dinoi gap: synthetic full block = 151.6 ms but the real
    flax trunk = 204.2 — isolate the ~52 ms difference (exact-erf gelu,
    Dense biases, patch embed, flax block machinery) and test candidate
    fixes (direct per-head qkv projection layout, bf16 softmax)."""
    from sam6d_tpu.core.config import DINOv2Config
    from sam6d_tpu.core.params import cast_float_params
    from sam6d_tpu.models.dinov2 import DinoBlock, _ScanDinoBlock
    from flax import linen as nn

    rng = np.random.RandomState(0)
    c = DINOv2Config()
    D, Hd, depth = c.embed_dim, c.num_heads, c.depth
    B, N = 16, 257
    hd = D // Hd
    x0 = jnp.asarray(rng.rand(B, N, D).astype(np.float32)).astype(
        jnp.bfloat16)
    mk = lambda *sh: jnp.asarray(
        rng.rand(*sh).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    ws = dict(wqkv=mk(depth, D, 3 * D), bqkv=mk(depth, 3 * D),
              wp=mk(depth, D, D), bp=mk(depth, D),
              w1=mk(depth, D, 4 * D), bb1=mk(depth, 4 * D),
              w2=mk(depth, 4 * D, D), bb2=mk(depth, D),
              g1=mk(depth, D), b1=mk(depth, D), g2=mk(depth, D),
              b2=mk(depth, D))

    def ln(x, g, b):
        m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        return (((x - m) * jax.lax.rsqrt(v + 1e-6)).astype(x.dtype) * g + b)

    def block(x, w, gelu_exact, bias, qkv_layout, sm_bf16):
        (wqkv, bqkv, wp, bp, w1, bb1, w2, bb2, g1, b1, g2, b2) = w
        h = ln(x, g1, b1)
        qkv = h @ wqkv
        if bias:
            qkv = qkv + bqkv
        if qkv_layout == "direct":
            # (B, N, 3D) -> (B, N, 3, H, hd) avoided: reshape straight to
            # heads-last splits then transpose once each
            q = qkv[..., :D].reshape(B, N, Hd, hd)
            k = qkv[..., D:2 * D].reshape(B, N, Hd, hd)
            v = qkv[..., 2 * D:].reshape(B, N, Hd, hd)
        else:
            qkv5 = qkv.reshape(B, N, 3, Hd, hd)
            q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(x.dtype)
        if sm_bf16:
            a = jax.nn.softmax(a, axis=-1)
        else:
            a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, D)
        o = o @ wp
        if bias:
            o = o + bp
        x = x + o
        h = ln(x, g2, b2)
        a1 = h @ w1 + (bb1 if bias else 0)
        if gelu_exact == "poly7":
            t = jnp.clip(a1.astype(jnp.float32), -6.75, 6.75)
            t2 = t * t
            g = t * (0.7976052307243347 + t2 * (3.68622565e-2 + t2 * (
                -3.02642355e-4 + t2 * -4.21100625e-6)))
            a1 = (0.5 * a1.astype(jnp.float32)
                  * (1.0 + jnp.tanh(g))).astype(a1.dtype)
        else:
            a1 = jax.nn.gelu(a1, approximate=not gelu_exact)
        o = a1 @ w2
        if bias:
            o = o + bb2
        return x + o

    order = ("wqkv", "bqkv", "wp", "bp", "w1", "bb1", "w2", "bb2",
             "g1", "b1", "g2", "b2")
    wtup = tuple(ws[k] for k in order)

    def run(name, **kw):
        @jax.jit
        def prog(x, ws):
            acc = jnp.float32(0)
            for i in range(8):
                y, _ = jax.lax.scan(
                    lambda cc, w: (block(cc, w, **kw), None),
                    x + i * 1e-6, ws)
                acc += jnp.sum(y)
            return acc
        report(name, timed(lambda i: prog(x0 + i * 1e-6, wtup)), per=1)

    base = dict(gelu_exact=False, bias=False, qkv_layout="3slice",
                sm_bf16=True)
    run("dinoi2.base", **base)
    run("dinoi2.gelu_exact", **{**base, "gelu_exact": True})
    run("dinoi2.bias", **{**base, "bias": True})
    run("dinoi2.all_flaxlike", gelu_exact=True, bias=True,
        qkv_layout="3slice", sm_bf16=True)
    run("dinoi2.direct_qkv", **{**base, "qkv_layout": "direct"})
    run("dinoi2.sm_fp32", **{**base, "sm_bf16": False})
    run("dinoi2.gelu_poly7", **{**base, "gelu_exact": "poly7"})

    # the real flax block stack on token input (no patch embed): flax
    # machinery vs the synthetic
    Scanned = nn.scan(_ScanDinoBlock, variable_axes={"params": 0},
                      split_rngs={"params": True}, length=depth)
    mod = Scanned(D, Hd, 4.0, dtype=jnp.bfloat16, name=None)
    v = cast_float_params(init_like(
        lambda: mod.init(jax.random.PRNGKey(0), x0, None)), jnp.bfloat16)

    @jax.jit
    def flaxprog(v, x):
        acc = jnp.float32(0)
        for i in range(8):
            y, _ = mod.apply(v, x + i * 1e-6, None)
            acc += jnp.sum(y)
        return acc
    report("dinoi2.flaxblocks", timed(lambda i: flaxprog(v, x0 + i * 1e-6)),
           per=1)

    # patch embed + pos + cls concat alone, x8
    from sam6d_tpu.models.vit import PatchEmbed
    pe = PatchEmbed(D, c.patch_size, dtype=jnp.bfloat16)
    xi = jnp.asarray(rng.rand(16, 224, 224, 3).astype(np.float32)).astype(
        jnp.bfloat16)
    vpe = cast_float_params(init_like(
        lambda: pe.init(jax.random.PRNGKey(0), xi)), jnp.bfloat16)
    cls = mk(1, 1, D)
    pos = mk(1, N, D)

    @jax.jit
    def peprog(vpe, xi):
        acc = jnp.float32(0)
        for i in range(8):
            y = pe.apply(vpe, xi + i * 1e-6).reshape(16, 256, D)
            y = jnp.concatenate(
                [jnp.broadcast_to(cls, (16, 1, D)), y], axis=1) + pos
            acc += jnp.sum(y)
        return acc
    report("dinoi2.patchembed", timed(lambda i: peprog(vpe, xi + i * 1e-6)),
           per=1)


@exp("amgi")
def exp_amgi():
    """Itemize the exact iou-prefix pass (52.7 ms for all 1024 points,
    round 4c): the factored two-way transformer's pieces at production
    shape — t2i cross-attentions, i2t update factors, factored LN — to
    find whether one op dominates (as erf-gelu did in the DINOv2 trunk)."""
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    g = cfg.img_size // cfg.patch_size
    C = cfg.prompt_embed_dim
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    emb = jnp.asarray(rng.rand(g, g, C).astype(np.float32) * 0.1
                      ).astype(jnp.bfloat16)
    dense_pe = jax.jit(lambda v: seg.prompt_encoder.apply(
        v["prompt_encoder"], method="dense_pe"))(seg.vars)
    pts_all = jnp.asarray(rng.rand(1024, 2).astype(np.float32)
                          * cfg.img_size)

    def iou_all(v, e, p):
        return seg._iou_all_impl(v, e, dense_pe, p)

    prog = jax.jit(lambda v, e, p: jnp.sum(iou_all(v, e, p)))
    report("amgi.iou_all_1024",
           timed(lambda i: prog(seg.vars, emb + i * 1e-6, pts_all)), per=1)

    # cost attribution by knocking pieces out (WRONG numerics, cost only):
    # the factored pass's pieces are methods on TwoWayTransformer —
    # monkeypatch at class level, re-jit, measure, restore
    from sam6d_tpu.models import sam as sam_mod
    TW = sam_mod.TwoWayTransformer

    def run_variant(name, patch):
        saved = {k: TW.__dict__[k] for k in patch}  # keep staticmethod wrap
        for k, f in patch.items():
            setattr(TW, k, f)
        try:
            prog_v = jax.jit(lambda v, e, p: jnp.sum(iou_all(v, e, p)))
            report(name, timed(
                lambda i: prog_v(seg.vars, emb + i * 1e-6, pts_all)),
                per=1)
        finally:
            for k, f in saved.items():
                setattr(TW, k, f)

    run_variant("amgi.no_ln", {
        "_ln_factored":
            lambda self, gamma, beta, S, a, blocks, Uc, eps=1e-6:
            (S, a, blocks, Uc)})
    run_variant("amgi.no_i2t_no_ln", {
        "_i2t_update_factors":
            lambda self, att, queries, point_embedding, S, a, blocks, U,
            pos: (blocks, U),
        "_ln_factored":
            lambda self, gamma, beta, S, a, blocks, Uc, eps=1e-6:
            (S, a, blocks, Uc)})

    # inside-ln attribution: keep the structure (scale updates, row
    # append, U concat) but skip the cross/gram einsums (wrong numerics,
    # cost only)
    def ln_cheap(self, gamma, beta, S, a, blocks, Uc, eps=1e-6):
        dt = S.dtype
        B, _, N = blocks[0][0].shape
        mS = jnp.mean(S, axis=-1)
        mu = jnp.broadcast_to(
            mS[None] if a is None else a * mS[None], (B, N))
        inv = jax.lax.rsqrt(jnp.abs(mu) + eps).astype(dt)
        S2 = S * gamma
        a2 = inv if a is None else a * inv
        blocks2 = tuple((pd, inv if s is None else s * inv)
                        for pd, s in blocks)
        rows = jnp.concatenate(
            [(-mu * inv)[:, None, :], jnp.ones((B, 1, N), dt)], axis=1)
        blocks2 = blocks2 + ((rows, None),)
        U2 = jnp.concatenate(
            [Uc * gamma, jnp.broadcast_to(gamma, (B, 1, S.shape[-1]))
             .astype(dt),
             jnp.broadcast_to(beta, (B, 1, S.shape[-1])).astype(dt)],
            axis=1)
        return S2, a2, blocks2, U2

    run_variant("amgi.ln_noeinsum", {"_ln_factored": ln_cheap})

    # t2i P-term / a-scaling knocked out (wrong numerics, cost only)
    orig_t2i = TW._t2i_factored

    def t2i_no_p(self, att, q_tokens, S, a, blocks, U, pos):
        return orig_t2i(self, att, q_tokens, S, a, (), None, pos)

    def t2i_no_a(self, att, q_tokens, S, a, blocks, U, pos):
        return orig_t2i(self, att, q_tokens, S, None, blocks, U, pos)

    run_variant("amgi.t2i_noP", {"_t2i_factored": t2i_no_p})
    run_variant("amgi.t2i_noA", {"_t2i_factored": t2i_no_a})

    # i2t score-correction knocked out (q-side P-term in the i2t scores)
    orig_i2t = TW._i2t_update_factors

    def i2t_no_p(self, att, queries, point_embedding, S, a, blocks, U,
                 pos):
        b2, U2 = orig_i2t(self, att, queries, point_embedding, S, a,
                          (), None, pos)
        if not blocks:
            return b2, U2
        return blocks + b2, jnp.concatenate([U, U2], axis=1)

    run_variant("amgi.i2t_scores_noP", {"_i2t_update_factors": i2t_no_p})


@exp("dinoj")
def exp_dinoj():
    """Attention layout at DINOv2 trunk shapes: N=257 pads the score
    tensor's minor dim to 384 lanes (50% waste on every score op). Split
    the KEYS into 256 patch keys (clean lanes) + the 1 cls key (thin
    column) with an exact concat-softmax; also measure the N=256 upper
    bound (drop cls - inexact, bound only)."""
    from sam6d_tpu.core.config import DINOv2Config

    rng = np.random.RandomState(0)
    c = DINOv2Config()
    D, Hd, depth = c.embed_dim, c.num_heads, c.depth
    B, N = 16, 257
    hd = D // Hd
    mk = lambda *sh: jnp.asarray(
        rng.rand(*sh).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.rand(B, N, D).astype(np.float32)).astype(
        jnp.bfloat16)
    ws = tuple(mk(depth, D, 3 * D) if i == 0 else
               (mk(depth, D, D) if i == 1 else
                (mk(depth, D, 4 * D) if i == 2 else
                 (mk(depth, 4 * D, D) if i == 3 else mk(depth, D))))
               for i in range(8))  # wqkv, wp, w1, w2, g1, b1, g2, b2

    def ln(x, g, b):
        m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        return (((x - m) * jax.lax.rsqrt(v + 1e-6)).astype(x.dtype) * g + b)

    def attn_plain(q, k, v, n):
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(q.dtype)
        a = jax.nn.softmax(a, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, n, D)

    def attn_split(q, k, v, n):
        # keys split: [cls | 256 patch] -> clean 256-lane score minor
        kp, kc = k[:, 1:], k[:, :1]
        vp, vc = v[:, 1:], v[:, :1]
        sc = jnp.sqrt(hd).astype(q.dtype)
        sp = jnp.einsum("bnhd,bmhd->bhnm", q, kp) / sc     # (B,H,N,256)
        s1 = jnp.einsum("bnhd,bmhd->bhnm", q, kc) / sc     # (B,H,N,1)
        m = jnp.maximum(jnp.max(sp, axis=-1, keepdims=True), s1)
        pp = jnp.exp(sp - m)
        p1 = jnp.exp(s1 - m)
        l = jnp.sum(pp, axis=-1, keepdims=True) + p1
        # p1 (B,H,N,1) -> (B,N,H,1); vc (B,1,Hd,hd) broadcasts over N
        o = (jnp.einsum("bhnm,bmhd->bnhd", pp, vp)
             + p1.transpose(0, 2, 1, 3) * vc) / l.transpose(0, 2, 1, 3)
        return o.reshape(B, n, D)

    def block(x, w, mode, n):
        wqkv, wp, w1, w2, g1, b1, g2, b2 = w
        h = ln(x, g1, b1)
        qkv = h @ wqkv
        q = qkv[..., :D].reshape(B, n, Hd, hd)
        k = qkv[..., D:2 * D].reshape(B, n, Hd, hd)
        v = qkv[..., 2 * D:].reshape(B, n, Hd, hd)
        o = (attn_split if mode == "split" else attn_plain)(q, k, v, n)
        x = x + o @ wp
        h = ln(x, g2, b2)
        return x + jax.nn.gelu(h @ w1) @ w2

    def run(name, mode, n):
        xi = x0[:, :n]

        @jax.jit
        def prog(x, wt):
            acc = jnp.float32(0)
            for i in range(8):
                y, _ = jax.lax.scan(
                    lambda cc, w: (block(cc, w, mode, n), None),
                    x + i * 1e-6, wt)
                acc += jnp.sum(y)
            return acc
        report(name, timed(lambda i: prog(xi + i * 1e-6, ws)), per=1)

    run("dinoj.plain257", "plain", 257)
    run("dinoj.split257", "split", 257)
    run("dinoj.plain256_bound", "plain", 256)

    # exactness of the split-softmax: the production implementation (if
    # adopted) carries its own parity test; here a quick on-device check
    ref = jax.jit(lambda x, w: jax.lax.scan(
        lambda cc, ww: (block(cc, ww, "plain", 257), None), x, w)[0])
    spl = jax.jit(lambda x, w: jax.lax.scan(
        lambda cc, ww: (block(cc, ww, "split", 257), None), x, w)[0])
    d = jnp.max(jnp.abs(ref(x0, ws).astype(jnp.float32)
                        - spl(x0, ws).astype(jnp.float32)))
    _log(f"dinoj split-vs-plain max abs diff (bf16): {float(d):.2e}")


@exp("segi")
def exp_segi():
    """Seg-encoder layout itemization (round 5): carried-window layout
    (one (un)partition pair per global block instead of per windowed
    block) vs the per-block layout, full ViT-H shapes, one process."""
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.core.params import cast_float_params
    from sam6d_tpu.models.sam import SAMImageEncoder

    rng = np.random.RandomState(0)
    cfg = SAMConfig()
    x = jnp.asarray(rng.rand(1, cfg.img_size, cfg.img_size, 3)
                    .astype(np.float32)).astype(jnp.bfloat16)

    def mk(carry):
        enc = SAMImageEncoder(
            img_size=cfg.img_size, patch_size=cfg.patch_size,
            embed_dim=cfg.encoder_embed_dim, depth=cfg.encoder_depth,
            num_heads=cfg.encoder_num_heads, window_size=cfg.window_size,
            global_attn_indexes=cfg.encoder_global_attn_indexes,
            out_chans=cfg.prompt_embed_dim, use_flash=True,
            carry_windows=carry, dtype=jnp.bfloat16)
        return enc

    enc0 = mk(False)
    v = cast_float_params(init_like(
        lambda: enc0.init(jax.random.PRNGKey(0), x)), jnp.bfloat16)
    for name, enc in (("segi.enc_perblock", enc0),
                      ("segi.enc_carried", mk(True))):
        prog = jax.jit(lambda vv, xx, e=enc: jnp.sum(e.apply(vv, xx)))
        report(name, timed(lambda i: prog(v, x + i * 1e-6)), per=1)


@exp("dinochunk")
def exp_dinochunk():
    """Describe chunk size under the unrolled (cond-gated) adaptive path —
    round-2 picked 16 for the while_loop formulation; re-pick for the
    round-4 default. Full fused score program at capacity 128 and at 48
    valid, chunks 16/32/64."""
    from dataclasses import replace
    from sam6d_tpu.core.config import ISMConfig, SAMConfig
    from sam6d_tpu.pipelines.ism import ISMPipeline

    rng = np.random.RandomState(0)
    P = 128
    H, W = 480, 640
    rgb01 = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(P, H, W) > 0.9).astype(np.float32))
    boxes_np = np.zeros((P, 4), np.float32)
    boxes_np[:, 0] = rng.randint(0, W // 2, P)
    boxes_np[:, 1] = rng.randint(0, H // 2, P)
    boxes_np[:, 2] = boxes_np[:, 0] + rng.randint(20, W // 2, P)
    boxes_np[:, 3] = boxes_np[:, 1] + rng.randint(20, H // 2, P)
    boxes = jnp.asarray(boxes_np)
    depth = jnp.asarray((rng.rand(H, W) * 1000).astype(np.float32))
    Kmat = jnp.asarray(np.array([[600.0, 0, 320], [0, 600.0, 240],
                                 [0, 0, 1]], np.float32))

    for chunk in (16, 32, 64):
        cfg = ISMConfig(sam=SAMConfig(max_proposals=P))
        cfg = replace(cfg, dinov2=replace(cfg.dinov2, chunk_size=chunk,
                                          adaptive_unroll=True))
        pipe = ISMPipeline(cfg, dinov2_variables="eval_shape",
                           dtype=jnp.bfloat16)
        d = cfg.dinov2
        ref_desc = jnp.asarray(
            rng.rand(1, 42, d.embed_dim).astype(np.float32))
        n_patch = (d.img_size // d.patch_size) ** 2
        ref_appe = jnp.asarray(
            rng.rand(1, 42, n_patch, d.embed_dim).astype(np.float32))
        poses_R = jnp.asarray(
            np.tile(np.eye(3, dtype=np.float32), (42, 1, 1)))
        clouds = jnp.asarray(rng.rand(1, 2048, 3).astype(np.float32) * 0.05)
        for nval in (P, 48):
            val = jnp.asarray(np.arange(P) < nval)
            g = jax.jit(lambda v, r, val_: jnp.sum(pipe._score_frame_impl(
                v, r, masks, boxes, val_, depth, Kmat, jnp.float32(1.0),
                ref_desc, ref_appe, poses_R, clouds,
                apply_nms=True)["scores"]))
            report(f"dinochunk.c{chunk}_n{nval}",
                   timed(lambda i: g(pipe.dinov2_vars, rgb01 + i * 1e-7,
                                     val)), per=1)


@exp("dinok")
def exp_dinok():
    """Token-layout flash kernel (fused_attention_qkv: heads sliced from
    the fused qkv channels in VMEM, no transposes, no HBM scores) vs the
    production einsum chain, on the REAL flax DINOv2 block stack at
    describe shape (8 chunks x 16 crops x 257 tokens). One process."""
    from sam6d_tpu.core.config import DINOv2Config
    from sam6d_tpu.core.params import cast_float_params
    from sam6d_tpu.models.dinov2 import _ScanDinoBlock
    from flax import linen as nn

    rng = np.random.RandomState(0)
    c = DINOv2Config()
    D, Hd, depth = c.embed_dim, c.num_heads, c.depth
    B, N = 16, 257
    x0 = jnp.asarray(rng.rand(B, N, D).astype(np.float32)).astype(
        jnp.bfloat16)

    for name, flash in (("dinok.einsum", False), ("dinok.flash_qkv", True)):
        Scanned = nn.scan(_ScanDinoBlock, variable_axes={"params": 0},
                          split_rngs={"params": True}, length=depth)
        mod = Scanned(D, Hd, 4.0, dtype=jnp.bfloat16, use_flash=flash,
                      name=None)
        v = cast_float_params(init_like(
            lambda: mod.init(jax.random.PRNGKey(0), x0, None)),
            jnp.bfloat16)

        @jax.jit
        def prog(v, x):
            acc = jnp.float32(0)
            for i in range(8):
                y, _ = mod.apply(v, x + i * 1e-6, None)
                acc += jnp.sum(y)
            return acc
        report(name, timed(lambda i: prog(v, x0 + i * 1e-6)), per=1)

    # numerics cross-check on-chip: same weights, both paths
    Sc = nn.scan(_ScanDinoBlock, variable_axes={"params": 0},
                 split_rngs={"params": True}, length=depth)
    m0 = Sc(D, Hd, 4.0, dtype=jnp.bfloat16, use_flash=False, name=None)
    m1 = Sc(D, Hd, 4.0, dtype=jnp.bfloat16, use_flash=True, name=None)
    v = cast_float_params(init_like(
        lambda: m0.init(jax.random.PRNGKey(0), x0, None)), jnp.bfloat16)
    y0, _ = jax.jit(m0.apply)(v, x0, None)
    y1, _ = jax.jit(m1.apply)(v, x0, None)
    diff = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                 - y1.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(y0.astype(jnp.float32))))
    _log(f"dinok max|einsum-flash| = {diff:.3e} (max|y| {ref:.3e})")
    RESULTS["dinok.maxdiff"] = diff


@exp("dinol")
def exp_dinol():
    """Isolated attention cost at DINOv2 trunk shapes (B=16, N=257,
    C=1024, H=16), 192 applications (24 blocks x 8 chunks): the einsum
    chain vs the token-layout kernel vs the head-major small kernel
    (transposes included, as the module would pay them). Bounds how far
    fused_attention_qkv sits from its floor."""
    from sam6d_tpu.kernels.flash_attention import (fused_attention_qkv,
                                                   fused_attention_small)

    rng = np.random.RandomState(0)
    B, N, C, H = 16, 257, 1024, 16
    hd = C // H
    scale = float(hd) ** -0.5
    qkv0 = jnp.asarray(rng.rand(B, N, 3 * C).astype(np.float32) * 0.1
                       ).astype(jnp.bfloat16)

    def einsum_attn(qkv):
        q = qkv[..., :C].reshape(B, N, H, hd)
        k = qkv[..., C:2 * C].reshape(B, N, H, hd)
        v = qkv[..., 2 * C:].reshape(B, N, H, hd)
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k) * jnp.asarray(
            scale, qkv.dtype)
        a = jax.nn.softmax(a, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, C)

    def small_attn(qkv):
        q = qkv[..., :C].reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        k = qkv[..., C:2 * C].reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        v = qkv[..., 2 * C:].reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        o = fused_attention_small(q, k, v, scale=scale)
        return o.transpose(0, 2, 1, 3).reshape(B, N, C)

    def qkv_attn(qkv):
        return fused_attention_qkv(qkv, H, scale=scale)

    for name, fn in (("dinol.einsum", einsum_attn),
                     ("dinol.qkv_kernel", qkv_attn),
                     ("dinol.small_kernel", small_attn)):
        @jax.jit
        def prog(qkv):
            acc = jnp.float32(0)
            for i in range(8):
                # serialized via the scalar carry (each step's input is
                # perturbed by the previous sum: no CSE, no reordering)
                for j in range(24):
                    acc += jnp.sum(fn(qkv + (i * 24 + j) * 1e-7
                                      + acc * 1e-30))
            return acc
        report(name, timed(lambda i: prog(qkv0 + i * 1e-6)), per=1)


@exp("pemdeep")
def exp_pemdeep():
    """Deep itemization of the two biggest PEM stages (pembits round 5:
    coarsesolver 15.4, finepe 16.7 of 65.9 total): knockouts on the coarse
    solver (via compute_coarse_Rt.__wrapped__ so monkeypatches re-trace)
    and standalone pieces of the fine positional encoding."""
    import sam6d_tpu.pose.solvers as sol
    from sam6d_tpu.core.config import PEMConfig

    rng = np.random.RandomState(0)
    cfg = PEMConfig()
    B, NC, NF = 16, 196, cfg.fine_npoint
    key = jax.random.PRNGKey(0)
    atten = jnp.asarray(rng.rand(B, NC + 1, NC + 1).astype(np.float32))
    sp = jnp.asarray(rng.rand(B, NC, 3).astype(np.float32))
    mdl = jnp.asarray(
        rng.rand(B, cfg.n_sample_model_point, 3).astype(np.float32))
    raw = sol.compute_coarse_Rt.__wrapped__
    cm = cfg.coarse

    def run(name, patch=None, **kw):
        saved = {k: getattr(sol, k) for k in (patch or {})}
        for k, f in (patch or {}).items():
            setattr(sol, k, f)
        try:
            f = jax.jit(lambda k_, a: jnp.sum(raw(
                k_, a, sp, sp, mdl, cm.nproposal1, cm.nproposal2, **kw)[0]))
            report(name, timed(
                lambda i: f(jax.random.fold_in(key, i), atten + i * 1e-7)),
                per=1)
        finally:
            for k, f_ in saved.items():
                setattr(sol, k, f_)

    run("pemdeep.coarse_full")
    run("pemdeep.coarse_no_dmin", patch={
        "_chunked_min_dist_to_model":
            lambda t, m, c, u=False: jnp.ones(t.shape[:3], t.dtype)})
    run("pemdeep.coarse_no_multinomial", patch={
        "multinomial_from_weights":
            lambda k_, w, n, **kw: jnp.tile(
                jnp.arange(n, dtype=jnp.int32) % w.shape[-1],
                (w.shape[0], 1))})
    run("pemdeep.coarse_no_procrustes", patch={
        "weighted_procrustes": lambda a, b, *r, **kw: (
            jnp.broadcast_to(jnp.eye(3, dtype=a.dtype),
                             a.shape[:-2] + (3, 3)),
            jnp.zeros(a.shape[:-2] + (3,), a.dtype))})

    # ---- fine PE pieces (standalone, same shapes as pembits.finepe)
    from sam6d_tpu.kernels.ball_query import two_scale_ball_query_pallas
    from sam6d_tpu.ops.ball_query import group_points
    fmc = cfg.fine
    pts = jnp.asarray(rng.rand(B, NF, 3).astype(np.float32) * 0.4 - 0.2)
    bq = jax.jit(lambda p: sum(jnp.sum(x) for x in
                               two_scale_ball_query_pallas(
                                   p, p, fmc.pe_radius1, fmc.pe_nsample1,
                                   fmc.pe_radius2, fmc.pe_nsample2)))
    report("pemdeep.fine_ballquery", timed(lambda i: bq(pts + i * 1e-6)),
           per=1)

    idx1, idx2 = two_scale_ball_query_pallas(
        pts, pts, fmc.pe_radius1, fmc.pe_nsample1, fmc.pe_radius2,
        fmc.pe_nsample2)
    u = jnp.asarray(rng.rand(B, NF, 32).astype(np.float32)).astype(
        jnp.bfloat16)
    g = jax.jit(lambda u_: jnp.sum(group_points(u_, idx1))
                + jnp.sum(group_points(u_, idx2)))
    report("pemdeep.fine_gather", timed(lambda i: g(u + i * 1e-6)), per=1)

    # conv+bn+relu stacks on pre-grouped tensors (the after_first cost)
    w1_ = jnp.asarray(rng.rand(32, 64).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)
    w2_ = jnp.asarray(rng.rand(64, 128).astype(np.float32) * 0.1).astype(
        jnp.bfloat16)
    h1 = jnp.asarray(rng.rand(B, NF, fmc.pe_nsample1, 32)
                     .astype(np.float32)).astype(jnp.bfloat16)
    h2 = jnp.asarray(rng.rand(B, NF, fmc.pe_nsample2, 32)
                     .astype(np.float32)).astype(jnp.bfloat16)

    def stack(h):
        x = jax.nn.relu(h)          # BN folds to scale+bias at eval: ~relu
        x = jax.nn.relu(x @ w1_)
        x = jax.nn.relu(x @ w2_)
        return jnp.max(x, axis=2)

    c = jax.jit(lambda a, b: jnp.sum(stack(a)) + jnp.sum(stack(b)))
    report("pemdeep.fine_convs", timed(lambda i: c(h1 + i * 1e-6,
                                                   h2 + i * 1e-6)), per=1)


@exp("matchi")
def exp_matchi():
    """Itemize the match stage around the trunk (bench 144.5 vs ~124
    trunk-only in the dinok harness): crop prep, full describe, and the
    fused score program at capacity + 48-valid."""
    from sam6d_tpu.core.config import ISMConfig, SAMConfig
    from sam6d_tpu.pipelines.ism import ISMPipeline
    from sam6d_tpu.ops.images import (masked_crop_resize_pad_nearest,
                                      normalize_imagenet)

    rng = np.random.RandomState(0)
    P, H, W = 128, 480, 640
    cfg = ISMConfig(sam=SAMConfig(max_proposals=P))
    pipe = ISMPipeline(cfg, dinov2_variables="eval_shape",
                       dtype=jnp.bfloat16)
    d = cfg.dinov2
    rgb01 = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(P, H, W) > 0.9).astype(np.float32))
    boxes_np = np.zeros((P, 4), np.float32)
    boxes_np[:, 0] = rng.randint(0, W // 2, P)
    boxes_np[:, 1] = rng.randint(0, H // 2, P)
    boxes_np[:, 2] = boxes_np[:, 0] + rng.randint(20, W // 2, P)
    boxes_np[:, 3] = boxes_np[:, 1] + rng.randint(20, H // 2, P)
    boxes = jnp.asarray(boxes_np).astype(jnp.int32)

    crop_fn = jax.jit(lambda r: sum(jnp.sum(x) for x in
                                    masked_crop_resize_pad_nearest(
                                        normalize_imagenet(r), masks,
                                        boxes, d.img_size)))
    report("matchi.crops", timed(lambda i: crop_fn(rgb01 + i * 1e-7)),
           per=1)

    desc_fn = jax.jit(lambda v, r: sum(jnp.sum(x) for x in
                                       pipe._describe_impl(v, r, masks,
                                                           boxes)))
    report("matchi.describe_full128",
           timed(lambda i: desc_fn(pipe.dinov2_vars, rgb01 + i * 1e-7)),
           per=1)

    # scoring tail on random descriptors (the non-describe remainder)
    from sam6d_tpu.models import ism_scoring
    n_patch = (d.img_size // d.patch_size) ** 2
    cls_d = jnp.asarray(rng.rand(P, d.embed_dim).astype(np.float32)
                        ).astype(jnp.bfloat16)
    patch_d = jnp.asarray(rng.rand(P, n_patch, d.embed_dim)
                          .astype(np.float32)).astype(jnp.bfloat16)
    ref_desc = jnp.asarray(rng.rand(1, 42, d.embed_dim).astype(np.float32))
    ref_appe = jnp.asarray(
        rng.rand(1, 42, n_patch, d.embed_dim).astype(np.float32))
    valid = jnp.ones((P,), bool)

    def tail(cd, pd):
        sem = ism_scoring.semantic_scores(
            cd, ref_desc, valid, cfg.matching.aggregation_function,
            cfg.matching.confidence_thresh)
        ra = ref_appe[sem["object_idx"], sem["best_template"]]
        appe = ism_scoring.appearance_scores(pd, ra)
        vis = ism_scoring.visible_ratio(pd, ra, cfg.matching.visible_thred)
        return jnp.sum(sem["score"]) + jnp.sum(appe) + jnp.sum(vis)

    tail_fn = jax.jit(tail)
    report("matchi.score_tail",
           timed(lambda i: tail_fn(cls_d + i * 1e-6, patch_d + i * 1e-6)),
           per=1)


@exp("geoi")
def exp_geoi():
    """Geo-embedding (pembits.geo 15.3 ms) attribution: is it the ~636M
    VPU sin evaluations (4 x (B, 197, 197, 256) sinusoid tensors), the
    projections, or the knn/pairwise plumbing? Knockouts via jnp.sin
    monkeypatch (wrong numerics, cost only)."""
    import sam6d_tpu.models.geo_transformer as gt
    from sam6d_tpu.models.geo_transformer import GeometricStructureEmbedding

    rng = np.random.RandomState(0)
    B, N = 16, 197
    mod = GeometricStructureEmbedding(hidden_dim=256, dtype=jnp.bfloat16)
    pts = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 0.4 - 0.2)
    v = init_like(lambda: mod.init(jax.random.PRNGKey(0), pts))

    def run(name):
        f = jax.jit(lambda v_, p: jnp.sum(mod.apply(v_, p)))
        report(name, timed(lambda i: f(v, pts + i * 1e-6)), per=1)

    run("geoi.full")
    saved_sin = jnp.sin
    saved_atan2 = jnp.arctan2
    try:
        jnp.sin = lambda x: x * 0.5  # cost-only: kill the transcendental
        run("geoi.no_sin")
        jnp.sin = saved_sin
        jnp.arctan2 = lambda a, b: a * 0.25
        run("geoi.no_atan2")
    finally:
        jnp.sin = saved_sin
        jnp.arctan2 = saved_atan2


@exp("enci")
def exp_enci():
    """SAM encoder itemization (58.0 ms vs 27.8 GEMM floor): where do the
    ~30 ms go — windowed attention (flash-relpos kernel vs einsum vs a
    no-relpos token-layout bound), window (un)partition, or the global
    blocks? ViT-H shapes: 28 windowed blocks (25 windows x 196 tokens x
    1280) + 4 global (4096 tokens), 16 heads, hd 80."""
    from sam6d_tpu.kernels.flash_attention import (flash_attention_relpos,
                                                   fused_attention_qkv)
    from sam6d_tpu.models.sam import (window_partition, window_unpartition,
                                      _rel_pos_bias)

    rng = np.random.RandomState(0)
    C, heads, ws, g = 1280, 16, 14, 64
    hd = C // heads
    nW = 25
    scale = float(hd) ** -0.5
    mkb = lambda *sh: jnp.asarray(
        rng.rand(*sh).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    xw = mkb(nW, ws * ws, C)         # windowed tokens
    xg = mkb(1, g * g, C)            # global tokens
    wqkv = mkb(C, 3 * C)
    wproj = mkb(C, C)
    w1 = mkb(C, 4 * C)
    w2 = mkb(4 * C, C)
    rh_w = mkb(2 * ws - 1, hd).astype(jnp.float32)
    rw_w = rh_w
    rh_g = mkb(2 * g - 1, hd).astype(jnp.float32)

    def gemms(x, n):
        acc = jnp.float32(0)
        for i in range(n):
            h = x + i * 1e-6
            q3 = h @ wqkv
            o = q3[..., :C] @ wproj
            o = o + (jax.nn.relu(h @ w1) @ w2)
            acc += jnp.sum(o)
        return acc
    f = jax.jit(lambda a, b: gemms(a, 28) + gemms(b, 4))
    report("enci.gemm_floor", timed(lambda i: f(xw + i * 1e-6,
                                                xg + i * 1e-6)), per=1)

    def win_attn(kind):
        def one(h, i):
            q3 = (h + i * 1e-6) @ wqkv
            if kind == "token_norel":  # BOUND only (no rel-pos): kernel
                return jnp.sum(fused_attention_qkv(q3, heads, scale=scale))
            q5 = q3.reshape(nW, ws * ws, 3, heads, hd).transpose(
                2, 0, 3, 1, 4)
            q, k, v = q5[0], q5[1], q5[2]
            if kind == "flash":
                o = flash_attention_relpos(q, k, v, rh_w, rw_w, (ws, ws))
            else:
                a = jnp.einsum("bhnc,bhmc->bhnm", q * scale, k)
                a = a + _rel_pos_bias(q, rh_w, rw_w, (ws, ws)).reshape(
                    nW, heads, ws * ws, ws * ws)
                a = jax.nn.softmax(a, axis=-1)
                o = jnp.einsum("bhnm,bhmc->bhnc", a, v)
            return jnp.sum(o.transpose(0, 2, 1, 3).reshape(nW, -1, C)
                           @ wproj)

        @jax.jit
        def prog(x):
            acc = jnp.float32(0)
            for i in range(28):
                acc += one(x + acc * 1e-30, i)
            return acc
        return prog

    for kind in ("flash", "einsum", "token_norel"):
        prog = win_attn(kind)
        report(f"enci.win28_{kind}", timed(lambda i: prog(xw + i * 1e-6)),
               per=1)

    def glob(kind):
        def one(h, i):
            q3 = (h + i * 1e-6) @ wqkv
            q5 = q3.reshape(1, g * g, 3, heads, hd).transpose(2, 0, 3, 1, 4)
            o = flash_attention_relpos(q5[0], q5[1], q5[2], rh_g, rh_g,
                                       (g, g))
            return jnp.sum(o.transpose(0, 2, 1, 3).reshape(1, -1, C)
                           @ wproj)

        @jax.jit
        def prog(x):
            acc = jnp.float32(0)
            for i in range(4):
                acc += one(x + acc * 1e-30, i)
            return acc
        return prog
    pg = glob("flash")
    report("enci.glob4_flash", timed(lambda i: pg(xg + i * 1e-6)), per=1)

    # window partition/unpartition pairs alone (28x, grid 64, pad to 70)
    xfull = mkb(1, g, g, C)

    @jax.jit
    def part(x):
        acc = jnp.float32(0)
        h = x
        for i in range(28):
            w, pad_hw = window_partition(h + i * 1e-7, ws)
            h = window_unpartition(w, ws, pad_hw, (g, g))
        return jnp.sum(h)
    report("enci.partition28", timed(lambda i: part(xfull + i * 1e-6)),
           per=1)


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args or "--list" in args:
        print("available:", " ".join(sorted(EXPS)))
        sys.exit(0)
    for a in args:
        _log(f"=== {a} ===")
        EXPS[a]()
    print(json.dumps(RESULTS))
