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

    for name, inputs in (("pem.nocache", base), ("pem.cached", cached)):
        fwd = jax.jit(lambda v, i, k: jnp.sum(net.apply(v, i, k)["pred_R"]))

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
        enc = SAMImageEncoder(use_flash=True, dtype=jnp.bfloat16, **kw)
        v = cast_float_params(init_like(
            lambda: enc.init(jax.random.PRNGKey(0), x)), jnp.bfloat16)
        fwd = jax.jit(lambda v, x: jnp.sum(enc.apply(v, x)))
        report(name, timed(lambda i: fwd(v, x + i * 1e-6)), per=1)

    run("enc.full")


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


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args or "--list" in args:
        print("available:", " ".join(sorted(EXPS)))
        sys.exit(0)
    for a in args:
        _log(f"=== {a} ===")
        EXPS[a]()
    print(json.dumps(RESULTS))
