#!/usr/bin/env python
"""Experiment matrix #7: coarse-solver micro-decomposition + multinomial variants."""
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

from bench import timed, _log

RESULTS = {}


def report(name, seconds):
    RESULTS[name] = round(seconds * 1e3, 2)
    _log(f"{name}: {seconds*1e3:.1f} ms")


def exp_solver_micro():
    from sam6d_tpu.ops.geometry import (
        symeig3x3, svd3x3, weighted_procrustes, inverse_transform_points)

    rng = np.random.RandomState(0)
    B, P1, P2 = 16, 6000, 300
    H = jnp.asarray(rng.randn(B * P1, 3, 3).astype(np.float32))

    f_sym = jax.jit(lambda h: jnp.sum(symeig3x3(
        jnp.einsum("...ji,...jk->...ik", h, h))[1]))
    report("micro.symeig96k", timed(lambda i: f_sym(H + i * 1e-6)))

    f_svd = jax.jit(lambda h: jnp.sum(svd3x3(h)[0]))
    report("micro.svd96k", timed(lambda i: f_svd(H + i * 1e-6)))

    p1 = jnp.asarray(rng.rand(B, P1, 3, 3).astype(np.float32))
    p2 = jnp.asarray(rng.rand(B, P1, 3, 3).astype(np.float32))
    f_proc = jax.jit(lambda a, b: jnp.sum(weighted_procrustes(a, b)[0]))
    report("micro.procrustes96k", timed(lambda i: f_proc(p1 + i * 1e-6, p2)))

    Rs = jnp.asarray(rng.randn(B, P1, 3, 3).astype(np.float32))
    ts = jnp.asarray(rng.randn(B, P1, 3).astype(np.float32))

    def resid_topk(a, b, R, t):
        r = inverse_transform_points(b, R, t) - a
        dis = jnp.mean(jnp.linalg.norm(r, axis=-1), axis=-1)
        _, keep = jax.lax.top_k(-dis, P2)
        return jnp.sum(keep)
    f_rt = jax.jit(resid_topk)
    report("micro.resid_topk", timed(lambda i: f_rt(p1 + i * 1e-6, p2, Rs, ts)))


def exp_multinomial():
    from sam6d_tpu.ops.sampling import multinomial_from_weights

    rng = np.random.RandomState(0)
    B, N, num = 16, 196 * 196, 18000
    w = jnp.asarray(rng.rand(B, N).astype(np.float32))
    key = jax.random.PRNGKey(0)

    f0 = jax.jit(lambda k, x: jnp.sum(multinomial_from_weights(k, x, num)))
    report("mn.current_sort", timed(lambda i: f0(jax.random.fold_in(key, i),
                                                 w + i * 1e-7)))

    def mn_unrolled(k, weights):
        cdf = jnp.cumsum(weights, axis=-1)
        cdf = cdf / (cdf[..., -1:] + 1e-8)
        u = jax.random.uniform(k, (B, num), dtype=weights.dtype)
        idx = jax.vmap(lambda c, r: jnp.searchsorted(
            c, r, method="scan_unrolled"))(cdf, u)
        return jnp.sum(jnp.minimum(idx, N - 1))
    f1 = jax.jit(mn_unrolled)
    report("mn.scan_unrolled", timed(lambda i: f1(jax.random.fold_in(key, i),
                                                  w + i * 1e-7)))

    def mn_bucket(k, weights, nb=256):
        cdf = jnp.cumsum(weights, axis=-1)
        cdf = cdf / (cdf[..., -1:] + 1e-8)
        u = jax.random.uniform(k, (B, num), dtype=weights.dtype)
        # pad cdf to a multiple of nb
        stride = -(-N // nb)
        pad = stride * nb - N
        cdfp = jnp.pad(cdf, ((0, 0), (0, pad)), constant_values=2.0)
        coarse = cdfp.reshape(B, nb, stride)[:, :, -1]  # (B, nb) bucket tops
        # bucket index: count of bucket-tops < u
        bi = jnp.sum(coarse[:, None, :] < u[:, :, None], axis=-1)  # (B,num)
        bi = jnp.minimum(bi, nb - 1)
        seg = jnp.take_along_axis(
            cdfp.reshape(B, nb, stride), bi[..., None], axis=1)  # (B,num,stride)
        within = jnp.sum(seg < u[..., None], axis=-1)  # (B, num)
        idx = jnp.minimum(bi * stride + within, N - 1)
        return jnp.sum(idx)
    f2 = jax.jit(mn_bucket)
    report("mn.bucket256", timed(lambda i: f2(jax.random.fold_in(key, i),
                                              w + i * 1e-7)))


def exp_finepe():
    import flax.linen as nn
    from sam6d_tpu.kernels.ball_query import two_scale_ball_query_pallas
    from sam6d_tpu.models.fine_matching import PositionalEncoding
    from sam6d_tpu.ops.ball_query import group_points
    from sam6d_tpu.core.params import cast_float_params
    from bench import init_like

    rng = np.random.RandomState(0)
    B, N = 16, 2048
    pts = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 0.5)

    bq = jax.jit(lambda p: sum(jnp.sum(i) for i in
                               two_scale_ball_query_pallas(
                                   p, p, 0.1, 32, 0.2, 64)))
    report("pe.ballquery_kernel", timed(lambda i: bq(pts + i * 1e-6)))

    idx1, idx2 = two_scale_ball_query_pallas(pts, pts, 0.1, 32, 0.2, 64)
    idx1, idx2 = jax.block_until_ready((idx1, idx2))

    def gath(p):
        g1 = group_points(p, idx1)
        g2 = group_points(p, idx2)
        return jnp.sum(g1) + jnp.sum(g2)
    gf = jax.jit(gath)
    report("pe.gather_only", timed(lambda i: gf(pts + i * 1e-6)))

    pe_mod = PositionalEncoding(256, 0.1, 0.2, 32, 64, dtype=jnp.bfloat16)
    pe_vars = cast_float_params(
        init_like(lambda: pe_mod.init(jax.random.PRNGKey(0), pts)),
        jnp.bfloat16)
    pef = jax.jit(lambda v, p: jnp.sum(pe_mod.apply(v, p)))
    report("pe.full", timed(lambda i: pef(pe_vars, pts + i * 1e-6)))


def main():
    groups = sys.argv[1:] or ["solver_micro", "multinomial", "finepe"]
    for g in groups:
        _log(f"=== {g} ===")
        try:
            dict(solver_micro=exp_solver_micro,
                 multinomial=exp_multinomial,
                 finepe=exp_finepe)[g]()
        except Exception as e:
            import traceback
            traceback.print_exc()
            _log(f"{g} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
