#!/usr/bin/env python
"""Experiment matrix #5: coarse-solver decomposition + fine head + PE recheck."""
from __future__ import annotations

import json
import os
import sys
from functools import partial

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


def exp_solver():
    from sam6d_tpu.ops.sampling import multinomial_from_weights
    from sam6d_tpu.ops.geometry import weighted_procrustes, inverse_transform_points
    from sam6d_tpu.ops.geometry import pairwise_sq_distance
    from sam6d_tpu.pose.solvers import compute_coarse_Rt, _chunked_min_dist_to_model

    rng = np.random.RandomState(0)
    B, N1, N2, P1, P2, M = 16, 196, 196, 6000, 300, 1024
    key = jax.random.PRNGKey(0)
    flat = jnp.asarray(rng.rand(B, N1 * N2).astype(np.float32))

    f1 = jax.jit(lambda k, w: jnp.sum(multinomial_from_weights(k, w, P1 * 3)))
    report("solver.multinomial", timed(lambda i: f1(jax.random.fold_in(key, i),
                                                    flat + i * 1e-7)))

    p1 = jnp.asarray(rng.rand(B, P1, 3, 3).astype(np.float32))
    p2 = jnp.asarray(rng.rand(B, P1, 3, 3).astype(np.float32))

    def proc(a, b):
        Rs, ts = weighted_procrustes(a, b)
        resid = inverse_transform_points(b, Rs, ts) - a
        dis = jnp.mean(jnp.linalg.norm(resid, axis=-1), axis=-1)
        _, keep = jax.lax.top_k(-dis, P2)
        return jnp.sum(keep)
    f2 = jax.jit(proc)
    report("solver.procrustes6k_topk", timed(lambda i: f2(p1 + i * 1e-6, p2)))

    trans = jnp.asarray(rng.rand(B, P2, N1, 3).astype(np.float32))
    mdl = jnp.asarray(rng.rand(B, M, 3).astype(np.float32))
    f3 = jax.jit(lambda t, m: jnp.sum(_chunked_min_dist_to_model(t, m, 30)))
    report("solver.min_dist", timed(lambda i: f3(trans + i * 1e-6, mdl)))

    atten = jnp.asarray(rng.rand(B, N1 + 1, N2 + 1).astype(np.float32))
    q1 = jnp.asarray(rng.rand(B, N1, 3).astype(np.float32))
    q2 = jnp.asarray(rng.rand(B, N2, 3).astype(np.float32))
    f4 = jax.jit(lambda k, a: jnp.sum(compute_coarse_Rt(
        k, a, q1, q2, mdl, P1, P2)[0]))
    report("solver.full", timed(lambda i: f4(jax.random.fold_in(key, i),
                                             atten + i * 1e-6)))


def exp_fine():
    import dataclasses
    from sam6d_tpu.core.config import PEMConfig
    from sam6d_tpu.models.fine_matching import FinePointMatching, PositionalEncoding

    cfg = PEMConfig()
    fm = cfg.fine
    rng = np.random.RandomState(0)
    B, NF, NC, C = 16, cfg.fine_npoint, cfg.coarse_npoint, fm.hidden_dim

    pe_mod = PositionalEncoding(C, fm.pe_radius1, fm.pe_radius2,
                                fm.pe_nsample1, fm.pe_nsample2,
                                dtype=jnp.bfloat16)
    pts = jnp.asarray(rng.rand(B, NF, 3).astype(np.float32) * 0.5)
    pe_vars = init_like(lambda: pe_mod.init(jax.random.PRNGKey(0), pts))
    pe_vars = cast_float_params(pe_vars, jnp.bfloat16)
    pef = jax.jit(lambda v, p: jnp.sum(pe_mod.apply(v, p)))
    report("pem.fine_pe_pallas", timed(lambda i: pef(pe_vars, pts + i * 1e-6)))

    fine_mod = FinePointMatching(
        nblock=fm.nblock, input_dim=fm.input_dim, hidden_dim=fm.hidden_dim,
        out_dim=fm.out_dim, num_heads=fm.num_heads, temp=fm.temp,
        normalize_feat=fm.normalize_feat, focusing_factor=fm.focusing_factor,
        dtype=jnp.bfloat16)
    pe1 = jnp.asarray(rng.rand(B, NF, C).astype(np.float32))
    pe2 = jnp.asarray(rng.rand(B, NF, C).astype(np.float32))
    df_m = jnp.asarray(rng.rand(B, NF, fm.input_dim).astype(np.float32))
    df_o = jnp.asarray(rng.rand(B, NF, fm.input_dim).astype(np.float32))
    geo = jnp.asarray(rng.rand(B, NC + 1, NC + 1, 256).astype(np.float32) * 0.1)
    fps_i = jnp.asarray(rng.randint(0, NF, (B, NC)).astype(np.int32))
    fv = init_like(lambda: fine_mod.init(
        jax.random.PRNGKey(0), pe1, df_m, geo, fps_i, pe2, df_o, geo, fps_i))
    fv = cast_float_params(fv, jnp.bfloat16)
    fh = jax.jit(lambda v, a, g: jnp.sum(fine_mod.apply(
        v, pe1, a, g, fps_i, pe2, df_o, g, fps_i)[-1]))
    report("pem.fine_head3", timed(lambda i: fh(fv, df_m + i * 1e-6, geo)))


def main():
    groups = sys.argv[1:] or ["solver", "fine"]
    for g in groups:
        _log(f"=== {g} ===")
        try:
            dict(solver=exp_solver, fine=exp_fine)[g]()
        except Exception as e:
            _log(f"{g} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
