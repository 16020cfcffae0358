#!/usr/bin/env python
"""Experiment matrix #24: PEM trunk middle (geo embedding, pixel-feat
sampling) + min-dist chunk sweep."""
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


def main():
    from sam6d_tpu.core.config import PEMConfig
    from sam6d_tpu.models.geo_transformer import GeometricStructureEmbedding
    from sam6d_tpu.models.vit import sample_pixel_feats
    from sam6d_tpu.pose.solvers import _chunked_min_dist_to_model

    cfg = PEMConfig()
    rng = np.random.RandomState(0)
    B, NC = 16, cfg.coarse_npoint

    geo = GeometricStructureEmbedding(
        hidden_dim=cfg.geo_embedding.hidden_dim,
        sigma_d=cfg.geo_embedding.sigma_d, sigma_a=cfg.geo_embedding.sigma_a,
        angle_k=cfg.geo_embedding.angle_k,
        reduction_a=cfg.geo_embedding.reduction_a, dtype=jnp.bfloat16)
    pts = jnp.asarray(rng.rand(B, NC + 1, 3).astype(np.float32) * 0.5)
    gv = cast_float_params(init_like(
        lambda: geo.init(jax.random.PRNGKey(0), pts)), jnp.bfloat16)
    gf = jax.jit(lambda v, p: jnp.sum(geo.apply(v, p)))
    report("trunk.geo_embed_x2",
           timed(lambda i: gf(gv, pts + i * 1e-6) + gf(gv, pts + i * 2e-6)))

    # pixel-feat sampling: feature map (B, 14, 14, 768*4?) -> gather 2048
    g = cfg.img_size // cfg.vit.patch_size
    C = cfg.vit.embed_dim * 4 if cfg.vit.use_pyramid_feat else cfg.vit.embed_dim
    fmap = jnp.asarray(rng.rand(B, g, g, C).astype(np.float32)
                       ).astype(jnp.bfloat16)
    choose = jnp.asarray(rng.randint(0, cfg.img_size ** 2, (B, cfg.fine_npoint)))
    def spf(f):
        return jnp.sum(sample_pixel_feats(
            f, choose, (cfg.img_size, cfg.img_size)))
    try:
        f1 = jax.jit(spf)
        report("trunk.sample_pixel", timed(lambda i: f1(fmap + i * 1e-6)))
    except Exception as e:
        _log(f"sample_pixel FAILED: {type(e).__name__}: {e}")

    # min-dist chunk sweep
    trans = jnp.asarray(rng.rand(B, 300, NC, 3).astype(np.float32))
    mdl = jnp.asarray(rng.rand(B, 1024, 3).astype(np.float32))
    for ch in (15, 30, 60, 300):
        f = jax.jit(lambda t, m, c=ch: jnp.sum(
            _chunked_min_dist_to_model(t, m, c)))
        report(f"solver.mindist_c{ch}", timed(lambda i: f(trans + i * 1e-6,
                                                          mdl)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
