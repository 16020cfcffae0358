#!/usr/bin/env python
"""Experiment matrix #17: PEM trunk decomposition (ViT, FPS XLA vs Pallas,
geo embedding, pixel feats)."""
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
    from sam6d_tpu.models.pem import PEMNet
    from sam6d_tpu.ops.sampling import farthest_point_sample
    from sam6d_tpu.kernels.fps import farthest_point_sample_pallas
    from sam6d_tpu.models.vit import ViTEncoder

    cfg = PEMConfig()
    rng = np.random.RandomState(0)
    B, S, NF, NC = 16, cfg.img_size, cfg.fine_npoint, cfg.coarse_npoint

    pts = jnp.asarray(rng.rand(B, NF, 3).astype(np.float32) * 0.5)
    f_x = jax.jit(lambda p: jnp.sum(farthest_point_sample(p, NC)))
    report("fps.xla196", timed(lambda i: f_x(pts + i * 1e-6)))
    try:
        f_p = jax.jit(lambda p: jnp.sum(
            farthest_point_sample_pallas(p, NC)))
        report("fps.pallas196", timed(lambda i: f_p(pts + i * 1e-6)))
    except Exception as e:
        _log(f"fps.pallas FAILED: {type(e).__name__}: {e}")

    # ViT encoder forward alone (B x 224^2)
    vc = cfg.vit
    vit = ViTEncoder(img_size=vc.img_size, patch_size=vc.patch_size,
                     embed_dim=vc.embed_dim, depth=vc.depth,
                     num_heads=vc.num_heads, out_dim=vc.out_dim,
                     use_pyramid_feat=vc.use_pyramid_feat,
                     dtype=jnp.bfloat16)
    rgb = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))
    vv = cast_float_params(init_like(
        lambda: vit.init(jax.random.PRNGKey(0), rgb)), jnp.bfloat16)
    f_v = jax.jit(lambda v, x: sum(jnp.sum(l) for l in
                                   jax.tree.leaves(vit.apply(v, x))))
    try:
        report("trunk.vit", timed(lambda i: f_v(vv, rgb + i * 1e-6)))
    except Exception as e:
        _log(f"trunk.vit FAILED: {type(e).__name__}: {e}")

    # full shared trunk
    net = PEMNet(cfg, dtype=jnp.bfloat16)
    inputs = dict(
        rgb=rgb,
        rgb_choose=jnp.asarray(rng.randint(0, S * S, (B, NF))),
        pts=pts * 0.2,
        model=jnp.asarray(rng.rand(B, cfg.n_sample_model_point, 3
                                   ).astype(np.float32) * 0.1),
        dense_po=jnp.asarray((rng.rand(B, NF, 3).astype(np.float32) - 0.5)
                             * 0.1),
        dense_fo=jnp.asarray(rng.rand(B, NF, cfg.vit.out_dim
                                      ).astype(np.float32)),
    )
    variables = cast_float_params(init_like(lambda: net.init(
        {"params": jax.random.PRNGKey(0)}, inputs, jax.random.PRNGKey(0))),
        jnp.bfloat16)
    f_t = jax.jit(lambda v, i: jnp.sum(
        net.apply(v, i, method=PEMNet._shared_trunk)["geo_m"]))
    report("trunk.full", timed(lambda i: f_t(
        variables, dict(inputs, rgb=inputs["rgb"] + i * 1e-6))))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
