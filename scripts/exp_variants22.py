#!/usr/bin/env python
"""Experiment matrix #22: factored vs standard transformer at chunk level
(map8 harness), and full decode chunk both ways."""
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
    _log(f"{name}: {seconds*1e3:.1f} ms  ({seconds*1e3/8:.2f}/chunk)")


def main():
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.models.sam import TwoWayTransformer

    rng = np.random.RandomState(0)
    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    dv = seg.vars["mask_decoder"]
    tv = {"params": dv["params"]["transformer"]}
    tw = TwoWayTransformer(depth=2, embed_dim=256, num_heads=8,
                           mlp_dim=2048, dtype=jnp.bfloat16)
    B, N, C = 128, 4096, 256
    src0 = jnp.asarray(rng.rand(1, N, C).astype(np.float32) * 0.2
                       ).astype(jnp.bfloat16)
    pos0 = jnp.asarray(rng.rand(1, N, C).astype(np.float32) * 0.2
                       ).astype(jnp.bfloat16)
    toks = jnp.asarray(rng.rand(8, B, 7, C).astype(np.float32) * 0.2
                       ).astype(jnp.bfloat16)

    def map8(body):
        return jax.jit(lambda v, t8: jnp.sum(jax.lax.map(
            lambda t: body(v, t), t8)))

    def std_body(v, t):
        q, k = tw.apply(v, src0, pos0, t)
        return jnp.sum(q) + jnp.sum(k)
    f = map8(std_body)
    report("tw.standard", timed(lambda i: f(tv, toks + i * 1e-6)))

    def fac_body(v, t):
        q, (S, a, P, U) = tw.apply(v, src0, pos0, t, method="factored")
        # consume the state the way the decoder does: one (B,N,C) GEMM
        z = a[..., None] * S[None] + jnp.einsum("bnr,brc->bnc", P, U)
        return jnp.sum(q) + jnp.sum(z)
    f = map8(fac_body)
    report("tw.factored", timed(lambda i: f(tv, toks + i * 1e-6)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
