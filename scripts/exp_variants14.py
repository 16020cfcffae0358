#!/usr/bin/env python
"""Experiment matrix #14: bisect the exact-decode chunk (where do 20 ms go?).

All pieces run as an 8-iteration lax.map over the same 128-prompt chunk so
per-chunk cost = total/8 with probe noise amortized.
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

from bench import timed, _log

RESULTS = {}


def report(name, seconds):
    RESULTS[name] = round(seconds * 1e3, 2)
    _log(f"{name}: {seconds*1e3:.1f} ms  ({seconds*1e3/8:.2f}/chunk)")


def main():
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.models.sam import TwoWayTransformer
    from sam6d_tpu.kernels.mask_tail import fused_mask_tail

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
        def fn(v, t8):
            return jnp.sum(jax.lax.map(lambda t: body(v, t), t8))
        return jax.jit(fn)

    # full two-way transformer (exact)
    def tw_full(v, t):
        q, k = tw.apply(v, src0, pos0, t)
        return jnp.sum(q) + jnp.sum(k)
    f1 = map8(tw_full)
    report("tw.full", timed(lambda i: f1(tv, toks + i * 1e-6)))

    # transformer, keys frozen (rank mode)
    f2 = map8(lambda v, t: jnp.sum(
        tw.apply(v, src0, pos0, t, update_keys=False)[0]))
    report("tw.frozen", timed(lambda i: f2(tv, toks + i * 1e-6)))

    # L1 only (shared keys in, per-prompt keys out)
    def l1_only(v, t):
        q, k = tw.apply(v, src0, pos0, t,
                        method=lambda m, s, p, tt: m.layers[0](tt, s, tt, p))
        return jnp.sum(q) + jnp.sum(k)
    f3 = map8(lambda v, t: l1_only(v, t))
    report("tw.l1_only", timed(lambda i: f3(tv, toks + i * 1e-6)))

    # upscale tail only: z GEMM + fused kernel on a per-prompt src
    srcB = jnp.asarray(rng.rand(B, N, C).astype(np.float32) * 0.2
                       ).astype(jnp.bfloat16)
    k1 = dv["params"]["upscale_conv1"]["kernel"]
    k1m = jnp.asarray(k1)[::-1, ::-1].transpose(2, 0, 1, 3).reshape(C, C)
    k2 = dv["params"]["upscale_conv2"]["kernel"]
    k2m = jnp.asarray(k2)[::-1, ::-1].transpose(2, 0, 1, 3).reshape(64, 128)
    b1 = jnp.asarray(dv["params"]["upscale_conv1"]["bias"])
    b2 = jnp.asarray(dv["params"]["upscale_conv2"]["bias"])
    lw = jnp.asarray(dv["params"]["upscale_ln"]["weight"])
    lb = jnp.asarray(dv["params"]["upscale_ln"]["bias"])
    hyper = jnp.asarray(rng.rand(8, B, 4, 32).astype(np.float32)
                        ).astype(jnp.bfloat16)

    def up_body(s, hyp):
        z = s @ k1m.astype(s.dtype)
        return jnp.sum(fused_mask_tail(z, b1, lw, lb, k2m, b2, hyp))
    f4 = jax.jit(lambda s, h8: jnp.sum(jax.lax.map(
        lambda h: up_body(s, h), h8)))
    report("up.z_plus_kernel", timed(lambda i: f4(srcB + i * 1e-6, hyper)))

    # kernel alone (z precomputed)
    zB = jax.block_until_ready(srcB @ k1m.astype(srcB.dtype))
    f5 = jax.jit(lambda z, h8: jnp.sum(jax.lax.map(
        lambda h: jnp.sum(fused_mask_tail(z, b1, lw, lb, k2m, b2, h)), h8)))
    report("up.kernel_only", timed(lambda i: f5(zB + i * 1e-6, hyper)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
