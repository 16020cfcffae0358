#!/usr/bin/env python
"""Experiment matrix #16: decode A/B in ONE harness (map8).

Suspects for the 6.6 -> 20 ms/chunk decode regression vs round-2-start:
transformer rewrite vs tail formulation. Variants:
  t1  transformer shared-L1 (current)
  t2  transformer broadcast-upfront (old graph shape)
  u1  tail: Pallas kernel (current)
  u2  tail: XLA row-major block path (old)
  u3  tail: XLA layout-clean (z4 (B,4N,64) -> y (B,4N,128) -> blockdiag
      hyper GEMM -> (B,16,4N))
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
    from sam6d_tpu.models.sam import TwoWayTransformer, MaskDecoder
    from sam6d_tpu.kernels.mask_tail import fused_mask_tail, _gelu_exact

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

    def tw_body(v, t):
        q, k = tw.apply(v, src0, pos0, t)
        return jnp.sum(q) + jnp.sum(k)
    f = map8(tw_body)
    report("t1.shared_l1", timed(lambda i: f(tv, toks + i * 1e-6)))

    srcB = jax.block_until_ready(jnp.broadcast_to(src0, (B, N, C)).copy())
    posB = jax.block_until_ready(jnp.broadcast_to(pos0, (B, N, C)).copy())

    def t2_run():
        def tw_body_b(v, t, sB, pB):
            q, k = tw.apply(v, sB, pB, t)
            return jnp.sum(q) + jnp.sum(k)
        f = jax.jit(lambda v, t8, sB, pB: jnp.sum(jax.lax.map(
            lambda t: tw_body_b(v, t, sB, pB), t8)))
        report("t2.broadcast",
               timed(lambda i: f(tv, toks + i * 1e-6, srcB, posB)))

    # ------- tails -------
    zB = jnp.asarray(rng.rand(B, N, C).astype(np.float32) * 0.3
                     ).astype(jnp.bfloat16)
    k2m = jnp.asarray(dv["params"]["upscale_conv2"]["kernel"]
                      )[::-1, ::-1].transpose(2, 0, 1, 3).reshape(64, 128)
    b1 = jnp.asarray(dv["params"]["upscale_conv1"]["bias"])
    b2 = jnp.asarray(dv["params"]["upscale_conv2"]["bias"])
    lw = jnp.asarray(dv["params"]["upscale_ln"]["weight"])
    lb = jnp.asarray(dv["params"]["upscale_ln"]["bias"])
    hyper = jnp.asarray(rng.rand(8, B, 4, 32).astype(np.float32)
                        ).astype(jnp.bfloat16)

    f = jax.jit(lambda z, h8: jnp.sum(jax.lax.map(
        lambda h: jnp.sum(fused_mask_tail(z, b1, lw, lb, k2m, b2, h)), h8)))
    report("u1.pallas", timed(lambda i: f(zB + i * 1e-6, hyper)))

    # u2: old XLA row-major block path (bf16 throughout)
    def u2(z, h):
        x = z.reshape(B, 64, 64, 2, 2, 64) + b1.astype(z.dtype)
        u = x.mean(axis=-1, keepdims=True)
        s = ((x - u) ** 2).mean(axis=-1, keepdims=True)
        x = (x - u) / jnp.sqrt(s + 1e-6) * lw.astype(z.dtype) \
            + lb.astype(z.dtype)
        x = _gelu_exact(x)
        x = x.reshape(-1, 64) @ k2m.astype(x.dtype)
        x = x.reshape(B, 64, 64, 2, 2, 2, 2, 32) + b2.astype(x.dtype)
        x = _gelu_exact(x)
        m = jnp.einsum("bkc,bijpqrsc->bkijpqrs", h, x)
        m = m.transpose(0, 1, 2, 4, 6, 3, 5, 7)
        return jnp.sum(m.reshape(B, 4, 256, 256))
    f = jax.jit(lambda z, h8: jnp.sum(jax.lax.map(
        lambda h: u2(z, h), h8)))
    report("u2.xla_rowmajor", timed(lambda i: f(zB + i * 1e-6, hyper)))

    # u3: layout-clean XLA tail
    eye4 = jnp.eye(4, dtype=jnp.bfloat16)

    def u3(z, h):
        z4 = z.reshape(B, N * 4, 64)
        x = z4 + b1.astype(z.dtype)
        u = x.mean(axis=-1, keepdims=True)
        s = ((x - u) ** 2).mean(axis=-1, keepdims=True)
        x = (x - u) / jnp.sqrt(s + 1e-6) * lw.astype(z.dtype) \
            + lb.astype(z.dtype)
        x = _gelu_exact(x)
        y = x @ k2m.astype(x.dtype)          # (B, 4N, 128)
        y = _gelu_exact(y + jnp.tile(b2, 4).astype(y.dtype))
        # per-prompt block-diag weights (B, 128, 16): W[(rs,c),(k,rs')] =
        # hyper[k,c] * delta(rs,rs')
        W = jnp.einsum("bkc,rt->brckt", h, eye4).reshape(B, 128, 16)
        m = jnp.einsum("bmc,bck->bkm", y, W)  # (B, 16, 4N)
        return jnp.sum(m)
    f = jax.jit(lambda z, h8: jnp.sum(jax.lax.map(
        lambda h: u3(z, h), h8)))
    report("u3.xla_clean", timed(lambda i: f(zB + i * 1e-6, hyper)))

    try:
        t2_run()
    except Exception as e:
        _log(f"t2 FAILED: {e}")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
