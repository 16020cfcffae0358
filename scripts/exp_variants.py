#!/usr/bin/env python
"""One-off TPU experiments for MFU diagnosis. Usage:
  python scripts/exp_variants.py calib dino seg_decode
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

from bench import timed, init_like, _log

RESULTS = {}


def report(name, seconds, flops=None):
    ms = seconds * 1e3
    RESULTS[name] = round(ms, 2)
    extra = ""
    if flops:
        extra = f"  ({flops/seconds/1e12:.1f} TF/s)"
    _log(f"{name}: {ms:.1f} ms{extra}")


def bf16_tree(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)


def exp_calib():
    """Pure GEMM chain at ViT-L MLP shapes: the achievable ceiling."""
    rng = np.random.RandomState(0)
    M, D, H = 8224, 1024, 4096
    x = jnp.asarray(rng.rand(M, D).astype(np.float32)).astype(jnp.bfloat16)
    W1 = jnp.asarray(rng.rand(D, H).astype(np.float32)).astype(jnp.bfloat16) * 0.01
    W2 = jnp.asarray(rng.rand(H, D).astype(np.float32)).astype(jnp.bfloat16) * 0.01

    def chain(x, n):
        def body(y, _):
            y = jnp.maximum(y @ W1, 0) @ W2
            return y * 0.5, None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y)

    f = jax.jit(lambda x: chain(x, 24))
    flops = 24 * 2 * M * D * H * 2
    report("calib.mlp24", timed(lambda i: f(x + i * 1e-6)), flops)


def exp_dino():
    from sam6d_tpu.core.config import ISMConfig
    from sam6d_tpu.models.dinov2 import DINOv2

    cfg = ISMConfig()
    d = cfg.dinov2
    model = DINOv2(img_size=d.img_size, patch_size=d.patch_size,
                   embed_dim=d.embed_dim, depth=d.depth,
                   num_heads=d.num_heads, dtype=jnp.bfloat16)
    v = init_like(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, d.img_size, d.img_size, 3))))
    v16 = bf16_tree(v)
    rng = np.random.RandomState(0)
    crops = jnp.asarray(rng.rand(128, d.img_size, d.img_size, 3).astype(np.float32))
    crops16 = crops.astype(jnp.bfloat16)
    flops = 128 * 24 * (2 * 257 * 1024 * 3072 + 4 * 257 * 257 * 1024
                        + 2 * 257 * 1024 * 1024 + 4 * 257 * 1024 * 4096)

    def chunked(vv, x, chunk):
        xs = x.reshape(-1, chunk, *x.shape[1:])
        cls, _ = jax.lax.map(lambda c: model.apply(vv, c), xs)
        return jnp.sum(cls)

    for chunk in (32, 128):
        f = jax.jit(lambda vv, x, c=chunk: chunked(vv, x, c))
        report(f"dino.bf16params_c{chunk}",
               timed(lambda i: f(v16, crops + i * 1e-6)), flops)

    f2 = jax.jit(lambda vv, x: chunked(vv, x, 32))
    report("dino.bf16params_bf16in_c32",
           timed(lambda i: f2(v16, crops16 + jnp.bfloat16(i * 1e-6))), flops)


def exp_seg_decode():
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    g = cfg.img_size // cfg.patch_size
    emb = jnp.asarray(rng.rand(g, g, cfg.prompt_embed_dim).astype(np.float32))

    # decode only (all 1024 prompts, no resize/scoring)
    def decode_only(v, e):
        dense_pe = seg.prompt_encoder.apply(v["prompt_encoder"], method="dense_pe")
        chunk = cfg.points_per_batch
        P = pts.shape[0]

        def one(p):
            masks, iou = seg._decode_chunk(v, e, dense_pe, p)
            return jnp.sum(masks), jnp.sum(iou)
        ms, io = jax.lax.map(one, pts.reshape(P // chunk, chunk, 2))
        return jnp.sum(ms) + jnp.sum(io)

    f = jax.jit(decode_only)
    report("seg.decode_only", timed(lambda i: f(seg.vars, emb + i * 1e-6)))

    # resize + stability + boxes only, from fixed low-res masks
    low = jnp.asarray(rng.rand(8, 128, 3, 256, 256).astype(np.float32)) * 2 - 1

    def score_only(lo):
        from sam6d_tpu.ops.masks import masks_to_boxes

        def one(masks):
            hi = seg._resize_logits(masks.astype(jnp.bfloat16), Ry.astype(jnp.bfloat16), Rx.astype(jnp.bfloat16))
            inter = jnp.sum(hi > cfg.stability_score_offset, axis=(-1, -2))
            union = jnp.sum(hi > -cfg.stability_score_offset, axis=(-1, -2))
            boxes = masks_to_boxes((hi.reshape(-1, hs, ws) > 0).astype(jnp.float32))
            return inter / jnp.maximum(union, 1), boxes
        st, bx = jax.lax.map(one, lo)
        return jnp.sum(st) + jnp.sum(bx)

    f2 = jax.jit(score_only)
    report("seg.upsample_score_only", timed(lambda i: f2(low + i * 1e-6)))

    v16 = bf16_tree(seg.vars)
    pr = jax.jit(lambda v, e: jnp.sum(seg._propose_impl(
        v, e, pts, Ry, Rx, hs, ws, h_in, w_in)[1]))
    report("seg.propose_bf16params", timed(lambda i: pr(v16, emb + i * 1e-6)))

    enc = jax.jit(lambda v, c: jnp.sum(seg.encoder.apply(v["image_encoder"], c)))
    canvas_j = jnp.asarray(canvas[None])
    report("seg.encoder_bf16params", timed(lambda i: enc(v16, canvas_j + i * 1e-6)))


def main():
    groups = sys.argv[1:] or ["calib", "dino", "seg_decode"]
    for g in groups:
        _log(f"=== {g} ===")
        try:
            dict(calib=exp_calib, dino=exp_dino, seg_decode=exp_seg_decode)[g]()
        except Exception as e:
            _log(f"{g} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
