#!/usr/bin/env python
"""Round-2 experiment matrix #2: isolate flash vs einsum per model."""
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


def exp_dino():
    from sam6d_tpu.core.config import ISMConfig
    from sam6d_tpu.models.dinov2 import DINOv2

    d = ISMConfig().dinov2
    rng = np.random.RandomState(0)
    crops = jnp.asarray(rng.rand(128, d.img_size, d.img_size, 3).astype(np.float32))

    for flash in (False, True):
        model = DINOv2(img_size=d.img_size, patch_size=d.patch_size,
                       embed_dim=d.embed_dim, depth=d.depth,
                       num_heads=d.num_heads, use_flash=flash,
                       dtype=jnp.bfloat16)
        v = cast_float_params(init_like(lambda m=model: m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, d.img_size, d.img_size, 3)))),
            jnp.bfloat16)

        def chunked(vv, x, m=model):
            xs = x.reshape(-1, 32, *x.shape[1:])
            cls, _ = jax.lax.map(lambda c: m.apply(vv, c), xs)
            return jnp.sum(cls)
        f = jax.jit(chunked)
        report(f"dino.c32_flash{int(flash)}",
               timed(lambda i: f(v, crops + i * 1e-6)))


def exp_describe():
    from sam6d_tpu.core.config import ISMConfig, SAMConfig
    from sam6d_tpu.pipelines.ism import ISMPipeline

    P = 128
    cfg = ISMConfig(sam=SAMConfig(max_proposals=P))
    pipe = ISMPipeline(cfg, dinov2_variables="eval_shape", dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    H, W = 480, 640
    rgb01 = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(P, H, W) > 0.9).astype(np.float32))
    boxes = np.zeros((P, 4), np.float32)
    boxes[:, 0] = rng.randint(0, W // 2, P)
    boxes[:, 1] = rng.randint(0, H // 2, P)
    boxes[:, 2] = boxes[:, 0] + rng.randint(20, W // 2, P)
    boxes[:, 3] = boxes[:, 1] + rng.randint(20, H // 2, P)
    boxes = jnp.asarray(boxes)
    de = jax.jit(lambda v, r: jnp.sum(pipe._describe_impl(
        v, r, masks, boxes.astype(jnp.int32))[0]))
    report("match.describe_new", timed(lambda i: de(pipe.dinov2_vars, rgb01 + i * 1e-6)))


def exp_seg():
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.models.sam import SAMImageEncoder

    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    canvas_j = jnp.asarray(canvas[None])
    g = cfg.img_size // cfg.patch_size
    emb = jnp.asarray(rng.rand(g, g, cfg.prompt_embed_dim).astype(np.float32))

    # encoder with flash windows (pipeline default)
    enc = jax.jit(lambda v, c: jnp.sum(seg.encoder.apply(v["image_encoder"], c)))
    report("seg.encoder_flashwin", timed(lambda i: enc(seg.vars, canvas_j + i * 1e-6)))

    # encoder with einsum windows + flash global only... use_flash toggles both;
    # measure use_flash=False entirely (einsum global+windows, patchembed GEMM)
    enc_nf = SAMImageEncoder(
        img_size=cfg.img_size, patch_size=cfg.patch_size,
        embed_dim=cfg.encoder_embed_dim, depth=cfg.encoder_depth,
        num_heads=cfg.encoder_num_heads, window_size=cfg.window_size,
        global_attn_indexes=cfg.encoder_global_attn_indexes,
        out_chans=cfg.prompt_embed_dim, use_flash=False, dtype=jnp.bfloat16)
    f_nf = jax.jit(lambda v, c: jnp.sum(enc_nf.apply(v["image_encoder"], c)))
    report("seg.encoder_noflash", timed(lambda i: f_nf(seg.vars, canvas_j + i * 1e-6)))

    # decode only (pixel-shuffle upsample now)
    def decode_only(v, e):
        dense_pe = seg.prompt_encoder.apply(v["prompt_encoder"], method="dense_pe")
        chunk = cfg.points_per_batch
        P = pts.shape[0]

        def one(p):
            m, iou = seg._decode_chunk(v, e, dense_pe, p)
            return jnp.sum(m), jnp.sum(iou)
        ms, io = jax.lax.map(one, pts.reshape(P // chunk, chunk, 2))
        return jnp.sum(ms) + jnp.sum(io)
    f2 = jax.jit(decode_only)
    report("seg.decode_only_ps", timed(lambda i: f2(seg.vars, emb + i * 1e-6)))

    pr = jax.jit(lambda v, e: jnp.sum(seg._propose_impl(
        v, e, pts, Ry, Rx, hs, ws, h_in, w_in)[1]))
    report("seg.propose_new", timed(lambda i: pr(seg.vars, emb + i * 1e-6)))


def main():
    groups = sys.argv[1:] or ["dino", "describe", "seg"]
    for g in groups:
        _log(f"=== {g} ===")
        try:
            dict(dino=exp_dino, describe=exp_describe, seg=exp_seg)[g]()
        except Exception as e:
            _log(f"{g} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
