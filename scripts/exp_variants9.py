#!/usr/bin/env python
"""Experiment matrix #9: why doesn't score_all scale with prompt count?"""
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


def main():
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.ops.masks import masks_to_boxes

    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    g = cfg.img_size // cfg.patch_size
    emb = jnp.asarray(rng.rand(g, g, cfg.prompt_embed_dim).astype(np.float32))

    # scaling curve of _score_all_impl
    for P in (128, 384, 1024):
        p = pts[:P]
        f = jax.jit(lambda v, e, p=p: jnp.sum(seg._score_all_impl(
            v, e, p, Ry, Rx, hs, ws, h_in, w_in)[2]))
        report(f"scale.score{P}", timed(lambda i: f(seg.vars, emb + i * 1e-6)))

    # one decode chunk, direct (no lax.map)
    dense_pe = seg.prompt_encoder.apply(seg.vars["prompt_encoder"],
                                        method="dense_pe")
    p128 = pts[:128]
    dec1 = jax.jit(lambda v, e: jnp.sum(seg._decode_chunk(
        v, e, dense_pe, p128)[0]))
    report("scale.decode_chunk1", timed(lambda i: dec1(seg.vars, emb + i * 1e-6)))

    # the per-chunk tail alone: resize 384 masks to (hs, ws) + counts + boxes
    m384 = jnp.asarray(rng.randn(128, 3, 256, 256).astype(np.float32)
                       ).astype(jnp.bfloat16)

    def tail(m):
        hi = seg._resize_logits(m, Ry, Rx)
        inter = jnp.sum(hi > 1.0, axis=(-1, -2))
        union = jnp.sum(hi > -1.0, axis=(-1, -2))
        flat = hi.reshape(-1, hs, ws)
        boxes = masks_to_boxes((flat > 0.0).astype(jnp.float32))
        return jnp.sum(boxes) + jnp.sum(inter - union)
    tf = jax.jit(tail)
    report("scale.resize_tail_chunk1", timed(lambda i: tf(m384 + i * 1e-6)))

    # resize alone (no boxes)
    def tail2(m):
        hi = seg._resize_logits(m, Ry, Rx)
        inter = jnp.sum(hi > 1.0, axis=(-1, -2))
        union = jnp.sum(hi > -1.0, axis=(-1, -2))
        return jnp.sum(inter - union)
    tf2 = jax.jit(tail2)
    report("scale.resize_counts_chunk1", timed(lambda i: tf2(m384 + i * 1e-6)))

    # boxes alone on already-resized masks
    mhi = jnp.asarray((rng.rand(384, hs, ws) > 0.7).astype(np.float32))
    bf = jax.jit(lambda m: jnp.sum(masks_to_boxes(m)))
    report("scale.boxes384", timed(lambda i: bf(mhi + i * 1e-6)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
