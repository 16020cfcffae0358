#!/usr/bin/env python
"""Experiment matrix #13: score_all tail variants (resize dtype / fusion)."""
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
from sam6d_tpu.ops.masks import masks_to_boxes

RESULTS = {}


def report(name, seconds):
    RESULTS[name] = round(seconds * 1e3, 2)
    _log(f"{name}: {seconds*1e3:.1f} ms")


def main():
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32))
    dense_pe = seg.prompt_encoder.apply(seg.vars["prompt_encoder"],
                                        method="dense_pe")
    P = 1024

    def score_variant(tail):
        def fn(v, e):
            def one(q):
                masks, iou = seg._decode_chunk(v, e, dense_pe, q)
                return tail(masks, iou)
            outs = jax.lax.map(one, pts[:P].reshape(P // 128, 128, 2))
            return jnp.sum(outs[0]) + jnp.sum(outs[1])
        return jax.jit(fn)

    # v0: decode only (baseline floor)
    f0 = score_variant(lambda m, iou: (jnp.sum(m), jnp.sum(iou)))
    report("v0.decode_only", timed(lambda i: f0(seg.vars, emb + i * 1e-6)))

    # v1: current full tail (fp32 resize, counts + boxes)
    def tail1(m, iou):
        hi = seg._resize_logits_block(m, Ry, Rx)
        inter = jnp.sum(hi > 1.0, axis=(-1, -2))
        union = jnp.sum(hi > -1.0, axis=(-1, -2))
        boxes = masks_to_boxes(
            (hi.reshape(-1, hs, ws) > 0.0).astype(jnp.float32))
        return jnp.sum(inter / jnp.maximum(union, 1)), jnp.sum(boxes)
    f1 = score_variant(tail1)
    report("v1.tail_fp32", timed(lambda i: f1(seg.vars, emb + i * 1e-6)))

    # v2: bf16 resize matrices
    Ryb = Ry.astype(jnp.bfloat16)
    Rxb = Rx.astype(jnp.bfloat16)

    def tail2(m, iou):
        hi = seg._resize_logits_block(m, Ryb, Rxb)
        inter = jnp.sum(hi > 1.0, axis=(-1, -2))
        union = jnp.sum(hi > -1.0, axis=(-1, -2))
        boxes = masks_to_boxes(
            (hi.reshape(-1, hs, ws) > 0.0).astype(jnp.float32))
        return jnp.sum(inter / jnp.maximum(union, 1)), jnp.sum(boxes)
    f2 = score_variant(tail2)
    report("v2.tail_bf16", timed(lambda i: f2(seg.vars, emb + i * 1e-6)))

    # v3: bf16 + independent chains (counts vs boxes recompute the resize)
    def tail3(m, iou):
        hi_a = seg._resize_logits_block(m, Ryb, Rxb)
        inter = jnp.sum(hi_a > 1.0, axis=(-1, -2))
        union = jnp.sum(hi_a > -1.0, axis=(-1, -2))
        hi_b = seg._resize_logits_block(m, Ryb, Rxb)
        boxes = masks_to_boxes(
            (hi_b.reshape(-1, hs, ws) > 0.0).astype(jnp.float32))
        return jnp.sum(inter / jnp.maximum(union, 1)), jnp.sum(boxes)
    f3 = score_variant(tail3)
    report("v3.tail_chains", timed(lambda i: f3(seg.vars, emb + i * 1e-6)))

    # v4: counts only, no boxes (what do boxes cost?)
    def tail4(m, iou):
        hi = seg._resize_logits_block(m, Ryb, Rxb)
        inter = jnp.sum(hi > 1.0, axis=(-1, -2))
        union = jnp.sum(hi > -1.0, axis=(-1, -2))
        return jnp.sum(inter / jnp.maximum(union, 1)), jnp.sum(iou)
    f4 = score_variant(tail4)
    report("v4.counts_only", timed(lambda i: f4(seg.vars, emb + i * 1e-6)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
