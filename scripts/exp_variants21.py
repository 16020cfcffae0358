#!/usr/bin/env python
"""Experiment matrix #21: escape the ~8-trip lax.map pathology.
score_all(P=1024) at chunk {32, 64, 128} x scan unroll {1, 2}."""
from __future__ import annotations

import dataclasses
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

    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    base = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                     stability_score_thresh=0.0)
    seg = SAMSegmentor(base, variables="eval_shape", dtype=jnp.bfloat16)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    emb = jnp.asarray(rng.rand(64, 64, 256).astype(np.float32))
    dense_pe = seg.prompt_encoder.apply(seg.vars["prompt_encoder"],
                                        method="dense_pe")
    P = 1024

    def score_chunked(chunk, unroll):
        def one(carry, pq):
            v, e = carry
            masks, iou = seg._decode_chunk(v, e, dense_pe, pq)
            hi = seg._resize_logits_block(masks, Ry, Rx)
            inter = jnp.sum(hi > 1.0, axis=(-1, -2))
            union = jnp.sum(hi > -1.0, axis=(-1, -2))
            from sam6d_tpu.ops.masks import masks_to_boxes
            boxes = masks_to_boxes(
                (hi.reshape(-1, hs, ws) > 0.0).astype(jnp.float32))
            return carry, (jnp.sum(iou), jnp.sum(inter - union),
                           jnp.sum(boxes))

        def fn(v, e):
            _, outs = jax.lax.scan(one, (v, e),
                                   pts[:P].reshape(P // chunk, chunk, 2),
                                   unroll=unroll)
            return sum(jnp.sum(o) for o in outs)
        return jax.jit(fn)

    for chunk in (32, 64, 128):
        for unroll in (1, 2):
            f = score_chunked(chunk, unroll)
            report(f"score1024_c{chunk}_u{unroll}",
                   timed(lambda i: f(seg.vars, emb + i * 1e-6)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
