#!/usr/bin/env python
"""Experiment matrix #11: isolate the prompt-count-independent ~170 ms in
score_all (chunk-size sweep, decode-only maps, XLA cost analysis)."""
from __future__ import annotations

import json
import os
import sys
import dataclasses

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

    segs = {}
    for chunk in (128, 256, 512):
        cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                        stability_score_thresh=0.0, points_per_batch=chunk)
        segs[chunk] = SAMSegmentor(cfg, variables="eval_shape",
                                   dtype=jnp.bfloat16)
    seg = segs[128]
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    g = 64
    emb = jnp.asarray(rng.rand(g, g, 256).astype(np.float32))

    # FLOP count from XLA cost analysis (no run)
    f1024 = jax.jit(lambda v, e: jnp.sum(segs[128]._score_all_impl(
        v, e, pts[:1024], Ry, Rx, hs, ws, h_in, w_in)[2]))
    try:
        c = f1024.lower(seg.vars, emb).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        _log(f"cost_analysis score1024: flops={c.get('flops', -1):.3e} "
             f"bytes={c.get('bytes accessed', -1):.3e}")
        RESULTS["score1024_tflops"] = round(c.get("flops", 0) / 1e12, 3)
        RESULTS["score1024_gbytes"] = round(
            c.get("bytes accessed", 0) / 1e9, 2)
    except Exception as e:
        _log(f"cost_analysis failed: {e}")

    # chunk-size sweep at P=1024
    for chunk in (128, 256, 512):
        s = segs[chunk]
        f = jax.jit(lambda v, e, s=s: jnp.sum(s._score_all_impl(
            v, e, pts[:1024], Ry, Rx, hs, ws, h_in, w_in)[2]))
        report(f"sweep.score1024_c{chunk}",
               timed(lambda i: f(s.vars, emb + i * 1e-6)))

    # decode-only lax.map over 2 vs 8 chunks of 128 (no resize tail)
    dense_pe = seg.prompt_encoder.apply(seg.vars["prompt_encoder"],
                                        method="dense_pe")

    for nchunks in (2, 8):
        def fn(v, e, n=nchunks):
            return jnp.sum(jax.lax.map(
                lambda q: jnp.sum(seg._decode_chunk(v, e, dense_pe, q)[0]),
                pts[:128 * n].reshape(n, 128, 2)))
        f = jax.jit(fn)
        report(f"sweep.decode_map{nchunks}",
               timed(lambda i: f(seg.vars, emb + i * 1e-6)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
