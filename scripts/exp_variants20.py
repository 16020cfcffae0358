#!/usr/bin/env python
"""Experiment matrix #20: is the flat ~147 ms score_all cost on-device or
dispatch-level? Chain two maps in one dispatch; print raw rep times."""
from __future__ import annotations

import json
import os
import sys
import time

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

    def score1024(v, e):
        iou, stab, boxes = seg._score_all_impl(
            v, e, pts[:1024], Ry, Rx, hs, ws, h_in, w_in)
        return jnp.sum(iou) + jnp.sum(stab) + jnp.sum(boxes)

    f1 = jax.jit(score1024)

    def twice(v, e):
        a = score1024(v, e)
        b = score1024(v, e + a * 1e-12)  # data dependency: no overlap/CSE
        return a + b
    f2 = jax.jit(twice)

    # raw rep times
    for name, f in [("once", f1), ("twice", f2)]:
        float(f(seg.vars, emb))
        ts = []
        for i in range(7):
            t0 = time.perf_counter()
            float(f(seg.vars, emb + i * 1e-6))
            ts.append((time.perf_counter() - t0) * 1e3)
        _log(f"{name}: raw reps {['%.1f' % t for t in ts]}")
        RESULTS[name] = round(sorted(ts)[3], 2)

    # N=48 chunks (6144 prompts -> tile pts)
    pts48 = jnp.tile(pts, (2, 1))  # 6144

    def score6144(v, e):
        iou, stab, boxes = seg._score_all_impl(
            v, e, pts48, Ry, Rx, hs, ws, h_in, w_in)
        return jnp.sum(iou) + jnp.sum(stab) + jnp.sum(boxes)
    f3 = jax.jit(score6144)
    report("chunks48", timed(lambda i: f3(seg.vars, emb + i * 1e-6)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
