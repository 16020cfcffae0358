#!/usr/bin/env python
"""Experiment matrix #19: does score_all really saturate with prompt count?
propose with/without prerank; score_all P sweep with ALL outputs consumed."""
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

    def score_consume_all(P):
        def fn(v, e):
            iou, stab, boxes = seg._score_all_impl(
                v, e, pts[:P], Ry, Rx, hs, ws, h_in, w_in)
            return jnp.sum(iou) + jnp.sum(stab) + jnp.sum(boxes)
        return jax.jit(fn)

    for P in (1024, 2048, 3072):
        f = score_consume_all(P)
        report(f"scoreall.P{P}", timed(lambda i: f(seg.vars, emb + i * 1e-6)))

    # propose: prerank on vs off
    for pr in (1024, 0):
        cfg = dataclasses.replace(base, amg_prerank=pr)
        s2 = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
        s2.vars = seg.vars
        f = jax.jit(lambda v, e, s=s2: jnp.sum(s2._propose_impl(
            v, e, pts, Ry, Rx, hs, ws, h_in, w_in)[1]))
        report(f"propose.prerank{pr}",
               timed(lambda i: f(seg.vars, emb + i * 1e-6)))

    # repeatability check
    f = score_consume_all(1024)
    report("scoreall.P1024_again", timed(lambda i: f(seg.vars, emb + i * 1e-6)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
