#!/usr/bin/env python
"""Experiment matrix #23: DINOv2 describe chunk-size sweep at the match
stage level (bench-identical program)."""
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
    from sam6d_tpu.core.config import ISMConfig, SAMConfig, DINOv2Config
    from sam6d_tpu.pipelines.ism import ISMPipeline

    proposals = 128
    rng = np.random.RandomState(0)
    H, W = 480, 640
    rgb01 = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(proposals, H, W) > 0.9).astype(np.float32))
    boxes = np.zeros((proposals, 4), np.float32)
    boxes[:, 0] = rng.randint(0, W // 2, proposals)
    boxes[:, 1] = rng.randint(0, H // 2, proposals)
    boxes[:, 2] = boxes[:, 0] + rng.randint(20, W // 2, proposals)
    boxes[:, 3] = boxes[:, 1] + rng.randint(20, H // 2, proposals)
    boxes = jnp.asarray(boxes)
    valid = jnp.ones((proposals,), bool)
    valid48 = jnp.asarray(np.arange(proposals) < 48)
    depth = jnp.asarray((rng.rand(H, W) * 1000).astype(np.float32))
    K = jnp.asarray(np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]],
                             np.float32))

    for chunk in (8, 16, 32, 64):
        cfg = ISMConfig(sam=SAMConfig(max_proposals=proposals),
                        dinov2=DINOv2Config(chunk_size=chunk))
        pipe = ISMPipeline(cfg, dinov2_variables="eval_shape",
                           dtype=jnp.bfloat16)
        d = cfg.dinov2
        ref_desc = jnp.asarray(rng.rand(1, 42, d.embed_dim
                                        ).astype(np.float32))
        n_patch = (d.img_size // d.patch_size) ** 2
        ref_appe = jnp.asarray(rng.rand(1, 42, n_patch, d.embed_dim
                                        ).astype(np.float32))
        poses_R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                      (42, 1, 1)))
        clouds = jnp.asarray(rng.rand(1, 2048, 3).astype(np.float32) * 0.05)
        prog = jax.jit(lambda v, r, va, p=pipe: jnp.sum(p._score_frame_impl(
            v, r, masks, boxes, va, depth, K, jnp.float32(1.0),
            ref_desc, ref_appe, poses_R, clouds, apply_nms=True)["scores"]))
        report(f"match.c{chunk}_full",
               timed(lambda i: prog(pipe.dinov2_vars, rgb01 + i * 1e-6,
                                    valid)))
        report(f"match.c{chunk}_48",
               timed(lambda i: prog(pipe.dinov2_vars, rgb01 + i * 1e-6,
                                    valid48)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
