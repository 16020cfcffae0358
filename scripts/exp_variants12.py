#!/usr/bin/env python
"""Experiment matrix #12: gather formulations for ball-query grouping."""
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
    from sam6d_tpu.kernels.ball_query import two_scale_ball_query_pallas

    rng = np.random.RandomState(0)
    B, N = 16, 2048
    pts = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 0.5)
    idx1, idx2 = two_scale_ball_query_pallas(pts, pts, 0.1, 32, 0.2, 64)
    idx1, idx2 = jax.block_until_ready((idx1, idx2))
    flat = jnp.concatenate([idx1.reshape(B, -1), idx2.reshape(B, -1)],
                           axis=1)  # (B, 2048*96)

    # (a) current: row gather from (B, N, 3)
    fa = jax.jit(lambda p: jnp.sum(jnp.take_along_axis(
        p, flat[..., None], axis=1)))
    report("g.rows3", timed(lambda i: fa(pts + i * 1e-6)))

    # (b) rows padded to 8 channels
    pts8 = jnp.pad(pts, ((0, 0), (0, 0), (0, 5)))
    fb = jax.jit(lambda p: jnp.sum(jnp.take_along_axis(
        p, flat[..., None], axis=1)))
    report("g.rows8", timed(lambda i: fb(pts8 + i * 1e-6)))

    # (c) three scalar gathers from (B, N)
    def gc(p):
        tot = 0.0
        for c in range(3):
            tot = tot + jnp.sum(jnp.take_along_axis(p[:, :, c], flat, axis=1))
        return tot
    fc = jax.jit(gc)
    report("g.scalar3", timed(lambda i: fc(pts + i * 1e-6)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
