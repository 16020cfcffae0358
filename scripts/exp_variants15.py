#!/usr/bin/env python
"""Experiment matrix #15: mask-tail kernel tile-size sweep + XLA-only tail."""
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
    _log(f"{name}: {seconds*1e3:.1f} ms  ({seconds*1e3/8:.2f}/chunk)")


def main():
    from sam6d_tpu.kernels.mask_tail import (fused_mask_tail,
                                             mask_tail_reference)

    rng = np.random.RandomState(0)
    B, N, C = 128, 4096, 256
    zB = jnp.asarray(rng.rand(B, N, C).astype(np.float32) * 0.3
                     ).astype(jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    lw = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    lb = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    k2m = jnp.asarray(rng.randn(64, 128).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
    hyper = jnp.asarray(rng.rand(8, B, 4, 32).astype(np.float32)
                        ).astype(jnp.bfloat16)

    for tile in (512, 1024, 2048, 4096):
        f = jax.jit(lambda z, h8, t=tile: jnp.sum(jax.lax.map(
            lambda h: jnp.sum(fused_mask_tail(z, b1, lw, lb, k2m, b2, h,
                                              tile=t)), h8)))
        report(f"kernel_t{tile}", timed(lambda i: f(zB + i * 1e-6, hyper)))

    # XLA reference tail for comparison
    f = jax.jit(lambda z, h8: jnp.sum(jax.lax.map(
        lambda h: jnp.sum(mask_tail_reference(z, b1, lw, lb, k2m, b2, h)),
        h8)))
    report("xla_reference", timed(lambda i: f(zB + i * 1e-6, hyper)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
