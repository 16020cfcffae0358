#!/usr/bin/env python
"""Experiment matrix #18: windowed-attention cost split (kernel vs rel-pos
glue) + candidate reformulations."""
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
    from sam6d_tpu.kernels.flash_attention import (
        flash_attention_relpos, fused_attention)

    rng = np.random.RandomState(0)
    nW, heads, ws, hd = 25, 16, 14, 80
    N = ws * ws
    q = jnp.asarray(rng.rand(nW, heads, N, hd).astype(np.float32) * 0.2
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.rand(nW, heads, N, hd).astype(np.float32) * 0.2
                    ).astype(jnp.bfloat16)
    v = jnp.asarray(rng.rand(nW, heads, N, hd).astype(np.float32)
                    ).astype(jnp.bfloat16)
    rel_h = jnp.asarray(rng.randn(2 * ws - 1, hd).astype(np.float32) * 0.02)
    rel_w = jnp.asarray(rng.randn(2 * ws - 1, hd).astype(np.float32) * 0.02)

    def x28(body):
        def fn(q_, k_, v_):
            def step(c, _):
                o = body(q_ + 0.001 * c, k_, v_)
                return c + 0.001 * o, None
            out, _ = jax.lax.scan(step, q_, None, length=28)
            return jnp.sum(out)
        return jax.jit(fn)

    f = x28(lambda a, b, c: flash_attention_relpos(
        a, b, c, rel_h.astype(jnp.bfloat16), rel_w.astype(jnp.bfloat16),
        (ws, ws)))
    report("win28.flash_relpos", timed(lambda i: f(q + i * 1e-6, k, v)))

    from sam6d_tpu.kernels.flash_attention import window_attention_relpos
    f = x28(lambda a, b, c: window_attention_relpos(
        a, b, c, rel_h.astype(jnp.bfloat16), rel_w.astype(jnp.bfloat16),
        (ws, ws)))
    report("win28.window_kernel", timed(lambda i: f(q + i * 1e-6, k, v)))

    f = x28(lambda a, b, c: fused_attention(a, b, c, hd ** -0.5))
    report("win28.flash_nobias", timed(lambda i: f(q + i * 1e-6, k, v)))

    # rel-pos tables alone (the per-block prep einsums)
    idx_h = np.arange(ws)[:, None] - np.arange(ws)[None, :] + (ws - 1)
    Rh = rel_h[jnp.asarray(idx_h)].astype(jnp.bfloat16)  # (14, 14, 80)

    def prep(q_):
        qg = q_.reshape(nW, heads, ws, ws, hd)
        a = jnp.einsum("bnhwc,hkc->bnhwk", qg, Rh)
        b = jnp.einsum("bnhwc,wkc->bnhwk", qg, Rh)
        return a + b

    def prep28(q_):
        out, _ = jax.lax.scan(
            lambda c, x: (c + jnp.sum(prep(q_ + c * 1e-9)), None),
            jnp.zeros((), q.dtype), None, length=28)
        return out
    f = jax.jit(prep28)
    report("win28.relprep_only", timed(lambda i: f(q + i * 1e-6)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
