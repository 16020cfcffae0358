#!/usr/bin/env python
"""Experiment matrix #8: SAM encoder block-level decomposition.

Where do 76 ms go? GEMM theory says ~35 ms: mlp+qkv+proj = 160.6 GF/block
x 32 = 5.14 TF at ~80% MFU. Probes isolate the windowed-attention branch,
the rel-pos bias einsums, window partition relayout, and the global flash
blocks.
"""
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


def exp_encoder():
    from sam6d_tpu.models.sam import (
        SAMImageEncoder, window_partition, window_unpartition, _rel_pos_bias,
        MLPBlock)
    from sam6d_tpu.kernels.flash_attention import flash_attention_relpos
    from sam6d_tpu.core.params import cast_float_params
    from bench import init_like

    rng = np.random.RandomState(0)
    D, heads, ws, grid = 1280, 16, 14, 64
    hd = D // heads
    x = jnp.asarray(rng.rand(1, grid, grid, D).astype(np.float32)).astype(
        jnp.bfloat16)

    # full encoder (reference point)
    enc = SAMImageEncoder(use_flash=True, dtype=jnp.bfloat16)
    ev = cast_float_params(
        init_like(lambda: enc.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1024, 1024, 3)))), jnp.bfloat16)
    img = jnp.asarray(rng.rand(1, 1024, 1024, 3).astype(np.float32))
    ef = jax.jit(lambda v, i: jnp.sum(enc.apply(v, i)))
    report("enc.full", timed(lambda i: ef(ev, img + i * 1e-6)))

    # 32x (mlp + qkv + proj) GEMMs only, scanned like the real encoder
    wq = jnp.asarray(rng.randn(32, D, 3 * D).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)
    wp = jnp.asarray(rng.randn(32, D, D).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(32, D, 4 * D).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(32, 4 * D, D).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)

    def gemms(x0, ws_):
        h = x0.reshape(grid * grid, D)

        def step(carry, w):
            a, b, c, d = w
            q = carry @ a                     # qkv
            carry = carry + (q[:, :D] @ b)    # proj of the q slice (proxy)
            carry = carry + jnp.maximum(carry @ c, 0) @ d  # mlp
            return carry, None
        h, _ = jax.lax.scan(step, h, ws_)
        return jnp.sum(h)
    gf = jax.jit(gemms)
    report("enc.gemms_only32",
           timed(lambda i: gf(x + i * 1e-6, (wq, wp, w1, w2))))

    # windowed attention branch alone (one block's worth), x28
    qkvw = jnp.asarray(rng.randn(D, 3 * D).astype(np.float32) * 0.02
                       ).astype(jnp.bfloat16)
    rel_h = jnp.asarray(rng.randn(2 * grid - 1, hd).astype(np.float32) * 0.02)
    rel_w = jnp.asarray(rng.randn(2 * grid - 1, hd).astype(np.float32) * 0.02)

    def win_attn_once(h):
        hw_, pad_hw = window_partition(h, ws)
        B_ = hw_.shape[0]
        q3 = (hw_.reshape(-1, D) @ qkvw).reshape(B_, ws * ws, 3, heads, hd)
        q3 = q3.transpose(2, 0, 3, 1, 4)
        o = flash_attention_relpos(
            q3[0], q3[1], q3[2],
            rel_h[:2 * ws - 1].astype(jnp.bfloat16),
            rel_w[:2 * ws - 1].astype(jnp.bfloat16), (ws, ws))
        o = o.transpose(0, 2, 1, 3).reshape(B_, ws, ws, D)
        return window_unpartition(o, ws, pad_hw, (grid, grid))

    def win28(h):
        def step(carry, _):
            return carry + 0.001 * win_attn_once(carry), None
        out, _ = jax.lax.scan(step, h, None, length=28)
        return jnp.sum(out)
    wf = jax.jit(win28)
    report("enc.win_attn_flash_x28", timed(lambda i: wf(x + i * 1e-6)))

    # windowed attention without flash (direct einsum + bias), x28
    def win_attn_direct(h):
        hw_, pad_hw = window_partition(h, ws)
        B_ = hw_.shape[0]
        q3 = (hw_.reshape(-1, D) @ qkvw).reshape(B_, ws * ws, 3, heads, hd)
        q3 = q3.transpose(2, 0, 3, 1, 4)
        q, k, v = q3[0], q3[1], q3[2]
        attn = jnp.einsum("bhnc,bhmc->bhnm", q * (hd ** -0.5), k)
        bias = _rel_pos_bias(q, rel_h[:2 * ws - 1].astype(q.dtype),
                             rel_w[:2 * ws - 1].astype(q.dtype), (ws, ws))
        attn = attn + bias.reshape(B_, heads, ws * ws, ws * ws)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B_, ws, ws, D)
        return window_unpartition(o, ws, pad_hw, (grid, grid))

    def win28d(h):
        def step(carry, _):
            return carry + 0.001 * win_attn_direct(carry), None
        out, _ = jax.lax.scan(step, h, None, length=28)
        return jnp.sum(out)
    wfd = jax.jit(win28d)
    report("enc.win_attn_direct_x28", timed(lambda i: wfd(x + i * 1e-6)))

    # global flash attention x4
    def glob4(h):
        def step(carry, _):
            q3 = (carry.reshape(-1, D) @ qkvw).reshape(
                1, grid * grid, 3, heads, hd).transpose(2, 0, 3, 1, 4)
            o = flash_attention_relpos(
                q3[0], q3[1], q3[2], rel_h.astype(jnp.bfloat16),
                rel_w.astype(jnp.bfloat16), (grid, grid))
            o = o.transpose(0, 2, 1, 3).reshape(1, grid, grid, D)
            return carry + 0.001 * o, None
        out, _ = jax.lax.scan(step, h, None, length=4)
        return jnp.sum(out)
    gf4 = jax.jit(glob4)
    report("enc.global_flash_x4", timed(lambda i: gf4(x + i * 1e-6)))

    # layernorms x64 (2 per block)
    import flax.linen as nn
    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
    lv = ln.init(jax.random.PRNGKey(0), x)

    def lns(h):
        def step(carry, _):
            return ln.apply(lv, carry) * 0.999 + carry * 0.001, None
        out, _ = jax.lax.scan(step, h, None, length=64)
        return jnp.sum(out)
    lf = jax.jit(lns)
    report("enc.layernorm_x64", timed(lambda i: lf(x + i * 1e-6)))


def main():
    _log("=== encoder ===")
    try:
        exp_encoder()
    except Exception as e:
        import traceback
        traceback.print_exc()
        _log(f"encoder FAILED: {type(e).__name__}: {e}")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
