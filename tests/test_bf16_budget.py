"""bf16 production-numerics regression gate (VERDICT r2 item 3).

The measurement harness lives in scripts/bf16_budget.py (it must own the
process: the suite-wide conftest forces the CPU platform, and the budget is
only meaningful on the chip). This tpu-marked test shells out to it with
--assert, which exits nonzero if any stage's bf16-vs-fp32 q99 relative
error exceeds the tolerance recorded in NUMERICS.md.
"""
import os
import numpy as np
import subprocess
import sys

import pytest


@pytest.mark.tpu
def test_bf16_error_budget_within_recorded_tolerances():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "bf16_budget.py"),
         "--assert"],
        cwd=root, env=env, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])


def test_fast_sin_error_below_bf16_cast_noise(rng):
    """geo_transformer._fast_sin (range reduction + degree-9 odd minimax)
    replaces jnp.sin for the bf16 geo embedding. Two gates: (1) raw
    max |fast_sin - sin| <= 1e-6 over the geo argument range (and well
    beyond); (2) through the bf16 GeometricStructureEmbedding, the
    deviation CAUSED BY the approximation (bf16-fast vs bf16-sin) is no
    larger than the deviation bf16 itself causes (bf16-sin vs fp32-sin)."""
    import jax
    import jax.numpy as jnp
    import sam6d_tpu.models.geo_transformer as gt

    x = jnp.asarray(np.linspace(-40.0, 40.0, 400001).astype(np.float32))
    err = float(jnp.max(jnp.abs(gt._fast_sin(x) - jnp.sin(x))))
    assert err <= 4e-6, err  # 6.1e-7 fit + fp32 evaluation rounding

    pts = jnp.asarray(rng.rand(2, 33, 3).astype(np.float32) * 0.4 - 0.2)
    mod32 = gt.GeometricStructureEmbedding(hidden_dim=64,
                                           dtype=jnp.float32)
    v = mod32.init(jax.random.PRNGKey(0), pts)
    want32 = np.asarray(mod32.apply(v, pts)).astype(np.float32)
    mod16 = gt.GeometricStructureEmbedding(hidden_dim=64,
                                           dtype=jnp.bfloat16)
    from sam6d_tpu.core.params import cast_float_params
    v16 = cast_float_params(v, jnp.bfloat16)
    got_fast = np.asarray(mod16.apply(v16, pts)).astype(np.float32)
    saved = gt._fast_sin
    gt._fast_sin = jnp.sin  # force exact sin through the bf16 path
    try:
        got_sin = np.asarray(mod16.apply(v16, pts)).astype(np.float32)
    finally:
        gt._fast_sin = saved
    approx_dev = np.max(np.abs(got_fast - got_sin))
    dtype_dev = np.max(np.abs(got_sin - want32))
    assert approx_dev <= max(float(dtype_dev), 1e-5), (approx_dev,
                                                       dtype_dev)


def test_gelu_tanh_error_below_bf16_cast_noise(rng):
    """models.vit.gelu uses an fp32 tanh-poly GELU in bf16 (exact erf in
    fp32). Falsifiable criterion for that trade: through a full DINOv2
    block stack, the descriptor deviation CAUSED BY the approximation
    (bf16-poly vs bf16-erf) must be smaller than the deviation bf16 itself
    already causes (bf16-erf vs fp32-erf). If the approximation ever
    dominated the dtype noise, this fails."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from sam6d_tpu.models.dinov2 import DINOv2
    from sam6d_tpu.core.params import cast_float_params

    net = DINOv2(img_size=56, patch_size=14, embed_dim=64, depth=6,
                 num_heads=4, dtype=jnp.float32)
    x = jnp.asarray(rng.rand(2, 56, 56, 3).astype(np.float32))
    v32 = net.init(jax.random.PRNGKey(0), x)

    def run(dtype, approx):
        m = DINOv2(img_size=56, patch_size=14, embed_dim=64, depth=6,
                   num_heads=4, dtype=dtype)
        var = cast_float_params(v32, dtype) if dtype == jnp.bfloat16 else v32
        orig = nn.gelu
        if approx is not None:
            # force the gelu mode regardless of dtype gating
            import sam6d_tpu.models.vit as vit
            real = vit.gelu
            vit.gelu = lambda t: orig(t, approximate=approx)
            try:
                cls, patch = m.apply(var, x.astype(dtype))
            finally:
                vit.gelu = real
        else:
            cls, patch = m.apply(var, x.astype(dtype))
        return np.asarray(cls, np.float64), np.asarray(patch, np.float64)

    cls_fp32, patch_fp32 = run(jnp.float32, False)
    cls_bf_erf, patch_bf_erf = run(jnp.bfloat16, False)
    cls_bf_tanh, patch_bf_tanh = run(jnp.bfloat16, None)  # production form

    def rms_vs_fp32(c, p):
        d = np.concatenate([(c - cls_fp32).ravel(),
                            (p - patch_fp32).ravel()])
        return float(np.sqrt((d ** 2).mean()))

    erf_dev = rms_vs_fp32(cls_bf_erf, patch_bf_erf)
    prod_dev = rms_vs_fp32(cls_bf_tanh, patch_bf_tanh)
    assert prod_dev < 1.15 * erf_dev, (prod_dev, erf_dev)

    # and the pointwise bound on the activation function itself (the
    # clamped odd minimax polynomial, evaluated in fp64 over a wide range)
    from scipy.special import erf as _erf
    from sam6d_tpu.models.vit import (_GELU_P1, _GELU_P3, _GELU_P5,
                                      _GELU_P7)
    t = np.linspace(-40, 40, 400001, dtype=np.float64)
    exact = 0.5 * t * (1 + _erf(t / np.sqrt(2)))
    tc = np.clip(t, -6.75, 6.75)
    t2 = tc * tc
    g = tc * (_GELU_P1 + t2 * (_GELU_P3 + t2 * (_GELU_P5 + t2 * _GELU_P7)))
    approx = 0.5 * t * (1 + np.tanh(g))
    assert np.abs(approx - exact).max() < 1.9e-5
