"""FastSAM backend tests (tiny scale; structure + decode + NMS + contract)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from sam6d_tpu.models.fastsam import FastSAMNet, C2f, SPPF
from sam6d_tpu.pipelines.fastsam import FastSAMSegmentor, FastSAMConfig


TINY_W = (8, 16, 32, 64, 64)
TINY_D = (1, 1, 1, 1)


@pytest.mark.slow
def test_fastsam_net_shapes(rng):
    net = FastSAMNet(widths=TINY_W, depths=TINY_D)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    preds, protos = net.apply(variables, x)
    # anchors: 8^2 + 4^2 + 2^2 at strides 8/16/32 of a 64 input
    assert preds.shape == (1, 64 + 16 + 4, 4 + 1 + 32)
    assert protos.shape == (1, 16, 16, 32)
    # decoded boxes are xyxy with x2 >= x1
    p = np.asarray(preds)[0]
    assert (p[:, 2] >= p[:, 0]).all() and (p[:, 3] >= p[:, 1]).all()
    assert (p[:, 4] >= 0).all() and (p[:, 4] <= 1).all()  # sigmoid probs


def test_fastsam_segmentor_contract(rng):
    cfg = FastSAMConfig(imgsz=64, conf_thresh=-1.0, max_det=16)
    seg = FastSAMSegmentor(cfg, widths=TINY_W, depths=TINY_D)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    out = seg.generate_masks(img)
    assert out["masks"].shape == (16, 48, 64)
    assert out["boxes"].shape == (16, 4)
    assert out["valid"].shape == (16,)
    assert out["boxes"][:, 2].max() <= 64 and out["boxes"][:, 3].max() <= 48
    assert out["valid"].any()  # conf threshold disabled -> NMS keeps some


def test_c2f_channels(rng):
    m = C2f(out_ch=16, n=2, shortcut=True)
    x = jnp.asarray(rng.rand(1, 8, 8, 16).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 8, 8, 16)


def test_sppf_pooling(rng):
    m = SPPF(out_ch=16)
    x = jnp.asarray(rng.rand(1, 8, 8, 16).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 8, 8, 16)
