"""SAMPredictor, profiling utils, PointNet++ modules."""
import numpy as np
import jax
import jax.numpy as jnp

from sam6d_tpu.pipelines.predictor import SAMPredictor
from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
from sam6d_tpu.core.profiling import StageTimer, LogBuffer
from sam6d_tpu.ops.pointnet_modules import SetAbstraction, FeaturePropagation
from tests.test_ism_pipeline import tiny_sam_cfg


def test_sam_predictor_prompted(rng):
    seg = SAMSegmentor(tiny_sam_cfg(), seed=3)
    pred = SAMPredictor(seg)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    pred.set_image(img)
    g = seg.cfg.img_size // seg.cfg.patch_size
    masks, iou, low = pred.predict(np.array([[32.0, 24.0]]), np.array([1]))
    assert masks.shape == (3, 48, 64)
    assert iou.shape == (3,)
    assert low.shape == (3, 4 * g, 4 * g)
    m1, iou1, low1 = pred.predict(np.array([[32.0, 24.0]]), np.array([1]),
                                  multimask_output=False, return_logits=True)
    assert m1.shape == (1, 48, 64) and m1.dtype == np.float32

    # box prompt alone, and points+box+mask_input combined (reference
    # predictor.py predict surface)
    mb, ib, lowb = pred.predict(box=np.array([8.0, 8.0, 40.0, 40.0]))
    assert mb.shape == (3, 48, 64)
    mc, ic, _ = pred.predict(np.array([[32.0, 24.0]]), np.array([1]),
                             box=np.array([8.0, 8.0, 40.0, 40.0]),
                             mask_input=low1, multimask_output=False)
    assert mc.shape == (1, 48, 64)


def test_stage_timer_and_logbuffer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2 and "a" in t.summary()
    lb = LogBuffer()
    lb.update({"loss": 1.0})
    lb.update({"loss": 3.0})
    assert lb.average()["loss"] == 2.0
    lb.clear()
    assert lb.average() == {}


def test_set_abstraction_and_fp(rng):
    xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.rand(2, 64, 8).astype(np.float32))
    sa = SetAbstraction(npoint=16, radius=0.4, nsample=8, mlp_channels=(16, 32))
    v = sa.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, new_feats = sa.apply(v, xyz, feats)
    assert new_xyz.shape == (2, 16, 3)
    assert new_feats.shape == (2, 16, 32)

    fp = FeaturePropagation(mlp_channels=(16,))
    v2 = fp.init(jax.random.PRNGKey(1), xyz, new_xyz, feats, new_feats)
    out = fp.apply(v2, xyz, new_xyz, feats, new_feats)
    assert out.shape == (2, 64, 16)
