"""Tensor-parallel encoder sharding (parallel/tp.py) on the virtual
8-device CPU mesh: GSPMD column/row-parallel weights must reproduce the
single-device outputs, and the big kernels must actually be distributed."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam6d_tpu.parallel.mesh import make_mesh
from sam6d_tpu.parallel.tp import jit_tp, shard_params_tp, tp_param_specs


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, dp=1, tp=8)


def test_sam_encoder_tp_matches_single_device(mesh, rng=None):
    from sam6d_tpu.models.sam import SAMImageEncoder

    rng = np.random.RandomState(0)
    enc = SAMImageEncoder(img_size=64, patch_size=16, embed_dim=64, depth=3,
                          num_heads=8, window_size=3, global_attn_indexes=(1,),
                          out_chans=16)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), x)
    want = np.asarray(enc.apply(v, x))

    fn, v_tp = jit_tp(lambda v_, x_: enc.apply(v_, x_), mesh, v)
    got = np.asarray(fn(v_tp, x))
    np.testing.assert_allclose(got, want, atol=2e-5)

    # the scanned qkv kernel (depth, C, 3C) must be split over tp
    qkv = v_tp["params"]["blocks"]["block"]["attn_qkv"]["kernel"]
    assert len(qkv.sharding.device_set) == 8
    spec = tp_param_specs(v)["params"]["blocks"]["block"]["attn_qkv"]["kernel"]
    assert spec[-1] == "tp"


def test_dinov2_tp_matches_single_device(mesh):
    from sam6d_tpu.models.dinov2 import DINOv2

    rng = np.random.RandomState(1)
    net = DINOv2(patch_size=8, embed_dim=64, depth=2, num_heads=8,
                 img_size=32)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), x)
    cls_w, patch_w = net.apply(v, x)

    fn, v_tp = jit_tp(lambda v_, x_: net.apply(v_, x_), mesh, v)
    cls_g, patch_g = fn(v_tp, x)
    np.testing.assert_allclose(np.asarray(cls_g), np.asarray(cls_w),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(patch_g), np.asarray(patch_w),
                               atol=2e-5)
    # the scanned MLP fc1 kernel must actually be distributed
    fc1 = jax.tree_util.tree_leaves(jax.tree_util.tree_map_with_path(
        lambda p, x: x if any(getattr(k, "key", "") == "fc1" for k in p)
        else None, v_tp, is_leaf=lambda x: x is None))
    assert fc1 and all(len(x.sharding.device_set) == 8 for x in fc1
                       if hasattr(x, "sharding"))
