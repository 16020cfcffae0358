"""Pallas kernel correctness vs the XLA formulations (interpret mode on CPU;
the same kernels compile natively on TPU)."""
import numpy as np
import jax.numpy as jnp

from sam6d_tpu.ops.sampling import farthest_point_sample
from sam6d_tpu.kernels.fps import farthest_point_sample_pallas


def test_fps_pallas_matches_xla(rng):
    pts = rng.randn(2, 100, 3).astype(np.float32)
    want = np.asarray(farthest_point_sample(jnp.array(pts), 16))
    got = np.asarray(farthest_point_sample_pallas(jnp.array(pts), 16,
                                                  interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_valid_mask(rng):
    pts = rng.randn(1, 64, 3).astype(np.float32)
    pts[0, 40:] += 100.0
    mask = np.zeros((1, 64), bool)
    mask[0, :40] = True
    got = np.asarray(farthest_point_sample_pallas(
        jnp.array(pts), 8, jnp.array(mask), interpret=True))
    assert (got < 40).all()
    want = np.asarray(farthest_point_sample(jnp.array(pts), 8, jnp.array(mask)))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_padded_n(rng):
    # N not a lane multiple exercises the padding path
    pts = rng.randn(1, 77, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample_pallas(jnp.array(pts), 8,
                                                  interpret=True))
    want = np.asarray(farthest_point_sample(jnp.array(pts), 8))
    np.testing.assert_array_equal(got, want)
