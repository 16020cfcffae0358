"""Property tests for the gdrnpp color-augmentation chain.

Reference: `Pose_Estimation_Model/provider/training_dataset.py:81-99` — an
imgaug Sequential of 13 ops under Sometimes gates, random_order=True. Each
op here is pinned by range/semantics properties on deterministic inputs.
"""
import numpy as np
import pytest

from sam6d_tpu.data.megapose import (
    GDRNPP_AUG_CHAIN, color_augment,
    _aug_coarse_dropout, _aug_gaussian_blur, _aug_sharpness, _aug_contrast,
    _aug_brightness, _aug_color, _aug_add, _aug_invert, _aug_multiply_pc,
    _aug_multiply, _aug_gauss_noise, _aug_linear_contrast, _aug_grayscale)


pytestmark = pytest.mark.core  # sub-5-min correctness core


@pytest.fixture
def img():
    rng = np.random.RandomState(7)
    return (rng.rand(64, 48, 3) * 255).astype(np.uint8)


def test_chain_has_all_thirteen_reference_ops():
    assert len(GDRNPP_AUG_CHAIN) == 13
    probs = [p for p, _ in GDRNPP_AUG_CHAIN]
    assert probs == [0.5, 0.4, 0.3, 0.3, 0.5, 0.3, 0.5, 0.3, 0.5, 0.5, 0.1,
                     0.5, 0.5]


def test_all_ops_preserve_shape_and_dtype(img):
    for _, op in GDRNPP_AUG_CHAIN:
        out = op(img, np.random.RandomState(3))
        assert out.shape == img.shape and out.dtype == np.uint8


def test_coarse_dropout_zeros_blocks():
    # large image -> 10x10 coarse cells, p=0.2 each: frac concentrates ~0.2
    rng = np.random.RandomState(7)
    big = (rng.rand(200, 200, 3) * 200 + 30).astype(np.uint8)
    out = _aug_coarse_dropout(big, np.random.RandomState(0))
    zeroed = (out == 0).all(-1)
    frac = zeroed.mean()
    assert 0.08 < frac < 0.4  # ~20% of coarse cells
    # dropped regions are coarse 20x20 blocks, not scattered pixels:
    # every dropped pixel has at least one dropped 4-neighbor
    ys, xs = np.where(zeroed)
    assert len(ys) > 300
    nb = (zeroed[np.clip(ys + 1, 0, 199), xs]
          | zeroed[np.clip(ys - 1, 0, 199), xs]
          | zeroed[ys, np.clip(xs + 1, 0, 199)]
          | zeroed[ys, np.clip(xs - 1, 0, 199)])
    assert nb.all()


def test_gaussian_blur_reduces_variance(img):
    rng = np.random.RandomState(1)  # draws sigma ~ U(0,3)
    sig_rng = np.random.RandomState(1)
    sigma = sig_rng.uniform(0, 3)
    out = _aug_gaussian_blur(img, rng)
    if sigma > 0.3:
        assert out.astype(float).var() < img.astype(float).var()
    # channels blurred independently (no cross-channel mixing): a pure-red
    # image stays pure red
    red = np.zeros_like(img)
    red[..., 0] = 200
    out_r = _aug_gaussian_blur(red, np.random.RandomState(5))
    assert out_r[..., 1].max() == 0 and out_r[..., 2].max() == 0


def test_enhance_ops_identity_at_factor_one(img):
    from sam6d_tpu.data.megapose import _enhance
    for which in ("Sharpness", "Contrast", "Brightness", "Color"):
        np.testing.assert_array_equal(_enhance(img, which, 1.0), img)


def test_brightness_zero_factor_black(img):
    from sam6d_tpu.data.megapose import _enhance
    assert _enhance(img, "Brightness", 0.0).max() == 0


def test_add_shifts_mean(img):
    rng = np.random.RandomState(2)
    out = _aug_add(img, rng)
    # re-derive the sampled shift
    rng2 = np.random.RandomState(2)
    n = 3 if rng2.rand() < 0.3 else 1
    v = rng2.uniform(-25, 25, size=(n,))
    shift = float(np.mean(v))
    assert abs((out.astype(float).mean() - img.astype(float).mean())
               - shift) < 3.0  # clipping slack


def test_invert_per_channel():
    img = np.full((8, 8, 3), 40, np.uint8)
    # find a seed where at least one channel inverts
    for seed in range(50):
        rng = np.random.RandomState(seed)
        inv = rng.rand(3) < 0.2
        if inv.any() and not inv.all():
            out = _aug_invert(img, np.random.RandomState(seed))
            assert (out[..., inv] == 215).all()
            assert (out[..., ~inv] == 40).all()
            return
    pytest.fail("no seed with partial inversion")


def test_multiply_scales(img):
    rng = np.random.RandomState(3)
    out = _aug_multiply(img, rng)
    f = np.random.RandomState(3).uniform(0.6, 1.4)
    np.testing.assert_allclose(out.astype(float).mean(),
                               np.clip(np.rint(img * f), 0, 255).mean(),
                               atol=0.5)
    out_pc = _aug_multiply_pc(img, np.random.RandomState(4))
    assert out_pc.shape == img.shape


def test_gauss_noise_scale(img):
    out = _aug_gauss_noise(img, np.random.RandomState(5))
    d = out.astype(float) - img.astype(float)
    # scale=10 noise; clipping at the borders shrinks the std slightly
    assert 7.0 < d.std() < 12.0


def test_linear_contrast_pivot_127():
    img = np.full((8, 8, 3), 127, np.uint8)
    out = _aug_linear_contrast(img, np.random.RandomState(6))
    np.testing.assert_array_equal(out, img)  # pivot fixed point


def test_grayscale_full_alpha_luminosity():
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 0] = 200  # pure red

    class AlphaOne:
        def uniform(self, a, b):
            return 1.0

    out = _aug_grayscale(img, AlphaOne())
    # luminosity weight for red = 0.299 -> ~60 in all channels
    assert np.abs(out.astype(float) - 0.299 * 200).max() < 1.0


def test_color_augment_chain_runs_and_is_deterministic(img):
    a = color_augment(img, np.random.RandomState(11))
    b = color_augment(img, np.random.RandomState(11))
    np.testing.assert_array_equal(a, b)
    c = color_augment(img, np.random.RandomState(12))
    assert a.shape == img.shape and a.dtype == np.uint8
    assert not np.array_equal(a, c)  # different seeds -> different chains


def test_color_augment_random_order_changes_result(img):
    """With fixed per-op draws, two different permutations must be able to
    produce different outputs (random_order=True is semantically active)."""
    outs = {color_augment(img, np.random.RandomState(s)).tobytes()
            for s in range(8)}
    assert len(outs) > 4
