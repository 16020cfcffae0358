"""Gradient checkpointing on the ViT scan (ViTConfig.remat): parameter tree
and gradients must be identical to the non-remat path — remat only changes
what the backward pass stores vs recomputes."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from sam6d_tpu.models.vit import ViTEncoder


def _make(remat):
    return ViTEncoder(img_size=32, patch_size=16, embed_dim=32, depth=4,
                      num_heads=4, out_dim=16, remat=remat)


@pytest.mark.slow
def test_remat_same_params_and_grads(rng):
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    base = _make(False)
    ckpt = _make(True)
    variables = base.init(jax.random.PRNGKey(0), x)
    # identical parameter structure: remat is transparent to scope names,
    # so converted checkpoints load unchanged
    v2 = ckpt.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))

    def loss(model):
        def f(v):
            fmap, cls = model.apply(v, x)
            return jnp.sum(fmap ** 2) + jnp.sum(cls ** 2)
        return f

    l0, g0 = jax.value_and_grad(loss(base))(variables)
    l1, g1 = jax.value_and_grad(loss(ckpt))(variables)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert p0 == p1
        # recomputation reorders float reductions; allow last-ulp drift
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-3, err_msg=str(p0))
