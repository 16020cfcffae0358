"""Trainer tests on the virtual 8-device CPU mesh (tiny config)."""
import pytest
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from sam6d_tpu.core.config import Config, TrainConfig
from sam6d_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from sam6d_tpu.train.trainer import PEMTrainer, make_dummy_batch, aug_pose_noise
from sam6d_tpu.train.lr_schedule import warmup_cosine
from tests.test_pem_model import tiny_cfg


def tiny_full_cfg():
    pem = tiny_cfg()
    pem = dataclasses.replace(
        pem, geo_embedding=dataclasses.replace(pem.geo_embedding, hidden_dim=32),
        n_sample_template_point=48)
    return Config(pem=pem, train=TrainConfig(batch_size=8, max_iters=100,
                                             warmup_iters=10))


def test_warmup_cosine_schedule():
    s = warmup_cosine(1e-4, 1000, warmup_iters=100, warmup_factor=1e-3)
    assert abs(float(s(0)) - 1e-7) < 1e-9
    assert abs(float(s(100)) - 1e-4) < 1e-8
    assert float(s(999)) < 1e-6  # near-zero at the end


def test_aug_pose_noise_properties(rng):
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (16, 3, 3))
    t = np.tile(np.array([[0, 0, 0.5]], np.float32), (16, 1))
    Rn, tn = aug_pose_noise(jax.random.PRNGKey(0), jnp.asarray(R), jnp.asarray(t))
    Rn = np.asarray(Rn)
    RtR = np.einsum("bij,bik->bjk", Rn, Rn)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    assert (np.asarray(tn)[:, 2] > 0).all()
    assert np.abs(np.asarray(tn) - t).max() <= 0.8 + 1e-6


@pytest.mark.slow
def test_train_step_overfits_fixed_batch():
    """Repeatedly stepping on ONE fixed batch (fixed pose-noise key) must
    drive the correspondence loss down — a real learning signal, not just
    'did not explode'."""
    cfg = tiny_full_cfg()
    mesh = make_mesh(8, dp=8)
    trainer = PEMTrainer(cfg, mesh)
    batch = make_dummy_batch(cfg, 8)
    state = trainer.init_state(batch)
    batch = shard_batch(mesh, batch)

    key = jax.random.PRNGKey(0)  # fixed: same aug noise every step
    losses = []
    for _ in range(30):
        state, metrics = trainer.step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 30
    head = float(np.mean(losses[:3]))
    tail = float(np.mean(losses[-3:]))
    assert tail < 0.7 * head, f"loss did not decrease: {head:.4f} -> {tail:.4f}"


@pytest.mark.slow
def test_checkpoint_save_restore_roundtrip(tmp_path):
    import jax.numpy as jnp
    from sam6d_tpu.core.checkpoint import (
        save_train_state, load_train_state, latest_checkpoint)
    cfg = tiny_full_cfg()
    mesh = make_mesh(8, dp=8)
    trainer = PEMTrainer(cfg, mesh)
    batch = make_dummy_batch(cfg, 8)
    state = trainer.init_state(batch)
    path = save_train_state(str(tmp_path), 3, state)
    assert latest_checkpoint(str(tmp_path)) == path
    import jax
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), state,
    )
    restored = load_train_state(path, type(state)(*abstract))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))
    assert int(restored.step) == 0
