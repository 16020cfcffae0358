"""PEM trainer: data-parallel pjit training step.

Replaces the reference gorilla Solver (`Pose_Estimation_Model/utils/solver.py`
:15-191) + torch.nn.DataParallel (train.py:96-97): one jitted step —
aug-pose-noise init, forward with per-shard BatchNorm stats, correspondence
losses, Adam + WarmupCosine — sharded over the mesh's dp axis; XLA inserts
the gradient all-reduce. Checkpointing via orbax (`core/checkpoint.py`).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.config import Config
from ..models.pem import PEMNet
from ..ops.geometry import rotation_from_euler_zyx
from .losses import compute_correspondence_loss, total_loss
from .lr_schedule import warmup_cosine


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def aug_pose_noise(key, gt_R, gt_t, std_rots=(15.0, 10.0, 5.0, 1.25, 1.0),
                   max_rot=45.0, std_trans=0.2, max_trans=0.8):
    """Noisy init pose for fine matching (reference model_utils.py:140-184):
    per-batch random Euler noise (std drawn from std_rots), clamped; trans
    noise clamped; z kept positive."""
    B = gt_R.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    std = jax.random.choice(k1, jnp.asarray(std_rots))
    angles = jax.random.normal(k2, (B, 3)) * std
    angles = jnp.clip(angles, -max_rot, max_rot) * (np.pi / 180.0)
    rand_rot = rotation_from_euler_zyx(angles[:, 0], angles[:, 1], angles[:, 2])
    trans = jnp.clip(jax.random.normal(k3, (B, 3)) * std_trans,
                     -max_trans, max_trans)
    R = jnp.einsum("bij,bjk->bik", gt_R, rand_rot)
    t = gt_t + trans
    t = t.at[:, 2].set(jnp.maximum(t[:, 2], 1e-6))
    return R, t


class PEMTrainer:
    def __init__(self, cfg: Config, mesh, seed: int = 1):
        self.cfg = cfg
        self.mesh = mesh
        self.net = PEMNet(cfg.pem)
        t = cfg.train
        self.tx = optax.adam(
            warmup_cosine(t.lr, t.max_iters, t.warmup_iters, t.warmup_factor),
            b1=t.betas[0], b2=t.betas[1], eps=t.eps)
        self.seed = seed
        self._step = jax.jit(
            self._step_impl,
            in_shardings=(NamedSharding(mesh, P()),
                          NamedSharding(mesh, P("dp")),
                          NamedSharding(mesh, P())),
            out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
            donate_argnums=(0,))

    def init_state(self, sample_batch: Dict[str, jnp.ndarray],
                   pretrained_vit=None) -> TrainState:
        key = jax.random.PRNGKey(self.seed)
        one = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[:1]), sample_batch)
        variables = self.net.init(
            {"params": key}, one, jnp.eye(3)[None], jnp.zeros((1, 3)),
            method="train_forward")
        params = variables["params"]
        if pretrained_vit is not None:
            params = dict(params)
            fx = dict(params["feature_extraction"])
            fx["vit"] = jax.tree.map(jnp.asarray, pretrained_vit)
            params["feature_extraction"] = fx
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))

    def _step_impl(self, state: TrainState, batch, key):
        cfg = self.cfg

        def loss_fn(params):
            tem_pts = jnp.concatenate([batch["tem1_pts"], batch["tem2_pts"]], axis=1)
            radius = jnp.max(jnp.linalg.norm(tem_pts, axis=2), axis=1)
            gt_R = batch["rotation_label"]
            gt_t = batch["translation_label"] / (radius[:, None] + 1e-6)
            init_R, init_t = aug_pose_noise(key, gt_R, gt_t)

            (coarse, fine, aux), mutated = self.net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, init_R, init_t, method="train_forward",
                mutable=["batch_stats"])
            end_points = {}
            end_points.update(compute_correspondence_loss(
                coarse, aux["sparse_pm"], aux["sparse_po"], gt_R, gt_t,
                cfg.pem.coarse.loss_dis_thres, "coarse"))
            end_points.update(compute_correspondence_loss(
                fine, aux["dense_pm"], aux["dense_po"], gt_R, gt_t,
                cfg.pem.fine.loss_dis_thres, "fine"))
            loss, metrics = total_loss(end_points, cfg.train.loss_clamp)
            return loss, (metrics, mutated.get("batch_stats", {}))

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        return new_state, metrics

    def step(self, state: TrainState, batch, key):
        return self._step(state, batch, key)


def make_dummy_batch(cfg: Config, batch_size: int, rng=None):
    """Synthetic training batch with the full input contract (for smoke
    tests, compile checks and the multichip dryrun)."""
    rng = rng or np.random.RandomState(0)
    S = cfg.pem.img_size
    NF = cfg.pem.fine_npoint
    P_ = cfg.pem.n_sample_template_point
    B = batch_size
    model_pts = (rng.rand(B, P_, 3).astype(np.float32) - 0.5) * 0.2
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
    t = np.tile(np.array([[0, 0, 0.5]], np.float32), (B, 1))
    idx = rng.randint(0, P_, NF)
    obs = model_pts[:, idx] @ R.transpose(0, 2, 1) + t[:, None]
    return dict(
        pts=jnp.asarray(obs),
        rgb=jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)),
        rgb_choose=jnp.asarray(rng.randint(0, S * S, (B, NF))),
        rotation_label=jnp.asarray(R),
        translation_label=jnp.asarray(t),
        tem1_rgb=jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)),
        tem1_choose=jnp.asarray(rng.randint(0, S * S, (B, P_))),
        tem1_pts=jnp.asarray(model_pts),
        tem2_rgb=jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)),
        tem2_choose=jnp.asarray(rng.randint(0, S * S, (B, P_))),
        tem2_pts=jnp.asarray(model_pts),
    )
