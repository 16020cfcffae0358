"""WarmupCosineLR (reference gorilla scheduler, config/base.yaml:10-14):
linear warmup from warmup_factor*lr over warmup_iters, then cosine decay to
0 at max_iters."""
from __future__ import annotations

import optax


def warmup_cosine(lr: float, max_iters: int, warmup_iters: int = 1000,
                  warmup_factor: float = 1e-3):
    warm = optax.linear_schedule(
        init_value=lr * warmup_factor, end_value=lr,
        transition_steps=warmup_iters)
    cos = optax.cosine_decay_schedule(
        init_value=lr, decay_steps=max(max_iters - warmup_iters, 1))
    return optax.join_schedules([warm, cos], [warmup_iters])
