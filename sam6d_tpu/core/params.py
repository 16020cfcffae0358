"""Parameter pytree utilities."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_float_params(tree, dtype):
    """Cast every float leaf to `dtype` (e.g. bf16 for inference serving).

    Frozen checkpoints convert to fp32; for inference the compute dtype is
    bf16, and keeping fp32 masters would re-cast ~GBs of weights inside every
    jitted forward (and doubles weight HBM reads). Training keeps fp32.
    """
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)
