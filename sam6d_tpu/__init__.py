"""SAM-6D TPU: a TPU-native zero-shot 6D object pose estimation framework.

A ground-up JAX/XLA/Pallas re-design of the SAM-6D pipeline (CVPR 2024):
segment-anything instance proposals + DINOv2 template matching (ISM) and a
coarse-to-fine point-matching pose network (PEM), engineered for TPU:

- all hot paths are single jitted programs over fixed-capacity padded tensors
- attention / FPS / ball-query as Pallas kernels or MXU-friendly XLA formulations
- scaling via `jax.sharding.Mesh` + collectives (no file-based rank merges)

Reference behavior parity: JiehongLin/SAM-6D (see SURVEY.md for the map).
"""

__version__ = "0.1.0"
