"""Device mesh construction for SPMD execution.

The reference has no multi-device execution anywhere (SURVEY.md §2.9); the
TPU-native design is mesh-ready but single-chip by default: the batch axis
(corpus samples, TTA variants, rerank candidates) shards over "data", and
the model's wide matmuls optionally shard over "model" (tensor parallelism
over ICI). DCN plays no role at inference (§5.8).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh over the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for inputs."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
