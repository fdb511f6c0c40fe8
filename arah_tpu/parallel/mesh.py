"""Device mesh helpers.

The framework's parallelism model (re-designing the reference's
PyTorch-Lightning DDP, `train.py:124-133`): a 1-D `data` mesh axis shards
*ray blocks* (one or more camera views' ray batches) across chips; model
parameters and per-frame SMPL state are replicated; gradients are averaged
with `psum`/`pmean` over ICI/DCN via XLA collectives. Sharding rays instead
of whole views lifts the reference's one-view-per-GPU restriction.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = 'data') -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def block_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Sharding for arrays with a leading ray-block dimension."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
