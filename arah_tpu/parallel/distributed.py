"""Multi-host initialization and cross-host eval gathering.

The reference's multi-GPU story is single-host DDP (`train.py:124-133`);
arah_tpu scales across hosts with `jax.distributed` + one global mesh:
ICI within a slice, DCN across hosts, both behind the same XLA
collectives. Rank-0-trimmed metric gathering mirrors the reference's
`all_gather` eval path (`lightning_model.py:250-283`).
"""
from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None
               = None, process_id: int | None = None):
    """Initialize jax.distributed (no-op on single process).

    On TPU pods with standard env vars, jax.distributed.initialize()
    auto-detects everything; args are for manual CPU/GPU testing.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id)
    elif coordinator is None and _auto_multiprocess():
        jax.distributed.initialize()


def _auto_multiprocess() -> bool:
    import os
    return any(k in os.environ for k in
               ('COORDINATOR_ADDRESS', 'MEGASCALE_COORDINATOR_ADDRESS'))


def global_mesh(axis: str = 'data'):
    """One 1-D mesh over every chip of every host."""
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis,))


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def replicate_over_mesh(tree, mesh):
    """Host-local pytree -> fully-replicated global arrays over `mesh`.

    Works in both single- and multi-process runtimes (every process must
    hold the identical value — true for params/opt state built from the
    same seed or restored from the same checkpoint)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(rep, x)

    return jax.tree.map(put, tree)


def make_global_batch(mesh, batch, axis: str = 'data',
                      per_block_frame: bool = False):
    """Per-process local numpy TrainBatch -> globally-sharded device batch.

    Per-block fields are sharded over `axis` (each process contributes the
    blocks for its own devices — the multi-host analog of DDP's per-rank
    batch, `/root/reference/train.py:124-133`); frame-level state and the
    latent index are replicated (identical on every process because the
    frame sampler iterates the same frame order with a shared seed) —
    unless per_block_frame, where frame leaves and latent_idx shard with
    the blocks (one frame per block, see TrainBatch docstring)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from arah_tpu.parallel.train_step import N_PER_BLOCK_FIELDS
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    fshard = shard if per_block_frame else rep

    def put(x, sharding):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    per_block = {f: put(getattr(batch, f), shard)
                 for f in batch._fields[:N_PER_BLOCK_FIELDS]}
    frame = jax.tree.map(lambda x: put(x, fshard), batch.frame)
    return batch._replace(**per_block, frame=frame,
                          latent_idx=put(batch.latent_idx, fshard))


def gather_metrics(local_metrics: dict, mesh, axis: str = 'data'):
    """Mean-reduce scalar metrics across the mesh (eval aggregation)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def reduce_fn(tree):
        return jax.tree.map(lambda x: jnp.mean(x), tree)

    return jax.jit(reduce_fn,
                   out_shardings=NamedSharding(mesh, P()))(local_metrics)
