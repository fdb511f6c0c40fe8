"""Nearest-SMPL-vertex queries on device.

Replaces the reference's pytorch3d CUDA KNN (`ray_tracing.py:386,407`) with
an on-device brute-force top-1 search: 6890 SMPL vertices fit comfortably in
VMEM, and the distance computation is a (N, 3) x (3, V) matmul that maps
straight onto the MXU. Points are processed in fixed-size chunks so the
N x V distance matrix never exceeds a few tens of MB.

A fused Pallas kernel (distance tile + running argmin, no materialized
matrix) lives in ops/pallas/knn_kernel.py and is used when enabled.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nn_idx(points: jax.Array, verts: jax.Array,
           chunk: int = 8192) -> jax.Array:
    """(N, 3) query points, (V, 3) reference verts -> (N,) int32 indices of
    the nearest vert (squared-Euclidean)."""
    n = points.shape[0]
    v_sq = jnp.sum(verts * verts, axis=-1)            # (V,)

    def one_chunk(p):
        # |p - v|^2 = |p|^2 - 2 p.v + |v|^2 ; |p|^2 constant per row.
        d = v_sq[None, :] - 2.0 * (p @ verts.T)
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    # Measured on v5e INSIDE the flagship train step (131k x 6946):
    # chunked lax.map 2.7 ms vs unchunked 4.9 ms — XLA lowers the fused
    # K=3 matmul + variadic (min, argmin) reduce as a serial loop fusion
    # either way (the skinny contraction never reaches the MXU), and the
    # chunked form schedules better. Keep the chunked path everywhere.
    if n <= chunk:
        return one_chunk(points)
    pad = (-n) % chunk
    p = jnp.pad(points, ((0, pad), (0, 0)))
    p = p.reshape(-1, chunk, 3)
    idx = jax.lax.map(one_chunk, p).reshape(-1)
    return idx[:n]


def nn_gather(points: jax.Array, verts: jax.Array, values: jax.Array,
              chunk: int = 8192) -> jax.Array:
    """Gather per-vertex `values` (V, C) at the nearest vertex of each
    query point: returns (N, C)."""
    idx = nn_idx(points, verts, chunk=chunk)
    return values[idx]
