"""Pallas TPU kernel: fused nearest-SMPL-vertex search.

Top-1 KNN of query points against the posed SMPL vertices without
materializing the (N, V) distance matrix in HBM: each point tile loops
over vertex tiles kept in VMEM, maintaining a running (min-dist, argmin)
pair. Replaces pytorch3d's CUDA KNN (`ray_tracing.py:386,407`) in the
sphere-tracing and canonicalization hot loops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_kernel(v_tiles: int, v_tile: int, x_ref, verts_ref, vsq_ref,
                out_ref):
    x = x_ref[:]                                    # (T, 3)
    best = jnp.full((x.shape[0],), 1e30, jnp.float32)
    best_idx = jnp.zeros((x.shape[0],), jnp.int32)
    for vt in range(v_tiles):
        v = verts_ref[pl.ds(vt * v_tile, v_tile), :]          # (Vt, 3)
        vsq = vsq_ref[pl.ds(vt * v_tile, v_tile)]             # (Vt,)
        d = vsq[None, :] - 2.0 * jnp.dot(
            x, v.T, preferred_element_type=jnp.float32)       # (T, Vt)
        tile_min = jnp.min(d, axis=-1)
        tile_arg = jnp.argmin(d, axis=-1).astype(jnp.int32) + vt * v_tile
        better = tile_min < best
        best = jnp.where(better, tile_min, best)
        best_idx = jnp.where(better, tile_arg, best_idx)
    out_ref[:] = best_idx


def _on_tpu() -> bool:
    return jax.devices()[0].platform == 'tpu'


@partial(jax.jit, static_argnames=('tile', 'v_tile', 'interpret'))
def nn_idx_pallas(points: jax.Array, verts: jax.Array, tile: int = 2048,
                  v_tile: int = 1024, interpret: bool | None = None):
    """(N, 3) x (V, 3) -> (N,) int32 nearest-vertex indices.
    N must be a multiple of `tile`; V is padded to a multiple of v_tile."""
    if interpret is None:
        interpret = not _on_tpu()
    n = points.shape[0]
    assert n % tile == 0
    v = verts.shape[0]
    pad = (-v) % v_tile
    if pad:
        # pad with far-away sentinel verts so they never win
        verts = jnp.concatenate(
            [verts, jnp.full((pad, 3), 1e6, verts.dtype)], axis=0)
    v_tiles = verts.shape[0] // v_tile
    vsq = jnp.sum(verts * verts, axis=-1)

    return pl.pallas_call(
        partial(_knn_kernel, v_tiles, v_tile),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(verts.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vsq.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        interpret=interpret,
    )(points, verts, vsq)


# ---------------- transposed (k, T) variant (round 4) ----------------
#
# The round-1 kernel keeps points as (T, 3) rows: every distance tile is
# (T, Vt) and min/argmin reduce along the LANE axis — the same
# 1-of-128-lanes pathology the corr kernel hit (PERF.md finding 4).
# Here points run along the lanes: d = vsq - 2 (v @ x) is (Vt, T) and
# the running min/argmin reduce over SUBLANES (axis 0), full-width.

def _knn_kernel_t(v_tiles: int, v_tile: int, x_ref, verts_ref, vsq_ref,
                  out_ref):
    x = x_ref[:]                                    # (3, T)
    T = x.shape[1]
    best = jnp.full((1, T), 1e30, jnp.float32)
    best_idx = jnp.zeros((1, T), jnp.int32)
    for vt in range(v_tiles):
        v = verts_ref[pl.ds(vt * v_tile, v_tile), :]          # (Vt, 3)
        vsq = vsq_ref[pl.ds(vt * v_tile, v_tile), :]          # (Vt, 1)
        d = vsq - 2.0 * jnp.dot(
            v, x, preferred_element_type=jnp.float32)         # (Vt, T)
        tile_min = jnp.min(d, axis=0, keepdims=True)          # (1, T)
        tile_arg = jnp.argmin(d, axis=0).astype(jnp.int32)[None] \
            + vt * v_tile
        better = tile_min < best
        best = jnp.where(better, tile_min, best)
        best_idx = jnp.where(better, tile_arg, best_idx)
    out_ref[:] = best_idx


@partial(jax.jit, static_argnames=('tile', 'v_tile', 'interpret'))
def nn_idx_pallas_t(points: jax.Array, verts: jax.Array, tile: int = 2048,
                    v_tile: int = 1024, interpret: bool | None = None):
    """(N, 3) x (V, 3) -> (N,) int32 nearest-vertex indices, (k, T)
    layout. N must be a multiple of `tile`; V pads to v_tile."""
    if interpret is None:
        interpret = not _on_tpu()
    n = points.shape[0]
    assert n % tile == 0
    pad = (-verts.shape[0]) % v_tile
    if pad:
        verts = jnp.concatenate(
            [verts, jnp.full((pad, 3), 1e6, verts.dtype)], axis=0)
    v_tiles = verts.shape[0] // v_tile
    vsq = jnp.sum(verts * verts, axis=-1, keepdims=True)      # (V, 1)

    out = pl.pallas_call(
        partial(_knn_kernel_t, v_tiles, v_tile),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(verts.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vsq.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        interpret=interpret,
    )(points.T, verts, vsq)
    return out[0]
