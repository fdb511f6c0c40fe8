"""A/B-ONLY fused-kernel dispatch for the point-wise SDF / KNN functions.

These first-cut kernels (standalone SIREN point-eval, tiled KNN) measured
~7% SLOWER end-to-end than the XLA paths they replace (PERF.md round-1
finding #4) and were superseded by the fully-fused march/corr/iso/shade
kernels (`ops/pallas/{march,corr_kernel_t,iso,shade*}_kernel.py`), which
ARE the shipped defaults via `RayTracerConfig.use_pallas_*` /
`ModelConfig.use_pallas_shade*`. This module's kernels are therefore
OPT-IN (`ARAH_ENABLE_PALLAS=1`) and exist only for explicit A/B runs;
nothing dispatches here in the shipped default configuration. The kernels
carry a `custom_jvp` that falls back to the plain XLA implementation, so
the places that take input derivatives (solver init Jacobians) still work
under A/B.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from arah_tpu.nn.siren import GeneratedMLP, siren_apply


def pallas_enabled() -> bool:
    """Opt-in (ARAH_ENABLE_PALLAS=1): the XLA path is the benched default
    for THIS module's standalone kernels (measured ~7% slower end-to-end,
    PERF.md); only explicit A/B runs enable them. The winning fused
    kernels elsewhere (march/corr/iso/shade) have their own config gates
    and do not consult this switch."""
    if os.environ.get('ARAH_ENABLE_PALLAS') != '1':
        return False
    return jax.devices()[0].platform == 'tpu'


def make_fused_sdf_fn(gen: GeneratedMLP, tile: int = 1024):
    """Normalized points (N, 3) -> (N,) SDF via the fused Pallas kernel,
    differentiable via an XLA-backed jvp."""
    from arah_tpu.ops.pallas.siren_kernel import siren_sdf_pallas

    @jax.custom_jvp
    def sdf(x):
        n = x.shape[0]
        pad = (-n) % tile
        xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
        out = siren_sdf_pallas(gen, xp, tile=tile)
        return out[:n, 0]

    @sdf.defjvp
    def sdf_jvp(primals, tangents):
        (x,), (dx,) = primals, tangents
        f = lambda p: siren_apply(gen, p)[..., 0]
        return jax.jvp(f, (x,), (dx,))

    return sdf


def fused_nn_idx(points, verts, tile: int = 2048):
    """Pallas KNN with padding; falls back to XLA off-TPU."""
    from arah_tpu.ops.knn import nn_idx
    if not pallas_enabled():
        return nn_idx(points, verts)
    from arah_tpu.ops.pallas.knn_kernel import nn_idx_pallas
    n = points.shape[0]
    pad = (-n) % tile
    p = jnp.pad(points, ((0, pad), (0, 0))) if pad else points
    idx = nn_idx_pallas(p, verts, tile=tile)
    return idx[:n]
