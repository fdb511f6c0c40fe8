"""Pallas TPU kernel: fused generated-SIREN SDF evaluation.

Evaluates the hypernetwork-generated SIREN (the ZJU flagship shape:
3 -> 256 -> x5 -> 1 with FiLM + sin(30x)) over point tiles entirely in
VMEM: the ~1.8 MB of generated weights are kernel operands, each tile of
points runs the 7-matmul chain without HBM round-trips between layers.

This is hot-loop 1/2/3's inner primitive (SURVEY.md §3.1): sphere tracing,
iso-surface root-finding and shading all evaluate this network per point.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arah_tpu.nn.siren import GeneratedMLP


def _siren_kernel(n_hidden: int, use_film: bool, x_ref, *refs):
    """refs layout: [W0^T, b0, ..., WL^T, bL, (freqs, phases)], out last.

    Weights arrive pre-transposed to (in, out) so every contraction is a
    plain (tile, in) x (in, out) MXU matmul — an in-kernel `.T` lowers to
    a Mosaic multi_reduction that the TPU compiler rejects."""
    n_layers = n_hidden + 2
    w_refs = refs[:2 * n_layers:2]
    b_refs = refs[1:2 * n_layers:2]
    idx = 2 * n_layers
    if use_film:
        freqs_ref, phases_ref = refs[idx], refs[idx + 1]
        idx += 2
    out_ref = refs[idx]

    h = x_ref[:]
    for i in range(n_layers - 1):
        h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        h = h + b_refs[i][:]
        if use_film:
            h = freqs_ref[i] * h + phases_ref[i]
        h = jnp.sin(30.0 * h)
    out = jnp.dot(h, w_refs[-1][:], preferred_element_type=jnp.float32)
    out_ref[:] = out + b_refs[-1][:]


def _on_tpu() -> bool:
    return jax.devices()[0].platform == 'tpu'


@partial(jax.jit, static_argnames=('tile', 'interpret'))
def siren_sdf_pallas(gen: GeneratedMLP, x: jax.Array, tile: int = 1024,
                     interpret: bool | None = None):
    """(N, 3) points -> (N, out_dim) SIREN outputs via the fused kernel.
    N must be a multiple of `tile` (pad at the call site)."""
    if interpret is None:
        interpret = not _on_tpu()
    n, d_in = x.shape
    assert n % tile == 0, f'{n} % {tile}'
    n_layers = len(gen.weights)
    n_hidden = n_layers - 2
    use_film = len(gen.freqs) > 0
    out_dim = gen.weights[-1].shape[0]

    operands = [x]
    in_specs = [pl.BlockSpec((tile, d_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w, b in zip(gen.weights, gen.biases):
        wt = w.T    # (in, out) — transposed outside the kernel
        operands += [wt, b]
        in_specs += [
            pl.BlockSpec(wt.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM)]
    if use_film:
        freqs = jnp.stack(gen.freqs)     # (L-1, hidden)
        phases = jnp.stack(gen.phases)
        operands += [freqs, phases]
        in_specs += [
            pl.BlockSpec(freqs.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(phases.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)]

    return pl.pallas_call(
        partial(_siren_kernel, n_hidden, use_film),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
        interpret=interpret,
    )(*operands)
