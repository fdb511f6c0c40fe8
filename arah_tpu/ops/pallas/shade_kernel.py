"""Pallas TPU kernel: fused generated-SIREN shading evaluation.

One VMEM-resident pass computes everything the eval shading stage needs
from the SDF network (`render/renderer.py:shade_samples`, mirroring
`implicit_differentiable_renderer.py:261-396`):

  * the SDF value,
  * the penultimate 256-d feature vector (color-net input),
  * the spatial normal d(sdf)/dx via an in-kernel reverse pass.

The XLA path (`jax.vmap(jax.grad(...))`) materializes every hidden
activation in HBM between the forward and backward matmuls — at the
16384-ray eval chunk that is 64 samples x 16384 rays x 256 floats ~= 1 GB
per layer of round-trip traffic. Here the forward activations (only the
`30*freq*cos(30 z)` factors are needed) stay in VMEM for the tile and the
backward is L-1 extra MXU matmuls seeded from the SDF output row.

Values are exact f32 (or bf16-operand/f32-accumulate when the model runs
`bf16_shading`) — the same dot products as the XLA path, reassociated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arah_tpu.nn.siren import GeneratedMLP


def _dot(a, b, bf16: bool):
    # single dtype contract for BOTH shade kernels (shade_grad_kernel
    # imports these): cast-up keeps bf16-stored residents re-entering the
    # MXU as f32 when bf16=False; accumulation is always f32.
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    else:
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_nt(a, b, bf16: bool):
    """Contract over the tile axis: (tile, m) x (tile, n) -> (m, n)."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    else:
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _shade_kernel(n_layers: int, use_film: bool, bf16: bool,
                  resid_bf16: bool, x_ref, *refs):
    """refs layout: [W0^T..WL^T (in,out)], [b0..bL], [W0..WL (out,in)],
    (freqs, phases if film); outs: sdf_out, feat_out, grad_out.

    Forward weights arrive pre-transposed (in, out) so each contraction is
    a plain (tile, in) x (in, out) matmul; the backward pass reuses the
    ORIGINAL (out, in) layout — dot(g, W) needs no in-kernel transpose
    (Mosaic rejects `.T` on refs).
    """
    w_t = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    w_orig = refs[2 * n_layers:3 * n_layers]
    idx = 3 * n_layers
    if use_film:
        freqs_ref, phases_ref = refs[idx], refs[idx + 1]
        idx += 2
    out_ref, feat_ref, grad_ref = refs[idx:idx + 3]

    tile = x_ref.shape[0]
    # resid_bf16: store the resident sine-derivative factors bf16 —
    # halves scoped VMEM so bigger tiles fit; the forward chain and the
    # backward products stay f32 (bf16 * f32 promotes to f32).
    st = (lambda v: v.astype(jnp.bfloat16)) if resid_bf16 else (lambda v: v)

    # ---- forward, keeping the sine-derivative factors resident
    h = x_ref[:]
    dfs = []                                # (tile, hidden) per sine layer
    for i in range(n_layers - 1):
        z = _dot(h, w_t[i][:], bf16) + b_refs[i][:]
        if use_film:
            f = freqs_ref[i]
            z = f * z + phases_ref[i]
            dfs.append(st(30.0 * f * jnp.cos(30.0 * z)))
        else:
            dfs.append(st(30.0 * jnp.cos(30.0 * z)))
        h = jnp.sin(30.0 * z)
    feat_ref[:] = h
    out = _dot(h, w_t[-1][:], bf16) + b_refs[-1][:]
    out_ref[:] = out

    # ---- reverse pass for d(out[:, 0])/dx: seed with the SDF row of the
    # last weight matrix, then g <- (g * df_i) @ W_i down to the input.
    g = jnp.broadcast_to(w_orig[-1][0:1, :], (tile, w_orig[-1].shape[1]))
    for i in range(n_layers - 2, -1, -1):
        g = _dot(g * dfs[i], w_orig[i][:], bf16)
    grad_ref[:] = g


def _on_tpu() -> bool:
    return jax.devices()[0].platform == 'tpu'


@partial(jax.jit,
         static_argnames=('tile', 'bf16', 'resid_bf16', 'interpret'))
def _shade_pallas(gen: GeneratedMLP, x: jax.Array, tile: int,
                  bf16: bool, resid_bf16: bool, interpret: bool):
    n, d_in = x.shape
    assert n % tile == 0, (n, tile)
    n_layers = len(gen.weights)
    use_film = len(gen.freqs) > 0
    out_dim = gen.weights[-1].shape[0]
    hidden = gen.weights[-1].shape[1]

    rep = lambda s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                 memory_space=pltpu.VMEM)
    operands = [x]
    in_specs = [pl.BlockSpec((tile, d_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in gen.weights:
        wt = w.T
        operands.append(wt)
        in_specs.append(rep(wt.shape))
    for b in gen.biases:
        operands.append(b)
        in_specs.append(rep(b.shape))
    for w in gen.weights:
        operands.append(w)
        in_specs.append(rep(w.shape))
    if use_film:
        freqs = jnp.stack(gen.freqs)
        phases = jnp.stack(gen.phases)
        operands += [freqs, phases]
        in_specs += [rep(freqs.shape), rep(phases.shape)]

    row = lambda d: pl.BlockSpec((tile, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_shade_kernel, n_layers, use_film, bf16, resid_bf16),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=(row(out_dim), row(hidden), row(d_in)),
        out_shape=(
            jax.ShapeDtypeStruct((n, out_dim), jnp.float32),
            jax.ShapeDtypeStruct((n, hidden), jnp.float32),
            jax.ShapeDtypeStruct((n, d_in), jnp.float32),
        ),
        interpret=interpret,
    )(*operands)


def siren_shade_pallas(gen: GeneratedMLP, x: jax.Array, tile: int = 1024,
                       bf16: bool = False, resid_bf16: bool = False,
                       interpret: bool | None = None):
    """(N, 3) points -> (sdf (N, out_dim), features (N, hidden),
    d(sdf)/dx (N, 3)) in one fused kernel. Pads N to a tile multiple."""
    if interpret is None:
        interpret = not _on_tpu()
    n = x.shape[0]
    pad = (-n) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    out, feat, grad = _shade_pallas(gen, xp, tile, bf16, resid_bf16,
                                    interpret)
    if bf16:
        # match the XLA eval path's dtype contract: under bf16_shading,
        # siren_apply stores inter-layer activations (incl. the returned
        # features) in bf16
        feat = feat.astype(jnp.bfloat16)
    return out[:n], feat[:n], grad[:n]
