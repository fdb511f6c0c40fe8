"""SIREN SDF networks with externally-supplied (hypernetwork-generated)
weights.

TPU-first re-design of the reference SIREN stack
(`im2mesh/metaavatar/models/siren_modules.py:14-194`): generated weights are
plain pytree data (`GeneratedMLP`), and evaluation is a chain of dense
matmuls over point tiles — ideal MXU shapes when points are batched.

The generated SDF decoder (ZJU default config) is
  3 -> 256 -> [sine] x 6 hidden transitions -> 1
with `sin(30 x)` activations and optional per-layer FiLM modulation
(freq * lin(x) + phase) from a 128-d latent (`hyperlayers.py:391-415`).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from arah_tpu.nn.layers import init_linear, linear


class GeneratedMLP(NamedTuple):
    """Weights of a generated SIREN MLP. All leaves may carry leading batch
    dims (e.g. per-frame)."""
    weights: tuple      # tuple of (out, in) arrays, length L
    biases: tuple       # tuple of (out,) arrays, length L
    freqs: tuple        # tuple of (hidden,) FiLM frequencies, length L-1 (or ())
    phases: tuple       # tuple of (hidden,) FiLM phase shifts, length L-1 (or ())


def siren_apply(gen: GeneratedMLP, x: jax.Array,
                return_features: bool = False, bf16: bool = False):
    """Evaluate the generated SIREN on points x (..., in_dim).

    Returns sdf (..., out_dim); if return_features, also the penultimate
    activation (the 256-d feature the color network consumes,
    `implicit_differentiable_renderer.py:336-337`).

    bf16: matmuls in bfloat16 with f32 accumulation, and activations
    *stored* in bf16 between layers (shading-only fast path, see
    `layers.mm_t`). The pre-activation (matmul accum + bias + FiLM + sine)
    is computed in f32 and rounded once on store — the same rounding the
    bf16 matmul operands already see, but it halves the HBM traffic of the
    inter-layer tensors, which dominate the differentiable shading stage
    (the jacfwd tangent chain is (N, 3, hidden); profile: the train-step
    reverse-over-forward SIREN was ~60 ms of a 128 ms step at 131k samples
    on v5e, bandwidth-bound at ~670 GB/s).
    """
    from arah_tpu.nn.layers import mm_t
    h = x
    n_layers = len(gen.weights)
    use_film = len(gen.freqs) > 0
    for i in range(n_layers - 1):
        h = mm_t(h, gen.weights[i], bf16) + gen.biases[i]
        if use_film:
            h = gen.freqs[i] * h + gen.phases[i]
        h = jnp.sin(30.0 * h)
        if bf16:
            h = h.astype(jnp.bfloat16)
    features = h
    out = mm_t(h, gen.weights[-1], bf16) + gen.biases[-1]
    if return_features:
        return out, features
    return out


def siren_sdf(gen: GeneratedMLP, x: jax.Array) -> jax.Array:
    """Scalar SDF value (..., ) at normalized canonical points (..., 3)."""
    return siren_apply(gen, x)[..., 0]


def init_plain_siren(key, dims: Sequence[int]):
    """A trainable (non-generated) SIREN, reference `FCBlock` with
    nonlinearity='sine' (`siren_modules.py:40-97`); used by the
    `single_bvp` decoder variant."""
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i in range(len(dims) - 1):
        w_init = 'sine_first' if i == 0 else 'sine'
        layers.append(init_linear(keys[i], dims[i], dims[i + 1], w_init))
    return layers


def plain_siren_as_generated(layers) -> GeneratedMLP:
    return GeneratedMLP(
        weights=tuple(l['w'] for l in layers),
        biases=tuple(l['b'] for l in layers),
        freqs=(), phases=())
