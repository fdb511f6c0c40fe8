"""NeRF positional encoding (pure function).

Matches the reference embedder used by the color network
(`im2mesh/metaavatar_render/models/embedder.py:6-51`): output layout is
[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] with all input
dims grouped per frequency.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def embedding_dim(multires: int, input_dims: int = 3,
                  include_input: bool = True) -> int:
    return input_dims * (include_input + 2 * multires)


def positional_encoding(x: jax.Array, multires: int,
                        include_input: bool = True) -> jax.Array:
    """(..., D) -> (..., D * (include_input + 2*multires))."""
    if multires <= 0:
        return x
    freqs = 2.0 ** np.arange(multires, dtype=np.float32)
    # one sin + one cos over all frequencies at once: (..., D)-shaped
    # elementwise ops use D of 128 TPU lanes, so 2*multires separate
    # (N, 3) transcendental fusions waste ~40x lane width each; batching
    # them into (..., multires*D) cuts the op count 2*multires -> 2
    D = x.shape[-1]
    xf = (x[..., None, :] * freqs[:, None]).reshape(x.shape[:-1] + (-1,))
    s = jnp.sin(xf).reshape(x.shape[:-1] + (multires, 1, D))
    c = jnp.cos(xf).reshape(x.shape[:-1] + (multires, 1, D))
    # interleave to the reference layout [sin(f x), cos(f x)] per freq
    sc = jnp.concatenate([s, c], axis=-2).reshape(
        x.shape[:-1] + (2 * multires * D,))
    if include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc
