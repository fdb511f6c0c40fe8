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
    out = [x] if include_input else []
    for f in freqs:
        out.append(jnp.sin(x * f))
        out.append(jnp.cos(x * f))
    return jnp.concatenate(out, axis=-1)
