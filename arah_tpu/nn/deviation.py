"""Single-scalar deviation (beta) network for VolSDF density.

Reference `metaavatar_render/models/decoder.py:127-133`
(`SingleVarianceNetwork`): a learnable scalar whose forward returns
|beta| broadcast over the input (keeps it positive).
"""
from __future__ import annotations

import jax.numpy as jnp


def init_deviation(init_val: float = 1e-3):
    return {'variance': jnp.asarray(init_val, jnp.float32)}


def deviation_apply(params, x):
    return jnp.ones_like(x) * jnp.abs(params['variance'])


def deviation_value(params):
    return jnp.abs(params['variance'])
