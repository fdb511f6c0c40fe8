"""Functional linear-layer primitives with torch-compatible initializers.

All modules in arah_tpu are pure functions over explicit param pytrees
(dicts), which makes hypernetwork-generated weights first-class data and
keeps everything jit/vmap/shard_map-friendly. Initializers mirror the
torch defaults used by the reference so that training dynamics match.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_linear(key, in_features: int, out_features: int,
                w_init: str = 'torch_default'):
    """Returns {'w': (out, in), 'b': (out,)}.

    w_init options:
      torch_default — U(-1/sqrt(in), 1/sqrt(in)) (torch nn.Linear default)
      kaiming_relu  — N(0, sqrt(2/in)) (torch kaiming_normal_, fan_in, relu)
      kaiming_leaky02 — kaiming_normal_ with a=0.2
      sine          — U(-sqrt(6/in)/30, sqrt(6/in)/30)
      sine_first    — U(-1/in, 1/in)
      zeros         — zeros (used for last hyper layers)
    """
    kw, kb = jax.random.split(key)
    if w_init == 'torch_default':
        w = _uniform(kw, (out_features, in_features),
                     1.0 / math.sqrt(in_features))
    elif w_init == 'kaiming_relu':
        w = jax.random.normal(kw, (out_features, in_features)) \
            * math.sqrt(2.0 / in_features)
    elif w_init == 'kaiming_leaky02':
        gain = math.sqrt(2.0 / (1 + 0.2 ** 2))
        w = jax.random.normal(kw, (out_features, in_features)) \
            * gain / math.sqrt(in_features)
    elif w_init == 'sine':
        w = _uniform(kw, (out_features, in_features),
                     math.sqrt(6.0 / in_features) / 30.0)
    elif w_init == 'sine_first':
        w = _uniform(kw, (out_features, in_features), 1.0 / in_features)
    elif w_init == 'zeros':
        w = jnp.zeros((out_features, in_features))
    else:
        raise ValueError(f'unknown init {w_init}')
    b = _uniform(kb, (out_features,), 1.0 / math.sqrt(in_features))
    if w_init == 'zeros':
        b = jnp.zeros((out_features,))
    return {'w': w, 'b': b}


def linear(params, x):
    """x @ w.T + b for (..., in) inputs (true-f32, see mm_t)."""
    return mm_t(x, params['w']) + params['b']


# ---------------------------------------------------------------------------
# Weight-normalized linear (torch nn.utils.weight_norm, dim=0):
# W = g * v / ||v||_row  with g (out, 1), v (out, in).
# Used by the skinning Deformer and the color RenderingNetwork.
# ---------------------------------------------------------------------------

def init_wn_linear(key, in_features: int, out_features: int,
                   w_init: str = 'torch_default', *, w=None, b=None):
    """Weight-normalized linear; optionally wraps given (w, b)."""
    if w is None:
        p = init_linear(key, in_features, out_features, w_init)
        w, b = p['w'], p['b']
    g = jnp.linalg.norm(w, axis=1, keepdims=True)
    return {'v': w, 'g': g, 'b': b}


def wn_linear(params, x, bf16: bool = False):
    v = params['v']
    w = params['g'] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
    return mm_t(x, w, bf16) + params['b']


def set_wn_from_dense(w, b):
    """Build weight-norm params equivalent to a dense (w, b) pair
    (checkpoint conversion helper)."""
    g = jnp.linalg.norm(w, axis=1, keepdims=True)
    return {'v': w, 'g': g, 'b': b}


def geometric_init_mlp(key, dims: Sequence[int], *, skip_in=(), cond_in=(),
                       cond_dim: int = 0, bias: float = 1.0,
                       inside_outside: bool = False,
                       multires: int = 0, weight_norm: bool = True):
    """IDR/SAL geometric initialization for softplus SDF-style MLPs.

    Mirrors reference `metaavatar/models/decoder.py:40-74` (used by both
    `SDFNetwork` and `Deformer`). dims includes input and output sizes.
    Returns a list of layer param dicts (weight-normed if weight_norm).
    """
    n_layers = len(dims) - 1
    keys = jax.random.split(key, n_layers)
    layers = []
    for l in range(n_layers):
        in_dim = dims[l] + (cond_dim if l in cond_in else 0)
        if l + 1 in skip_in:
            out_dim = dims[l + 1] - dims[0]
        else:
            out_dim = dims[l + 1]
        kw, kb = jax.random.split(keys[l])
        if l == n_layers - 1:
            mean = math.sqrt(math.pi) / math.sqrt(in_dim)
            if inside_outside:
                mean, b_val = -mean, bias
            else:
                b_val = -bias
            w = jax.random.normal(kw, (out_dim, in_dim)) * 1e-4 + mean
            b = jnp.full((out_dim,), b_val)
        elif multires > 0 and l == 0:
            w = jnp.zeros((out_dim, in_dim))
            w = w.at[:, :3].set(jax.random.normal(kw, (out_dim, 3))
                                * math.sqrt(2) / math.sqrt(out_dim))
            b = jnp.zeros((out_dim,))
        elif multires > 0 and l in skip_in:
            w = jax.random.normal(kw, (out_dim, in_dim)) \
                * math.sqrt(2) / math.sqrt(out_dim)
            w = w.at[:, -(dims[0] - 3):].set(0.0)
            b = jnp.zeros((out_dim,))
        else:
            w = jax.random.normal(kw, (out_dim, in_dim)) \
                * math.sqrt(2) / math.sqrt(out_dim)
            b = jnp.zeros((out_dim,))
        if weight_norm:
            layers.append(set_wn_from_dense(w, b))
        else:
            layers.append({'w': w, 'b': b})
    return layers


def softplus100(x):
    """Softplus with beta=100 (torch nn.Softplus(beta=100) semantics,
    including the linear region above threshold 20/beta)."""
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / 100.0)


def _f32_precision():
    """Precision of the strict-f32 matmul path (solvers, regularizers).

    HIGHEST (6 bf16 MXU passes = exact f32) is the benched default.
    ARAH_F32_PRECISION=high selects the 3-pass variant (~1e-6 relative
    operand error, still well under the solvers' 1e-5 threshold) for
    A/B measurement; see mm_t's docstring for the 1-pass failure mode.
    """
    import os
    if os.environ.get('ARAH_F32_PRECISION', '').lower() == 'high':
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.HIGHEST


def mm_t(x, w, bf16: bool = False):
    """x @ w.T with optional bf16 inputs / f32 accumulation.

    bf16=False is TRUE f32: on TPU, JAX's *default* matmul precision is a
    single bf16 MXU pass (~4e-3 relative operand error), which puts a
    ~1e-4 noise floor under every network eval — enough to stall the
    Broyden solvers above their 1e-5 convergence threshold (measured on
    v5e: iso convergence on march-converged rays 16% at default precision
    vs 95% at f32). `Precision.HIGHEST` forces the multi-pass f32-exact
    matmul, matching the reference's torch-f32 numerics
    (`im2mesh/utils/broyden.py:47` converges at 1e-5 in f32).

    bf16=True casts the operands to bf16 (keeping
    `preferred_element_type=jnp.float32` so the accumulator stays f32),
    trading ~3 decimal digits for the single-pass rate. Used by the
    shading stage only (`ModelConfig.bf16_shading`); solvers and
    regularizers stay f32.
    """
    if not bf16:
        return jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
            precision=_f32_precision())
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32)
