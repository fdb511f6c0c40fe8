"""IDR-style geometric-init SDF MLP (the reference's `geo_mlp` decoder
variant).

Functional port of `im2mesh/metaavatar/models/decoder.py:10-130`
(`SDFNetwork`): softplus(beta=100) MLP with NeRF PE on points, skip
re-injection of the embedded input scaled by 1/sqrt(2), 144-d hierarchical
pose conditioning concatenated at `cond_in` layers, geometric (SAL)
initialization, weight norm, and the 1/scale rescale of the sdf channel.

Not used by any shipped ARAH config (all use the `hyper_bvp`
hypernetwork), but part of the reference's decoder registry.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from arah_tpu.core.embedder import embedding_dim, positional_encoding
from arah_tpu.nn.layers import (geometric_init_mlp, softplus100, wn_linear,
                                linear)
from arah_tpu.nn.pose_encoder import init_pose_encoder, pose_encoder_apply


class SdfMlpConfig(NamedTuple):
    d_in: int = 3
    d_out: int = 257            # 1 sdf + 256 feature
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: tuple = (4,)
    cond_in: tuple = (0,)
    cond_dim: int = 144
    multires: int = 6
    bias: float = 0.5
    scale: float = 1.0
    inside_outside: bool = False
    weight_norm: bool = True


def _dims(cfg: SdfMlpConfig):
    d0 = cfg.d_in if cfg.multires == 0 \
        else embedding_dim(cfg.multires, cfg.d_in)
    return [d0] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]


def init_sdf_mlp(key, cfg: SdfMlpConfig):
    k1, k2 = jax.random.split(key)
    layers = geometric_init_mlp(
        k1, _dims(cfg), skip_in=cfg.skip_in, cond_in=cfg.cond_in,
        cond_dim=cfg.cond_dim, bias=cfg.bias,
        inside_outside=cfg.inside_outside, multires=cfg.multires,
        weight_norm=cfg.weight_norm)
    return {'layers': layers, 'pose_encoder': init_pose_encoder(k2)}


def sdf_mlp_apply(params, cfg: SdfMlpConfig, coords: jax.Array,
                  rots: jax.Array, Jtrs: jax.Array) -> jax.Array:
    """coords (N, 3), rots (1, 24, 9), Jtrs (1, 24, 3) -> (N, d_out)
    with the sdf channel rescaled by 1/scale (`decoder.py:80-110`)."""
    lin = wn_linear if cfg.weight_norm else linear
    cond = pose_encoder_apply(params['pose_encoder'], rots, Jtrs,
                              rel_joints=False)[0]

    x0 = positional_encoding(coords * cfg.scale, cfg.multires)
    x = x0
    n = cfg.n_layers + 1
    for l in range(n):
        if l in cfg.cond_in:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(cond, x.shape[:-1] + cond.shape[-1:])],
                axis=-1)
        if l in cfg.skip_in:
            x = jnp.concatenate([x, x0], axis=-1) / math.sqrt(2.0)
        x = lin(params['layers'][l], x)
        if l < n - 1:
            x = softplus100(x)
    return jnp.concatenate([x[..., :1] / cfg.scale, x[..., 1:]], axis=-1)
