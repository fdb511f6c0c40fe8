"""Forward-LBS skinning network (SNARF-style Deformer).

Functional re-design of reference `im2mesh/metaavatar/models/decoder.py:133-233`
(`Deformer`) + `metaavatar_render/models/skinning_model.py`: a weight-normed
softplus(beta=100) MLP mapping normalized canonical points (3,) to 25 logits
(24 bones + hierarchical-softmax spine gate). Default ZJU config:
d_hidden=128, n_layers=4, no skips/cond/PE
(`configs/arah-zju/ZJUMOCAP-313_4gpus.yaml:36`).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from arah_tpu.core.body import hierarchical_softmax
from arah_tpu.core.embedder import positional_encoding, embedding_dim
from arah_tpu.nn.layers import (geometric_init_mlp, init_linear,
                                init_wn_linear, linear, softplus100,
                                wn_linear)


class SkinningConfig(NamedTuple):
    d_in: int = 3
    d_out: int = 25
    d_hidden: int = 128
    n_layers: int = 4
    skip_in: tuple = ()
    cond_in: tuple = ()
    cond_dim: int = 0
    multires: int = 0
    bias: float = 1.0
    geometric_init: bool = False
    weight_norm: bool = True
    softmax_scale: float = 20.0   # logits * 20 before hierarchical softmax


def _dims(cfg: SkinningConfig):
    d0 = cfg.d_in if cfg.multires == 0 else embedding_dim(cfg.multires,
                                                          cfg.d_in)
    return [d0] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]


def init_skinning(key, cfg: SkinningConfig):
    dims = _dims(cfg)
    if cfg.geometric_init:
        layers = geometric_init_mlp(
            key, dims, skip_in=cfg.skip_in, cond_in=cfg.cond_in,
            cond_dim=cfg.cond_dim, bias=cfg.bias,
            multires=cfg.multires, weight_norm=cfg.weight_norm)
    else:
        keys = jax.random.split(key, len(dims) - 1)
        layers = []
        for l in range(len(dims) - 1):
            in_dim = dims[l] + (cfg.cond_dim if l in cfg.cond_in else 0)
            out_dim = dims[l + 1] - (dims[0] if l + 1 in cfg.skip_in else 0)
            if cfg.weight_norm:
                layers.append(init_wn_linear(keys[l], in_dim, out_dim))
            else:
                layers.append(init_linear(keys[l], in_dim, out_dim))
    return {'layers': layers}


def skinning_logits(params, cfg: SkinningConfig, p: jax.Array,
                    cond: jax.Array | None = None) -> jax.Array:
    """Raw network output (..., 25) at normalized canonical points (..., 3).

    Mirrors `Deformer.forward` (`decoder.py:201-233`).
    """
    lin = wn_linear if cfg.weight_norm else linear
    x0 = positional_encoding(p, cfg.multires) if cfg.multires > 0 else p
    x = x0
    n = cfg.n_layers + 1
    for l in range(n):
        if l in cfg.cond_in and cond is not None:
            x = jnp.concatenate([x, jnp.broadcast_to(
                cond, x.shape[:-1] + cond.shape[-1:])], axis=-1)
        if l in cfg.skip_in:
            x = jnp.concatenate([x, x0], axis=-1)
        x = lin(params['layers'][l], x)
        if l < n - 1:
            x = softplus100(x)
    return x


def skinning_weights(params, cfg: SkinningConfig, p: jax.Array,
                     cond: jax.Array | None = None) -> jax.Array:
    """Normalized (..., 24) skinning weights.

    Matches `query_weights` (`root_finding_utils.py:54-113`): plain softmax
    for 24-channel nets, hierarchical softmax (logits*20) for 25-channel.
    """
    logits = skinning_logits(params, cfg, p, cond)
    if cfg.d_out == 24:
        return jax.nn.softmax(logits, axis=-1)
    return hierarchical_softmax(logits * cfg.softmax_scale)
