"""IDR-style rendering (color) network.

Functional re-design of reference
`im2mesh/metaavatar_render/models/decoder.py:10-124` (`RenderingNetwork`):
weight-normed ReLU MLP over [points, PE(view_dirs), normals, features],
skip connection re-injecting the input, sigmoid output. Pose-feature
variants {none, leap, root, latent, hybrid} change the feature width
(`metaavatar_render/config.py:106-123`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from arah_tpu.core.embedder import positional_encoding, embedding_dim
from arah_tpu.nn.layers import init_wn_linear, mm_t, wn_linear
from arah_tpu.nn.pose_encoder import init_pose_encoder, pose_encoder_apply


def _color_pallas_ok() -> bool:
    """Fused-color-kernel dispatch gate (same contract as
    `render/ray_tracing._pallas_ok`): TPU by default, ARAH_FORCE_PALLAS=1
    drives interpret mode on CPU tests, ARAH_DISABLE_PALLAS=1 escapes."""
    import os
    if os.environ.get('ARAH_DISABLE_PALLAS') == '1':
        return False
    return (jax.default_backend() == 'tpu'
            or os.environ.get('ARAH_FORCE_PALLAS') == '1')


class ColorConfig(NamedTuple):
    d_feature: int = 384          # 256 sdf feature + pose feature width
    mode: str = 'idr'             # idr | no_view_dir | no_normal
    d_in: int = 9
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 5
    multires: int = 0             # PE on points
    multires_view: int = 4        # PE on view dirs
    skips: tuple = (3,)
    squeeze_out: bool = True
    pose_encoder: str | None = 'latent'  # None|leap|root|latent|hybrid
    rel_joints: bool = True
    # fold the (N, ~545) input concat into per-component partial matmuls
    # at layer 0 and the skip layer (column slices of the weight-normed
    # matrix). Same math up to partial-sum reassociation (unit-pinned to
    # 1e-5, tests/test_networks.py::TestColorFoldInput). MEASURED
    # NEGATIVE on v5e (round 4): 35,464 vs 36,415 rays/s at 8192 rays —
    # the skinny per-component dots (K=3 points/normals/view slices)
    # cost more MXU passes than the ~7 ms of concat traffic they
    # eliminate. Default off; kept as the bench_ablate 'colorfold' A/B.
    fold_input: bool = False
    # fused Pallas fwd+bwd pair (ops/pallas/color_kernel.py): the whole
    # MLP runs per point-tile in VMEM — the (N, ~545) input block, its
    # skip re-injection and every inter-layer activation (XLA backward
    # residuals) never touch HBM. Unlike fold_input, the per-component
    # partial dots here read VMEM, so the split costs nothing. TPU-only
    # dispatch (color_apply); ARAH_DISABLE_PALLAS=1 escapes to XLA.
    # tiles: fwd 1024 / bwd 512 measured best on v5e (interleaved sweep,
    # round 5: 1024x512 +1.0% over 512x256; the color kernels keep no
    # chain residents, so both fit scoped VMEM comfortably)
    use_pallas: bool = True
    pallas_tile: int = 1024
    pallas_tile_bwd: int = 512


def _dims(cfg: ColorConfig):
    d0 = cfg.d_in + cfg.d_feature
    if cfg.multires > 0:
        d0 += embedding_dim(cfg.multires, 3) - 3
    if cfg.multires_view > 0:
        d0 += embedding_dim(cfg.multires_view, 3) - 3
    dims = [d0] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]
    for skip in cfg.skips:
        dims[skip] = dims[skip] // 2 + dims[0]
    return dims


def init_color(key, cfg: ColorConfig):
    dims = _dims(cfg)
    n = len(dims) - 1
    keys = jax.random.split(key, n + 1)
    layers = []
    for l in range(n):
        out_dim = dims[l + 1] - (dims[0] if l + 1 in cfg.skips else 0)
        layers.append(init_wn_linear(keys[l], dims[l], out_dim))
    params = {'layers': layers}
    if cfg.pose_encoder == 'leap':
        params['pose_encoder'] = init_pose_encoder(keys[-1])
    return params


def color_pose_feature(params, cfg: ColorConfig, pose_cond: dict):
    """Build the (1, F_pose) pose feature from the pose_cond dict, mirroring
    `RenderingNetwork.forward` (`decoder.py:78-99`).

    pose_cond keys (as in the reference):
      rots_full (B, 24, 9), Jtrs_posed (B, 24, 3), latent_code (1, 128),
      optional rot_noise (1, 9) / trans_noise (1, 3).
    """
    if cfg.pose_encoder == 'leap':
        return pose_encoder_apply(
            params['pose_encoder'], pose_cond['rots_full'][:1],
            pose_cond['Jtrs_posed'][:1], rel_joints=cfg.rel_joints)
    if cfg.pose_encoder in ('root', 'hybrid'):
        rot = pose_cond['rots_full'][:1, 0].reshape(1, 9)
        trans = pose_cond['Jtrs_posed'][:1, 0].reshape(1, 3)
        if 'rot_noise' in pose_cond and 'trans_noise' in pose_cond:
            rot = rot + pose_cond['rot_noise']
            trans = trans + pose_cond['trans_noise']
        feat = jnp.concatenate([rot, trans], axis=-1)
        if cfg.pose_encoder == 'hybrid':
            feat = jnp.concatenate([feat, pose_cond['latent_code']], axis=-1)
        return feat
    if cfg.pose_encoder == 'latent':
        return pose_cond['latent_code']
    return None


def color_apply(params, cfg: ColorConfig, points: jax.Array,
                normals: jax.Array, view_dirs: jax.Array,
                sdf_feature: jax.Array, pose_feature: jax.Array | None,
                bf16: bool = False) -> jax.Array:
    """RGB at points. All point-shaped args are (N, ·); pose_feature (1, F)
    is broadcast across points. bf16: see `layers.mm_t`."""
    if cfg.multires > 0:
        points = positional_encoding(points, cfg.multires)
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)

    if cfg.mode == 'idr':
        narrow = [points, view_dirs, normals]
    elif cfg.mode == 'no_view_dir':
        narrow = [points, normals]
    elif cfg.mode == 'no_normal':
        narrow = [points, view_dirs]
    else:
        raise ValueError(cfg.mode)

    if cfg.use_pallas and _color_pallas_ok():
        # fused Pallas fwd+bwd pair (ops/pallas/color_kernel.py): the
        # x0 = [narrow..., sdf_feature, pose] concat below is reproduced
        # per tile in VMEM (the pose row broadcasts in-register);
        # weight-norm normalization stays here in XLA (differentiable,
        # tiny — dW cotangents flow back onto g and v)
        from arah_tpu.ops.pallas.color_kernel import color_mlp_fused
        weights, biases = [], []
        for lyr in params['layers']:
            v = lyr['v']
            weights.append(lyr['g'] * v
                           / jnp.linalg.norm(v, axis=1, keepdims=True))
            biases.append(lyr['b'])
        small = jnp.concatenate(narrow, axis=-1)
        return color_mlp_fused(
            weights, biases, small, sdf_feature, pose_feature,
            skips=tuple(cfg.skips), squeeze_out=cfg.squeeze_out,
            bf16=bf16, tile=cfg.pallas_tile, tile_bwd=cfg.pallas_tile_bwd)

    feats = sdf_feature
    if pose_feature is not None:
        feats = jnp.concatenate([
            feats,
            jnp.broadcast_to(pose_feature,
                             feats.shape[:-1] + pose_feature.shape[-1:])],
            axis=-1)

    parts = narrow + [feats]
    if bf16:
        # store the input block and inter-layer activations in bf16: the
        # matmul operands are rounded to bf16 either way (layers.mm_t);
        # bf16 storage halves the HBM traffic of the (N, ~400+) input
        # (reused at the skip) and the (N, 256) hidden chain
        parts = [p.astype(jnp.bfloat16) for p in parts]
    n = cfg.n_layers + 1
    if cfg.fold_input:
        def fold_linear(lyr, comps, extra=None):
            # wn_linear with the input concat folded into column-sliced
            # partial matmuls (concat([*comps, extra]) never materializes)
            v = lyr['v']
            w = lyr['g'] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
            out = lyr['b']
            off = 0
            for c in comps:
                k = c.shape[-1]
                out = out + mm_t(c, w[:, off:off + k], bf16)
                off += k
            if extra is not None:
                out = out + mm_t(extra, w[:, off:], bf16)
            return out

        x = None
        for l in range(n):
            lyr = params['layers'][l]
            if l == 0:
                x = fold_linear(lyr, parts)
            elif l in cfg.skips:
                x = fold_linear(lyr, parts, extra=x)
            else:
                x = wn_linear(lyr, x, bf16)
            if l < n - 1:
                x = jax.nn.relu(x)
                if bf16:
                    x = x.astype(jnp.bfloat16)
        return jax.nn.sigmoid(x) if cfg.squeeze_out else x

    x0 = jnp.concatenate(parts, axis=-1)

    x = x0
    for l in range(n):
        if l in cfg.skips:
            x = jnp.concatenate([x0, x], axis=-1)
        x = wn_linear(params['layers'][l], x, bf16)
        if l < n - 1:
            x = jax.nn.relu(x)
            if bf16:
                x = x.astype(jnp.bfloat16)
    return jax.nn.sigmoid(x) if cfg.squeeze_out else x


def feature_width(pose_encoder: str | None, latent_dim: int = 128,
                  sdf_feature_dim: int = 256) -> int:
    """SDF-feature + pose-feature width (`metaavatar_render/config.py:106-123`).
    sdf_feature_dim is the SDF net's hidden width (256 in all reference
    configs)."""
    return sdf_feature_dim + {None: 0, 'leap': 144, 'root': 12,
                              'latent': latent_dim,
                              'hybrid': 12 + latent_dim}[pose_encoder]
