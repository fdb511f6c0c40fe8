"""Pallas TPU kernel: fused KNN-skinning sphere-trace march loop.

Fuses the entire per-iteration body of `render/ray_tracing.py:sphere_trace`
(reference `BodyRayTracing.sphere_tracing`, `ray_tracing.py:174-296`) into
one VMEM-resident loop per ray tile:

  KNN against the posed SMPL verts  ->  blended bone transform (LBS)
  ->  affine inverse backward map   ->  generated-SIREN SDF  ->  march.

The XLA version round-trips every intermediate — most expensively the
(N, 6890) KNN distance matrix and the seven (N, 256) SIREN activations —
through HBM on each of up to 50 iterations. Here the ray tile's state
lives in registers/VMEM across iterations and each tile exits as soon as
its own rays converge (same per-tile early-exit idea as
`corr_kernel_t.py`, which measured 61 ms vs 81 ms chunked XLA).

Layout: (k, T) rows, rays along the 128-wide lane axis. The two KNN
matmuls are MXU contractions:
  d     = [-2 v | |v|^2]^T (4, V)  x  [p | 1] (4, T)   -> (V, T)
  w     = skin_weights^T (24, V)   x  onehot (V, T)    -> (24, T)
with the min/one-hot reduction over the sublane axis. Nearest-vertex ties
average their skinning weights (the XLA argmin picks the first index);
ties are measure-zero for real geometry.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arah_tpu.ops.pallas.corr_kernel_t import _inv3x3_rows, _mat3_vec_rows


def _make_kernel(n_layers, has_film, n_iters, thresh, clamp_dist):
    def kernel(cam_ref, dir_ref, near_ref, far_ref, *refs):
        # refs: [verts_aug (4, V), sw_t (24, V), bones_t (16, 24),
        #        W1..Wn, b1..bn, (freq1..,phase1.. if film), frame (1, 8)]
        #       + outs: t, unfinished, diverged, x_norm, T16
        verts_ref = refs[0]
        sw_ref = refs[1]
        bones_ref = refs[2]
        off = 3
        w_refs = refs[off:off + n_layers]
        b_refs = refs[off + n_layers:off + 2 * n_layers]
        off += 2 * n_layers
        if has_film:
            f_refs = refs[off:off + n_layers - 1]
            p_refs = refs[off + n_layers - 1:off + 2 * (n_layers - 1)]
            off += 2 * (n_layers - 1)
        frame_ref = refs[off]
        t_out, unf_out, div_out, xnorm_out, t16_out = refs[off + 1:]

        coord_min = frame_ref[0, 0]
        coord_max = frame_ref[0, 1]
        center = frame_ref[0, 2:5].reshape(3, 1)
        trans = frame_ref[0, 5:8].reshape(3, 1)
        ext = coord_max - coord_min
        nscale = 2.0 / (ext * 1.1)
        noffset = (-center - coord_min + 0.05 * ext) * nscale - 1.0
        metric_scale = 0.55 * ext          # sdf_to_metric factor

        cam = cam_ref[:]                   # (3, T)
        dirs = dir_ref[:]                  # (3, T)
        near = near_ref[:]                 # (1, T)
        far = far_ref[:]                   # (1, T)
        verts_aug = verts_ref[:]           # (4, V)
        sw_t = sw_ref[:]                   # (24, V)
        bones_t = bones_ref[:]             # (16, 24)
        T = cam.shape[1]

        def sdf_siren(xn):
            h = xn
            for i in range(n_layers - 1):
                h = jnp.dot(w_refs[i][:], h,
                            preferred_element_type=jnp.float32) + b_refs[i][:]
                if has_film:
                    h = f_refs[i][:] * h + p_refs[i][:]
                h = jnp.sin(30.0 * h)
            return jnp.dot(w_refs[-1][:], h,
                           preferred_element_type=jnp.float32) + b_refs[-1][:]

        def march_body(st):
            # flags live as f32 rows (Mosaic rejects i1 select operands)
            t = st[0:1]
            unf_f = st[1:2]
            unf = unf_f > 0.0
            div_f = st[2:3]
            x_norm_old = st[3:6]
            T16_old = st[6:22]

            pts = cam + t * dirs                              # (3, T)
            pts_aug = jnp.concatenate(
                [pts, jnp.ones((1, T), jnp.float32)], axis=0)  # (4, T)
            d = jax.lax.dot_general(
                verts_aug, pts_aug, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (V, T)
            dmin = jnp.min(d, axis=0, keepdims=True)
            onehot = (d <= dmin).astype(jnp.float32)
            cnt = jnp.sum(onehot, axis=0, keepdims=True)
            w = jnp.dot(sw_t, onehot,
                        preferred_element_type=jnp.float32) / cnt  # (24, T)
            T16 = jnp.dot(bones_t, w,
                          preferred_element_type=jnp.float32)      # (16, T)

            R = jnp.concatenate([T16[0:3], T16[4:7], T16[8:11]], axis=0)
            tr = jnp.concatenate([T16[3:4], T16[7:8], T16[11:12]], axis=0)
            R_inv = _inv3x3_rows(R)
            x_hat = _mat3_vec_rows(R_inv, (pts - trans) - tr)
            x_norm = x_hat * nscale + noffset

            sdf = sdf_siren(x_norm) * metric_scale            # (1, T)
            sdf = jnp.where(unf, sdf, 1e11)

            x_norm_new = jnp.where(unf, x_norm, x_norm_old)
            T16_new = jnp.where(unf, T16, T16_old)

            sdf_march = jnp.clip(sdf, -clamp_dist, clamp_dist)
            update = (jnp.abs(sdf_march) > thresh) & (jnp.abs(sdf) < 1e6)
            t_new = jnp.where(update, t + sdf_march, t)
            div_new = jnp.where(update,
                                (t_new >= far).astype(jnp.float32), div_f)
            remove = (unf & (jnp.abs(sdf) <= thresh)) | (div_new > 0.0)
            unf_new = jnp.where(remove, 0.0, unf_f)

            return jnp.concatenate([
                t_new, unf_new, div_new, x_norm_new, T16_new,
                jnp.zeros((2, T), jnp.float32)], axis=0)

        unf0 = near[:] < far[:]
        st0 = jnp.concatenate([
            near, unf0.astype(jnp.float32),
            (~unf0).astype(jnp.float32),
            jnp.zeros((3 + 16 + 2, T), jnp.float32)], axis=0)   # (24, T)

        def cond(carry):
            i, st = carry
            return (i < n_iters) & (jnp.max(st[1:2, :]) > 0.0)

        _, st = jax.lax.while_loop(
            cond, lambda c: (c[0] + 1, march_body(c[1])),
            (jnp.zeros((), jnp.int32), st0))

        t_out[:] = st[0:1]
        unf_out[:] = st[1:2]
        div_out[:] = st[2:3]
        xnorm_out[:] = st[3:6]
        t16_out[:] = st[6:22]

    return kernel


def _on_tpu() -> bool:
    return jax.devices()[0].platform == 'tpu'


def _pad_verts(verts, sw, lane: int = 128):
    """Pad the vertex set to a lane multiple with far-away dummies whose
    distance (~1e8) can never win the KNN min."""
    v = verts.shape[0]
    vp = ((v + lane - 1) // lane) * lane
    if vp != v:
        pad = vp - v
        verts = jnp.concatenate(
            [verts, jnp.full((pad, 3), 1e4, verts.dtype)], axis=0)
        sw = jnp.concatenate(
            [sw, jnp.zeros((pad, sw.shape[1]), sw.dtype)], axis=0)
    return verts, sw


@partial(jax.jit, static_argnames=('tile', 'n_iters', 'thresh',
                                   'clamp_dist', 'interpret'))
def sphere_march_pallas(cam, dirs, near, far, verts_posed, skin_weights,
                        bones16, siren_weights, siren_biases, siren_freqs,
                        siren_phases, coord_min, coord_max, center, trans,
                        tile: int = 128, n_iters: int = 50,
                        thresh: float = 1e-5, clamp_dist: float = 0.1,
                        interpret: bool | None = None):
    """Fused sphere-trace march.

    Args:
      cam/dirs: (N, 3); near/far: (N,); verts_posed: (V, 3) world-space
      posed SMPL verts; skin_weights: (V, 24); bones16: (24, 16);
      siren_weights/biases: generated SIREN layers ((out, in) / (out,));
      siren_freqs/phases: FiLM vectors per hidden layer (may be empty);
      coord_min/coord_max: scalars; center/trans: (3,).
    Returns (t (N,), unfinished (N,) bool, diverged (N,) bool,
             x_norm (N, 3), T16 (N, 16)).
    """
    if interpret is None:
        interpret = not _on_tpu()
    n = cam.shape[0]
    assert n % tile == 0, (n, tile)
    n_layers = len(siren_weights)
    has_film = len(siren_freqs) > 0

    verts_p, sw_p = _pad_verts(verts_posed, skin_weights)
    vsq = jnp.sum(verts_p * verts_p, axis=1)
    verts_aug = jnp.concatenate(
        [-2.0 * verts_p.T, vsq[None]], axis=0)                # (4, V)
    frame_vec = jnp.concatenate(
        [jnp.reshape(coord_min, (1,)), jnp.reshape(coord_max, (1,)),
         jnp.reshape(center, (3,)), jnp.reshape(trans, (3,))]
    ).reshape(1, 8)

    lane = lambda s: pl.BlockSpec(s, lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    rep = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)

    operands = [cam.T, dirs.T, near.reshape(1, n), far.reshape(1, n),
                verts_aug, sw_p.T, bones16.T]
    in_specs = [lane((3, tile)), lane((3, tile)), lane((1, tile)),
                lane((1, tile)), rep(verts_aug.shape), rep(sw_p.T.shape),
                rep((16, 24))]
    for w in siren_weights:
        operands.append(w)
        in_specs.append(rep(w.shape))
    for b in siren_biases:
        b2 = b.reshape(-1, 1)
        operands.append(b2)
        in_specs.append(rep(b2.shape))
    if has_film:
        for f in siren_freqs:
            f2 = f.reshape(-1, 1)
            operands.append(f2)
            in_specs.append(rep(f2.shape))
        for p in siren_phases:
            p2 = p.reshape(-1, 1)
            operands.append(p2)
            in_specs.append(rep(p2.shape))
    operands.append(frame_vec)
    in_specs.append(rep(frame_vec.shape))

    out = pl.pallas_call(
        _make_kernel(n_layers, has_film, n_iters, thresh, clamp_dist),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=(lane((1, tile)), lane((1, tile)), lane((1, tile)),
                   lane((3, tile)), lane((16, tile))),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((16, n), jnp.float32),
        ),
        interpret=interpret,
    )(*operands)
    t, unf, div, x_norm, T16 = out
    return (t[0], unf[0] > 0.5, div[0] > 0.5, x_norm.T, T16.T)
