"""Pallas TPU kernel: fully-fused canonical-correspondence Broyden search.

SUPERSEDED by `corr_kernel_t.py` (round 2): this (T, k) column layout
uses 1/128 VPU lanes on the small-vector algebra and measured 10x
slower than chunked XLA; the transposed (k, T) version beats XLA and is
the production path. Kept as the documented baseline for the layout
study (PERF.md finding 4).

One kernel invocation solves `fwd_skin(x_hat) = x_bar` for a tile of
points end-to-end: the (dense, weight-norm-collapsed) skinning MLP weights
and bone transforms live in VMEM, and the whole Broyden iteration —
normalize, MLP, hierarchical softmax, LBS, residual, rank-1 inverse-
Jacobian update — runs in a `lax.while_loop` inside the kernel with
*per-tile* early exit. This is the finest-grained version of the
straggler-avoidance that `corr_chunk` (lax.map) provides at 16k-point
granularity (see PERF.md).

All small-matrix algebra (3x3 inverses, mat-vec) is written on (T, k)
column slices so Mosaic sees only 2-D elementwise ops and (T, in)x(in,
out) matmuls.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hier_softmax_cols(logits):
    """Hierarchical softmax on (T, 25) logits -> (T, 24) probabilities,
    written on (T, 1) column slices (Mosaic-friendly 2-D ops). Mirrors
    `core/body.py:hierarchical_softmax`."""
    sig = jax.nn.sigmoid
    c = [logits[:, i:i + 1] for i in range(25)]
    p = [None] * 24

    m_hip = jnp.maximum(jnp.maximum(c[1], c[2]), c[3])
    e1 = jnp.exp(c[1] - m_hip)
    e2 = jnp.exp(c[2] - m_hip)
    e3 = jnp.exp(c[3] - m_hip)
    denom = e1 + e2 + e3
    root_gate = sig(c[0])
    p[1] = root_gate * e1 / denom
    p[2] = root_gate * e2 / denom
    p[3] = root_gate * e3 / denom
    p[0] = 1.0 - root_gate

    for child, parent in ((4, 1), (5, 2), (6, 3), (7, 4), (8, 5), (9, 6),
                          (10, 7), (11, 8)):
        s = sig(c[child])
        p[child] = p[parent] * s
        p[parent] = p[parent] * (1 - s)

    spine_gate = sig(c[24])
    m_sp = jnp.maximum(jnp.maximum(c[12], c[13]), c[14])
    e12 = jnp.exp(c[12] - m_sp)
    e13 = jnp.exp(c[13] - m_sp)
    e14 = jnp.exp(c[14] - m_sp)
    denom_s = e12 + e13 + e14
    p[12] = p[9] * spine_gate * e12 / denom_s
    p[13] = p[9] * spine_gate * e13 / denom_s
    p[14] = p[9] * spine_gate * e14 / denom_s
    p[9] = p[9] * (1 - spine_gate)

    for child, parent in ((15, 12), (16, 13), (17, 14), (18, 16), (19, 17),
                          (20, 18), (21, 19), (22, 20), (23, 21)):
        s = sig(c[child])
        p[child] = p[parent] * s
        p[parent] = p[parent] * (1 - s)
    return jnp.concatenate(p, axis=1)


def _softplus100(x):
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jnp.log1p(jnp.exp(bx)) / 100.0)


def _mat3_vec(m9, v):
    """(T, 9) row-major 3x3 times (T, 3) -> (T, 3)."""
    return jnp.concatenate([
        m9[:, 0:1] * v[:, 0:1] + m9[:, 1:2] * v[:, 1:2]
        + m9[:, 2:3] * v[:, 2:3],
        m9[:, 3:4] * v[:, 0:1] + m9[:, 4:5] * v[:, 1:2]
        + m9[:, 5:6] * v[:, 2:3],
        m9[:, 6:7] * v[:, 0:1] + m9[:, 7:8] * v[:, 1:2]
        + m9[:, 8:9] * v[:, 2:3]], axis=1)


def _inv3x3_cols(m9):
    """(T, 9) row-major 3x3 inverse -> (T, 9)."""
    a, b, c = m9[:, 0:1], m9[:, 1:2], m9[:, 2:3]
    d, e, f = m9[:, 3:4], m9[:, 4:5], m9[:, 5:6]
    g, h, i = m9[:, 6:7], m9[:, 7:8], m9[:, 8:9]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    return jnp.concatenate(
        [A, D, G, B, E, H, C, F, I], axis=1) * inv_det


def _make_kernel(n_layers, max_steps, cvg_thresh, dvg_thresh, eps,
                 softmax_scale, norm_scale_const):
    def kernel(xbar_ref, x0_ref, t0_ref, mask_ref, *refs):
        # refs: [W1..Wn (transposed), b1..bn interleaved, bones (24,16),
        #        frame (1, 8): coord_min, coord_max, center(3), pad] + outs
        w_refs = refs[:2 * n_layers:2]
        b_refs = refs[1:2 * n_layers:2]
        bones_ref = refs[2 * n_layers]
        frame_ref = refs[2 * n_layers + 1]
        xout_ref = refs[2 * n_layers + 2]
        tout_ref = refs[2 * n_layers + 3]
        valid_ref = refs[2 * n_layers + 4]

        coord_min = frame_ref[0, 0]
        coord_max = frame_ref[0, 1]
        center = frame_ref[0, 2:5]          # (3,)
        ext = coord_max - coord_min
        # normalize: ((x - center - cmin + 0.05*ext)/ext/1.1 - 0.5)*2
        scale = 2.0 / (ext * 1.1)
        offset = (-center - coord_min + 0.05 * ext) * scale - 1.0

        x_bar = xbar_ref[:]                  # (T, 3)
        bones = bones_ref[:]                 # (24, 16)

        def fwd(x):
            xn = x * scale + offset
            h = xn
            for i in range(n_layers - 1):
                h = jnp.dot(h, w_refs[i][:],
                            preferred_element_type=jnp.float32) + b_refs[i][:]
                h = _softplus100(h)
            logits = jnp.dot(h, w_refs[-1][:],
                             preferred_element_type=jnp.float32) \
                + b_refs[-1][:]
            w = _hier_softmax_cols(logits * softmax_scale)   # (T, 24)
            T16 = jnp.dot(w, bones,
                          preferred_element_type=jnp.float32)  # (T, 16)
            xb = jnp.concatenate([
                T16[:, 0:1] * x[:, 0:1] + T16[:, 1:2] * x[:, 1:2]
                + T16[:, 2:3] * x[:, 2:3] + T16[:, 3:4],
                T16[:, 4:5] * x[:, 0:1] + T16[:, 5:6] * x[:, 1:2]
                + T16[:, 6:7] * x[:, 2:3] + T16[:, 7:8],
                T16[:, 8:9] * x[:, 0:1] + T16[:, 9:10] * x[:, 1:2]
                + T16[:, 10:11] * x[:, 2:3] + T16[:, 11:12]], axis=1)
            return xb - x_bar, T16

        x = x0_ref[:]
        mask0 = mask_ref[:] > 0              # (T, 1)
        gx, T16_at_x0 = fwd(x)
        T16_0 = t0_ref[:]

        # init inverse Jacobian from the skinning-net-blended rotation at
        # x0 (reference `root_finding_utils.py:281-283`)
        J0 = jnp.concatenate([T16_at_x0[:, 0:3], T16_at_x0[:, 4:7],
                              T16_at_x0[:, 8:11]], axis=1)
        J_inv = _inv3x3_cols(J0)

        update = -_mat3_vec(J_inv, gx)
        gx_norm = jnp.sqrt(jnp.sum(gx * gx, axis=1, keepdims=True))

        # Pack the whole per-point solver state into ONE (T, 64) array so
        # the while-loop carry is a single vector value (Mosaic's layout
        # inference chokes on carries of dozens of narrow vectors).
        # columns: 0:3 x | 3:6 gx | 6:15 J_inv | 15:18 update |
        #          18:21 x_opt | 21:37 t_opt | 37 gn_opt | 38 active | pad
        state0 = jnp.concatenate([
            x, gx, J_inv, update, x, T16_0, gx_norm,
            mask0.astype(jnp.float32),
            jnp.zeros((x.shape[0], 64 - 39), jnp.float32)], axis=1)

        def cond(carry):
            i, st = carry
            return (i < max_steps) & (jnp.max(st[:, 38:39]) > 0.0)

        def body(carry):
            i, st = carry
            x = st[:, 0:3]
            gx = st[:, 3:6]
            J_inv = st[:, 6:15]
            update = st[:, 15:18]
            x_opt = st[:, 18:21]
            t_opt = st[:, 21:37]
            gn_opt = st[:, 37:38]
            m = st[:, 38:39] > 0.0

            delta_x = jnp.where(m, update, 0.0)
            x_new = x + delta_x
            gx_new_full, T16 = fwd(x_new)
            gx_new = jnp.where(m, gx_new_full, gx)
            delta_gx = gx_new - gx

            gn = jnp.sqrt(jnp.sum(gx_new * gx_new, axis=1, keepdims=True))
            better = (gn < gn_opt) & m
            x_opt = jnp.where(better, x_new, x_opt)
            t_opt = jnp.where(better, T16, t_opt)
            gn_opt = jnp.where(better, gn, gn_opt)

            active_new = (gn_opt > cvg_thresh) & (gn < dvg_thresh) & m

            vT = jnp.concatenate([
                delta_x[:, 0:1] * J_inv[:, 0:1]
                + delta_x[:, 1:2] * J_inv[:, 3:4]
                + delta_x[:, 2:3] * J_inv[:, 6:7],
                delta_x[:, 0:1] * J_inv[:, 1:2]
                + delta_x[:, 1:2] * J_inv[:, 4:5]
                + delta_x[:, 2:3] * J_inv[:, 7:8],
                delta_x[:, 0:1] * J_inv[:, 2:3]
                + delta_x[:, 1:2] * J_inv[:, 5:6]
                + delta_x[:, 2:3] * J_inv[:, 8:9]], axis=1)
            a = delta_x - _mat3_vec(J_inv, delta_gx)
            bdot = jnp.sum(vT * delta_gx, axis=1, keepdims=True)
            bdot = jnp.where(bdot >= 0, bdot + eps, bdot - eps)
            u = a / bdot
            outer = jnp.concatenate([
                u[:, 0:1] * vT, u[:, 1:2] * vT, u[:, 2:3] * vT], axis=1)
            J_inv_new = J_inv + jnp.where(m, outer, 0.0)
            update_new = -_mat3_vec(J_inv_new, gx_new)

            st_new = jnp.concatenate([
                x_new, gx_new, J_inv_new, update_new, x_opt, t_opt, gn_opt,
                active_new.astype(jnp.float32),
                jnp.zeros((x_new.shape[0], 64 - 39), jnp.float32)], axis=1)
            return (i + 1, st_new)

        _, st = jax.lax.while_loop(cond, body,
                                   (jnp.zeros((), jnp.int32), state0))
        x_opt = st[:, 18:21]
        t_opt = st[:, 21:37]
        gn_opt = st[:, 37:38]

        valid = (gn_opt < cvg_thresh) & mask0
        xout_ref[:] = jnp.where(mask0, x_opt, x0_ref[:])
        tout_ref[:] = jnp.where(mask0, t_opt, t0_ref[:])
        valid_ref[:] = valid.astype(jnp.float32)

    return kernel


def _on_tpu() -> bool:
    return jax.devices()[0].platform == 'tpu'


@partial(jax.jit, static_argnames=('tile', 'max_steps', 'softmax_scale',
                                   'interpret'))
def corr_search_pallas(x_bar, x0, T0_16, mask, skin_weights_t, skin_biases,
                       bones16, coord_min, coord_max, center,
                       tile: int = 512, max_steps: int = 50,
                       cvg_thresh: float = 1e-5,
                       softmax_scale: float = 20.0,
                       interpret: bool | None = None):
    """Fused Broyden canonical-correspondence search.

    Args:
      x_bar/x0: (N, 3) targets and inits (metric canonical space);
      T0_16: (N, 16) initial blended transforms (row-major 4x4 top 3 rows
        used); mask: (N,) active points;
      skin_weights_t: list of pre-transposed dense (in, out) skinning MLP
        weights; skin_biases: list of (out,); bones16: (24, 16);
      coord_min/coord_max: scalars; center: (3,).
    Returns (x_hat (N,3), T16 (N,16), valid (N,)).
    """
    if interpret is None:
        interpret = not _on_tpu()
    n = x_bar.shape[0]
    assert n % tile == 0, (n, tile)
    n_layers = len(skin_weights_t)
    frame_vec = jnp.concatenate(
        [jnp.reshape(coord_min, (1,)), jnp.reshape(coord_max, (1,)),
         jnp.reshape(center, (3,)), jnp.zeros((3,))]).reshape(1, 8)

    operands = [x_bar, x0, T0_16, mask.astype(jnp.float32).reshape(n, 1)]
    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w, b in zip(skin_weights_t, skin_biases):
        operands += [w, b]
        in_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)]
    operands += [bones16, frame_vec]
    in_specs += [
        pl.BlockSpec(bones16.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(frame_vec.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM)]

    out = pl.pallas_call(
        _make_kernel(n_layers, max_steps, cvg_thresh, 1.0, 1e-6,
                     softmax_scale, None),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 16), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        interpret=interpret,
    )(*operands)
    x_hat, T16, valid = out
    return x_hat, T16, valid[:, 0] > 0.5
