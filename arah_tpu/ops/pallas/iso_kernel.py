"""Pallas TPU kernel: fused joint (canonical point, depth) iso-surface
Broyden refinement.

Fuses the 4D root-find of `solver/root_find.py:search_iso_surface_depth`
(reference `root_finding_utils.py` joint surface refinement): per ray,
solve g(u) = [ sdf(x_hat) ; fwd_skin(x_hat) - (cam + z ray - trans) ] = 0
over u = (x_hat, z). Each Broyden iteration evaluates BOTH the skinning
MLP (4x128, hierarchical softmax, LBS blend) and the generated SIREN SDF
(7x256, FiLM) — both stay resident in VMEM across iterations, with the
same (k, T) rows-are-rays layout and per-tile early exit as
`corr_kernel_t.py` / `march_kernel.py`.

The init inverse Jacobian (a 4x4 built from jacfwd of the skinning net +
SDF gradient) is computed once OUTSIDE by the existing XLA code and
passed in — only the iteration loop is fused.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arah_tpu.ops.pallas.corr_kernel_t import (_hier_softmax_rows,
                                               _softplus100)


def _mat4_vec_rows(m16, v):
    """(16, T) row-major 4x4 times (4, T) -> (4, T)."""
    rows = []
    for r in range(4):
        acc = m16[4 * r:4 * r + 1] * v[0:1]
        for c in range(1, 4):
            acc = acc + m16[4 * r + c:4 * r + c + 1] * v[c:c + 1]
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


def _vec_mat4_rows(v, m16):
    """(4, T) row-vector times (16, T) row-major 4x4 -> (4, T)."""
    cols = []
    for c in range(4):
        acc = v[0:1] * m16[c:c + 1]
        for r in range(1, 4):
            acc = acc + v[r:r + 1] * m16[4 * r + c:4 * r + c + 1]
        cols.append(acc)
    return jnp.concatenate(cols, axis=0)


def _make_kernel(n_skin_layers, n_sdf_layers, has_film, max_steps,
                 cvg_thresh, dvg_thresh, eps, softmax_scale):
    def kernel(cam_ref, dir_ref, u0_ref, t0_ref, jinv0_ref, mask_ref,
               *refs):
        # refs: skin W/b interleaved, bones_t (16,24), sdf W..., sdf b...,
        #       (film f..., p...), frame (1,8) + outs
        sw_refs = refs[:2 * n_skin_layers:2]
        sb_refs = refs[1:2 * n_skin_layers:2]
        off = 2 * n_skin_layers
        bones_ref = refs[off]
        off += 1
        dw_refs = refs[off:off + n_sdf_layers]
        db_refs = refs[off + n_sdf_layers:off + 2 * n_sdf_layers]
        off += 2 * n_sdf_layers
        if has_film:
            f_refs = refs[off:off + n_sdf_layers - 1]
            p_refs = refs[off + n_sdf_layers - 1:off + 2 * (n_sdf_layers - 1)]
            off += 2 * (n_sdf_layers - 1)
        frame_ref = refs[off]
        uout_ref, tout_ref, vout_ref, aout_ref = refs[off + 1:]

        coord_min = frame_ref[0, 0]
        coord_max = frame_ref[0, 1]
        center = frame_ref[0, 2:5].reshape(3, 1)
        trans = frame_ref[0, 5:8].reshape(3, 1)
        ext = coord_max - coord_min
        nscale = 2.0 / (ext * 1.1)
        noffset = (-center - coord_min + 0.05 * ext) * nscale - 1.0
        metric_scale = 0.55 * ext

        cam = cam_ref[:]                 # (3, T)
        dirs = dir_ref[:]                # (3, T)
        bones_t = bones_ref[:]           # (16, 24)
        T = cam.shape[1]

        def g(u):
            x = u[0:3]                   # metric canonical
            z = u[3:4]
            xn_skin = x * nscale + noffset
            h = xn_skin
            for i in range(n_skin_layers - 1):
                h = jnp.dot(sw_refs[i][:], h,
                            preferred_element_type=jnp.float32) + sb_refs[i][:]
                h = _softplus100(h)
            logits = jnp.dot(sw_refs[-1][:], h,
                             preferred_element_type=jnp.float32) \
                + sb_refs[-1][:]
            w = _hier_softmax_rows(logits * softmax_scale)
            T16 = jnp.dot(bones_t, w,
                          preferred_element_type=jnp.float32)    # (16, T)
            xb = jnp.concatenate([
                T16[0:1] * x[0:1] + T16[1:2] * x[1:2]
                + T16[2:3] * x[2:3] + T16[3:4],
                T16[4:5] * x[0:1] + T16[5:6] * x[1:2]
                + T16[6:7] * x[2:3] + T16[7:8],
                T16[8:9] * x[0:1] + T16[9:10] * x[1:2]
                + T16[10:11] * x[2:3] + T16[11:12]], axis=0)
            err_corr = xb - (cam + z * dirs - trans)             # (3, T)

            hs = xn_skin
            for i in range(n_sdf_layers - 1):
                hs = jnp.dot(dw_refs[i][:], hs,
                             preferred_element_type=jnp.float32) \
                    + db_refs[i][:]
                if has_film:
                    hs = f_refs[i][:] * hs + p_refs[i][:]
                hs = jnp.sin(30.0 * hs)
            sdf = (jnp.dot(dw_refs[-1][:], hs,
                           preferred_element_type=jnp.float32)
                   + db_refs[-1][:]) * metric_scale              # (1, T)
            # residual order matches root_find.py: [sdf, corr]
            return jnp.concatenate([sdf, err_corr], axis=0), T16

        u = u0_ref[:]                    # (4, T)
        mask0 = mask_ref[:] > 0          # (1, T)
        J_inv = jinv0_ref[:]             # (16, T)
        T16_0 = t0_ref[:]                # (16, T)

        gx, _ = g(u)
        update = -_mat4_vec_rows(J_inv, gx)
        gn = jnp.sqrt(jnp.sum(gx * gx, axis=0, keepdims=True))

        # rows: 0:4 u | 4:8 gx | 8:24 J_inv | 24:28 update | 28:32 u_opt |
        #       32:48 t_opt | 48 gn_opt | 49 active | 50:56 pad
        st0 = jnp.concatenate([
            u, gx, J_inv, update, u, T16_0, gn,
            mask0.astype(jnp.float32),
            jnp.zeros((6, T), jnp.float32)], axis=0)

        def cond(carry):
            i, st = carry
            return (i < max_steps) & (jnp.max(st[49:50, :]) > 0.0)

        def body(carry):
            i, st = carry
            u = st[0:4]
            gx = st[4:8]
            J_inv = st[8:24]
            update = st[24:28]
            u_opt = st[28:32]
            t_opt = st[32:48]
            gn_opt = st[48:49]
            m = st[49:50] > 0.0

            du = jnp.where(m, update, 0.0)
            u_new = u + du
            gx_full, T16 = g(u_new)
            gx_new = jnp.where(m, gx_full, gx)
            dg = gx_new - gx

            gn = jnp.sqrt(jnp.sum(gx_new * gx_new, axis=0, keepdims=True))
            better = (gn < gn_opt) & m
            u_opt = jnp.where(better, u_new, u_opt)
            t_opt = jnp.where(better, T16, t_opt)
            gn_opt = jnp.where(better, gn, gn_opt)

            active = ((gn_opt > cvg_thresh) & (gn < dvg_thresh)
                      & m).astype(jnp.float32)

            vT = _vec_mat4_rows(du, J_inv)                  # (4, T)
            a = du - _mat4_vec_rows(J_inv, dg)
            bdot = jnp.sum(vT * dg, axis=0, keepdims=True)
            bdot = jnp.where(bdot >= 0, bdot + eps, bdot - eps)
            uvec = a / bdot
            outer = jnp.concatenate(
                [uvec[r:r + 1] * vT for r in range(4)], axis=0)  # (16, T)
            J_inv_new = J_inv + jnp.where(m, outer, 0.0)
            update_new = -_mat4_vec_rows(J_inv_new, gx_new)

            st_new = jnp.concatenate([
                u_new, gx_new, J_inv_new, update_new, u_opt, t_opt,
                gn_opt, active, jnp.zeros((6, u.shape[1]), jnp.float32)],
                axis=0)
            return (i + 1, st_new)

        _, st = jax.lax.while_loop(cond, body,
                                   (jnp.zeros((), jnp.int32), st0))
        u_opt = st[28:32]
        t_opt = st[32:48]
        gn_opt = st[48:49]

        valid = (gn_opt < cvg_thresh) & mask0
        uout_ref[:] = jnp.where(mask0, u_opt, u0_ref[:])
        tout_ref[:] = jnp.where(mask0, t_opt, t0_ref[:])
        vout_ref[:] = valid.astype(jnp.float32)
        # still-active at loop exit — the straggler-resolve input
        aout_ref[:] = st[49:50]

    return kernel


def _on_tpu() -> bool:
    return jax.devices()[0].platform == 'tpu'


@partial(jax.jit, static_argnames=('tile', 'max_steps', 'cvg_thresh',
                                   'softmax_scale', 'interpret'))
def iso_refine_pallas(cam, dirs, u0, T0_16, J_inv0_16, mask,
                      skin_weights, skin_biases, bones16,
                      siren_weights, siren_biases, siren_freqs,
                      siren_phases, coord_min, coord_max, center, trans,
                      tile: int = 512, max_steps: int = 50,
                      cvg_thresh: float = 1e-5,
                      softmax_scale: float = 20.0,
                      interpret: bool | None = None):
    """Fused joint iso-surface refinement.

    Args:
      cam/dirs: (N, 3) ray origins/directions (world);
      u0: (N, 4) init [x_hat (metric), z]; T0_16: (N, 16) init transforms;
      J_inv0_16: (N, 16) init inverse Jacobian (row-major 4x4);
      mask: (N,) rays to solve; skin/siren params as in the sibling
      kernels; trans: (3,) frame translation.
    Returns (u (N, 4), T16 (N, 16), valid (N,)).
    """
    if interpret is None:
        interpret = not _on_tpu()
    n = cam.shape[0]
    assert n % tile == 0, (n, tile)
    n_skin = len(skin_weights)
    n_sdf = len(siren_weights)
    has_film = len(siren_freqs) > 0

    frame_vec = jnp.concatenate(
        [jnp.reshape(coord_min, (1,)), jnp.reshape(coord_max, (1,)),
         jnp.reshape(center, (3,)), jnp.reshape(trans, (3,))]).reshape(1, 8)

    lane = lambda s: pl.BlockSpec(s, lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    rep = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)

    operands = [cam.T, dirs.T, u0.T, T0_16.T, J_inv0_16.T,
                mask.astype(jnp.float32).reshape(1, n)]
    in_specs = [lane((3, tile)), lane((3, tile)), lane((4, tile)),
                lane((16, tile)), lane((16, tile)), lane((1, tile))]
    for w, b in zip(skin_weights, skin_biases):
        b2 = b.reshape(-1, 1)
        operands += [w, b2]
        in_specs += [rep(w.shape), rep(b2.shape)]
    operands.append(bones16.T)
    in_specs.append(rep((16, 24)))
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
        _make_kernel(n_skin, n_sdf, has_film, max_steps, cvg_thresh, 1.0,
                     1e-6, softmax_scale),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=(lane((4, tile)), lane((16, tile)), lane((1, tile)),
                   lane((1, tile))),
        out_shape=(
            jax.ShapeDtypeStruct((4, n), jnp.float32),
            jax.ShapeDtypeStruct((16, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        interpret=interpret,
    )(*operands)
    u, T16, valid, active = out
    return u.T, T16.T, valid[0] > 0.5, active[0] > 0.5
