"""Pallas TPU kernel: fused canonical-correspondence Broyden search,
transposed (k, T) layout.

Second-generation version of `corr_kernel.py`. The round-1 kernel kept
the per-point solver state as (T, k) *columns* — every 3-vector /
3x3-matrix op ran on (T, 1) slices, using 1 of 128 VPU lanes (PERF.md
finding 4: 10x slower than the chunked XLA path). Here the state lives
as (k, T) *rows*: points run along the 128-wide lane dimension, so each
small-algebra op is a full-width (1, T) / (3, T) vector op, and the MLP
matmuls become (out, in) x (in, T) MXU contractions with no transposes
inside the loop.

Same semantics as `solver/root_find.py:search_canonical_corr` (reference
`im2mesh/metaavatar_render/renderer/ray_tracing.py:403-461` +
`utils/broyden.py`): per-point Broyden with best-iterate tracking,
per-tile early exit, masked points frozen at init.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arah_tpu.ops.pallas.precision import dot_split3, split_f32


def _hier_softmax_rows(logits):
    """Hierarchical softmax on (25, T) logits -> (24, T) probabilities.
    Mirrors `core/body.py:hierarchical_softmax`; each row op is a
    full-lane (1, T) vector op."""
    sig = jax.nn.sigmoid
    c = [logits[i:i + 1, :] for i in range(25)]
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
    return jnp.concatenate(p, axis=0)


def _softplus100(x):
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jnp.log1p(jnp.exp(bx)) / 100.0)


def _mat3_vec_rows(m9, v):
    """(9, T) row-major 3x3 times (3, T) -> (3, T)."""
    return jnp.concatenate([
        m9[0:1] * v[0:1] + m9[1:2] * v[1:2] + m9[2:3] * v[2:3],
        m9[3:4] * v[0:1] + m9[4:5] * v[1:2] + m9[5:6] * v[2:3],
        m9[6:7] * v[0:1] + m9[7:8] * v[1:2] + m9[8:9] * v[2:3]], axis=0)


def _inv3x3_rows(m9):
    """(9, T) row-major 3x3 inverse -> (9, T)."""
    a, b, c = m9[0:1], m9[1:2], m9[2:3]
    d, e, f = m9[3:4], m9[4:5], m9[5:6]
    g, h, i = m9[6:7], m9[7:8], m9[8:9]
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
    return jnp.concatenate([A, D, G, B, E, H, C, F, I], axis=0) * inv_det


def _make_kernel(n_layers, max_steps, cvg_thresh, dvg_thresh, eps,
                 softmax_scale, precision='f32', want_jac=False):
    def kernel(xbar_ref, x0_ref, t0_ref, mask_ref, *refs):
        # refs: [W1..Wn ((out, in)), b1..bn ((out, 1)) interleaved,
        #        bones_t (16, 24), frame (1, 8)] + outs
        w_refs = refs[:2 * n_layers:2]
        b_refs = refs[1:2 * n_layers:2]
        bones_ref = refs[2 * n_layers]
        frame_ref = refs[2 * n_layers + 1]
        xout_ref = refs[2 * n_layers + 2]
        tout_ref = refs[2 * n_layers + 3]
        valid_ref = refs[2 * n_layers + 4]
        active_ref = refs[2 * n_layers + 5]
        jac_ref = refs[2 * n_layers + 6] if want_jac else None

        coord_min = frame_ref[0, 0]
        coord_max = frame_ref[0, 1]
        center = frame_ref[0, 2:5].reshape(3, 1)
        ext = coord_max - coord_min
        # normalize: ((x - center - cmin + 0.05*ext)/ext/1.1 - 0.5)*2
        scale = 2.0 / (ext * 1.1)
        offset = (-center - coord_min + 0.05 * ext) * scale - 1.0  # (3, 1)

        x_bar = xbar_ref[:]                  # (3, T)
        bones_t = bones_ref[:]               # (16, 24)

        # hoisted per-tile weight splits for the bf16x3 matmuls (the
        # first layer stays plain f32: its K=3 contraction is free and
        # it touches the raw solver positions)
        if precision == 'split3':
            w_split = [split_f32(w_refs[i][:]) for i in range(n_layers)]
        elif precision == 'bf16':
            w_bf16 = [w_refs[i][:].astype(jnp.bfloat16)
                      for i in range(n_layers)]

        def layer_dot(i, h):
            if precision == 'split3' and i > 0:
                return dot_split3(w_split[i][0], w_split[i][1], h)
            if precision == 'bf16' and i > 0:
                # single-pass bf16 MXU matmul, f32 accumulation. NOT
                # result-equivalent: hidden activations round to bf16,
                # so the skinning residual floors at ~1e-3 — usable only
                # with a relaxed cvg_thresh (ROADMAP item 3 study).
                return jnp.dot(w_bf16[i], h.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
            return jnp.dot(w_refs[i][:], h,
                           preferred_element_type=jnp.float32)

        def fwd(x):
            xn = x * scale + offset
            h = xn
            for i in range(n_layers - 1):
                h = _softplus100(layer_dot(i, h) + b_refs[i][:])
            logits = layer_dot(n_layers - 1, h) + b_refs[-1][:]
            w = _hier_softmax_rows(logits * softmax_scale)     # (24, T)
            T16 = jnp.dot(bones_t, w,
                          preferred_element_type=jnp.float32)  # (16, T)
            xb = jnp.concatenate([
                T16[0:1] * x[0:1] + T16[1:2] * x[1:2]
                + T16[2:3] * x[2:3] + T16[3:4],
                T16[4:5] * x[0:1] + T16[5:6] * x[1:2]
                + T16[6:7] * x[2:3] + T16[7:8],
                T16[8:9] * x[0:1] + T16[9:10] * x[1:2]
                + T16[10:11] * x[2:3] + T16[11:12]], axis=0)
            return xb - x_bar, T16

        x = x0_ref[:]                        # (3, T)
        mask0 = mask_ref[:] > 0              # (1, T)
        gx, T16_at_x0 = fwd(x)
        T16_0 = t0_ref[:]                    # (16, T)

        # init inverse Jacobian from the skinning-net-blended rotation at
        # x0 (reference `root_finding_utils.py:281-283`)
        J0 = jnp.concatenate([T16_at_x0[0:3], T16_at_x0[4:7],
                              T16_at_x0[8:11]], axis=0)
        J_inv = _inv3x3_rows(J0)

        update = -_mat3_vec_rows(J_inv, gx)
        gx_norm = jnp.sqrt(jnp.sum(gx * gx, axis=0, keepdims=True))

        # whole per-point state as ONE (40, T) array: a single wide carry
        # keeps Mosaic's layout inference happy and every row op on full
        # lanes. rows: 0:3 x | 3:6 gx | 6:15 J_inv | 15:18 update |
        # 18:21 x_opt | 21:37 t_opt | 37 gn_opt | 38 active | 39 pad
        T = x.shape[1]
        state0 = jnp.concatenate([
            x, gx, J_inv, update, x, T16_0, gx_norm,
            mask0.astype(jnp.float32),
            jnp.zeros((1, T), jnp.float32)], axis=0)

        def cond(carry):
            i, st = carry
            return (i < max_steps) & (jnp.max(st[38:39, :]) > 0.0)

        def body(carry):
            i, st = carry
            x = st[0:3]
            gx = st[3:6]
            J_inv = st[6:15]
            update = st[15:18]
            x_opt = st[18:21]
            t_opt = st[21:37]
            gn_opt = st[37:38]
            m = st[38:39] > 0.0

            delta_x = jnp.where(m, update, 0.0)
            x_new = x + delta_x
            gx_new_full, T16 = fwd(x_new)
            gx_new = jnp.where(m, gx_new_full, gx)
            delta_gx = gx_new - gx

            gn = jnp.sqrt(jnp.sum(gx_new * gx_new, axis=0, keepdims=True))
            better = (gn < gn_opt) & m
            x_opt = jnp.where(better, x_new, x_opt)
            t_opt = jnp.where(better, T16, t_opt)
            gn_opt = jnp.where(better, gn, gn_opt)

            active_new = (gn_opt > cvg_thresh) & (gn < dvg_thresh) & m

            # vT = delta_x^T @ J_inv  (row-vector times 3x3)
            vT = jnp.concatenate([
                delta_x[0:1] * J_inv[0:1] + delta_x[1:2] * J_inv[3:4]
                + delta_x[2:3] * J_inv[6:7],
                delta_x[0:1] * J_inv[1:2] + delta_x[1:2] * J_inv[4:5]
                + delta_x[2:3] * J_inv[7:8],
                delta_x[0:1] * J_inv[2:3] + delta_x[1:2] * J_inv[5:6]
                + delta_x[2:3] * J_inv[8:9]], axis=0)
            a = delta_x - _mat3_vec_rows(J_inv, delta_gx)
            bdot = jnp.sum(vT * delta_gx, axis=0, keepdims=True)
            bdot = jnp.where(bdot >= 0, bdot + eps, bdot - eps)
            u = a / bdot
            outer = jnp.concatenate([
                u[0:1] * vT, u[1:2] * vT, u[2:3] * vT], axis=0)
            J_inv_new = J_inv + jnp.where(m, outer, 0.0)
            update_new = -_mat3_vec_rows(J_inv_new, gx_new)

            st_new = jnp.concatenate([
                x_new, gx_new, J_inv_new, update_new, x_opt, t_opt, gn_opt,
                active_new.astype(jnp.float32),
                jnp.zeros((1, x_new.shape[1]), jnp.float32)], axis=0)
            return (i + 1, st_new)

        _, st = jax.lax.while_loop(cond, body,
                                   (jnp.zeros((), jnp.int32), state0))
        x_opt = st[18:21]
        t_opt = st[21:37]
        gn_opt = st[37:38]

        valid = (gn_opt < cvg_thresh) & mask0
        x_out = jnp.where(mask0, x_opt, x0_ref[:])
        xout_ref[:] = x_out
        tout_ref[:] = jnp.where(mask0, t_opt, t0_ref[:])
        valid_ref[:] = valid.astype(jnp.float32)
        # still-active at loop exit (neither converged nor diverge-frozen)
        # — the straggler set a phase-2 resolve re-solves
        active_ref[:] = st[38:39]

        if want_jac:
            # exact d fwd_skin / d x_hat at the converged root, via three
            # in-kernel jvp tangent chains through the same fwd — feeds
            # the renderer's implicit-diff correction so the XLA graph
            # needs only the differentiable PRIMAL pass (the Jacobian is
            # stop-gradded there anyway; round 4). Row layout: k*3+i =
            # d xb_i / d x_k (column-major columns of J).
            T = x_out.shape[1]
            fwd_xb = lambda x: fwd(x)[0]     # xb - x_bar: same derivative
            cols = []
            for k in range(3):
                t_in = jnp.concatenate(
                    [jnp.ones((1, T)) if i == k else jnp.zeros((1, T))
                     for i in range(3)], axis=0)
                _, dxb = jax.jvp(fwd_xb, (x_out,), (t_in,))
                cols.append(dxb)             # (3, T)
            jac_ref[:] = jnp.concatenate(cols, axis=0)   # (9, T)

    return kernel


def _on_tpu() -> bool:
    return jax.devices()[0].platform == 'tpu'


@partial(jax.jit, static_argnames=('tile', 'max_steps', 'cvg_thresh',
                                   'softmax_scale', 'interpret',
                                   'precision', 'want_jac'))
def corr_search_pallas_t(x_bar, x0, T0_16, mask, skin_weights, skin_biases,
                         bones16, coord_min, coord_max, center,
                         tile: int = 2048, max_steps: int = 50,
                         cvg_thresh: float = 1e-5,
                         softmax_scale: float = 20.0,
                         interpret: bool | None = None,
                         precision: str = 'f32',
                         want_jac: bool = False):
    """Fused Broyden canonical-correspondence search, (k, T) layout.

    Args:
      x_bar/x0: (N, 3) targets and inits (metric canonical space);
      T0_16: (N, 16) initial blended transforms; mask: (N,) active;
      skin_weights: list of dense (out, in) skinning MLP weights (weight
        norm already collapsed); skin_biases: list of (out,);
      bones16: (24, 16); coord_min/coord_max: scalars; center: (3,).
      precision: 'f32' (default), 'split3' (hidden/final MLP matmuls
        as three bf16 MXU passes, f32-exact; see ops/pallas/precision.py)
        or 'bf16' (single-pass bf16 matmuls, f32 accumulation — NOT
        result-equivalent; hidden activations round to bf16 so the
        residual floors at ~1e-3, needs a relaxed cvg_thresh).
        BOTH are MEASURED NEGATIVES on v5e at forced 50 iterations x
        262k points: split3 78.0 ms and single-pass bf16 59.4 ms vs
        58.4 ms plain f32 — this kernel is not matmul-bound (isolated
        chained (128,128)x(128,2048) dots DO run 2x faster in bf16: 94
        vs 47 TFLOP/s); the MLP dots fully overlap the VPU Broyden
        algebra, so cheaper matmuls buy nothing and split3's extra
        passes + casts add latency. Closes ROADMAP item 3 (bf16
        solver) without the relaxed-threshold semantics change. Kept
        as options for future matmul-bound kernels.
    Returns (x_hat (N, 3), T16 (N, 16), valid (N,), active (N,))
    — `active` marks points still iterating at max_steps
    (straggler-resolve input, ray_tracing._corr_solve_split).
    want_jac=True appends jac (N, 3, 3): the EXACT d fwd_skin/d x_hat
    at the returned root (three in-kernel jvp tangent chains), feeding
    the renderer's implicit-diff correction without the three XLA
    tangent passes (the Jacobian is stop-gradded there).
    """
    if interpret is None:
        interpret = not _on_tpu()
    n = x_bar.shape[0]
    assert n % tile == 0, (n, tile)
    n_layers = len(skin_weights)
    frame_vec = jnp.concatenate(
        [jnp.reshape(coord_min, (1,)), jnp.reshape(coord_max, (1,)),
         jnp.reshape(center, (3,)), jnp.zeros((3,))]).reshape(1, 8)

    operands = [x_bar.T, x0.T, T0_16.T,
                mask.astype(jnp.float32).reshape(1, n)]
    in_specs = [
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    for w, b in zip(skin_weights, skin_biases):
        b2 = b.reshape(-1, 1)
        operands += [w, b2]
        in_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)]
    operands += [bones16.T, frame_vec]
    in_specs += [
        pl.BlockSpec((16, 24), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(frame_vec.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM)]

    out_specs = [
        pl.BlockSpec((3, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((3, n), jnp.float32),
        jax.ShapeDtypeStruct((16, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
    ]
    if want_jac:
        out_specs.append(pl.BlockSpec((9, tile), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((9, n), jnp.float32))
    out = pl.pallas_call(
        _make_kernel(n_layers, max_steps, cvg_thresh, 1.0, 1e-6,
                     softmax_scale, precision=precision,
                     want_jac=want_jac),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands)
    x_hat_t, T16_t, valid, active = out[:4]
    res = (x_hat_t.T, T16_t.T, valid[0] > 0.5, active[0] > 0.5)
    if want_jac:
        # (9, T) rows k*3+i = d xb_i/d x_k -> (N, 3, 3) with [i, k]
        jac = out[4].T.reshape(n, 3, 3).transpose(0, 2, 1)
        res = res + (jac,)
    return res


def skinning_dense_params(params, cfg):
    """Collapse a kernel-compatible skinning MLP to dense (out, in)
    weights + biases; returns None when the architecture uses features
    the kernel doesn't implement (PE, skips, cond inputs, plain-softmax
    24-out heads). cfg is an `nn.skinning.SkinningConfig`."""
    if (getattr(cfg, 'multires', 0) > 0 or getattr(cfg, 'skip_in', ())
            or getattr(cfg, 'cond_in', ()) or getattr(cfg, 'd_out', 25) != 25):
        return None
    wts, bs = [], []
    for lyr in params['layers']:
        if 'v' in lyr:
            v = lyr['v']
            w = lyr['g'] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
        else:
            w = lyr['w']
        wts.append(w)
        bs.append(lyr['b'])
    return tuple(wts), tuple(bs)


def _make_jac_kernel(n_layers, softmax_scale):
    """One-shot exact d fwd_skin / d x_hat at given points — the
    `want_jac` tangent chains WITHOUT the Broyden loop around them.

    Rationale (round-4 A/B, PERF.md): emitting J from inside the corr
    solve is a measured negative — the solver kernel is VPU-bound and
    the tangent chains triple its non-overlapped work PER ITERATION.
    Standing alone the chains run ONCE over the (packed) shading points,
    entirely in VMEM, replacing the three XLA tangent passes of
    `render/renderer.py:shade_samples` (cfg.idiff_standalone_jac)."""
    def kernel(x_ref, *refs):
        w_refs = refs[:2 * n_layers:2]
        b_refs = refs[1:2 * n_layers:2]
        bones_ref = refs[2 * n_layers]
        frame_ref = refs[2 * n_layers + 1]
        jac_ref = refs[2 * n_layers + 2]

        coord_min = frame_ref[0, 0]
        coord_max = frame_ref[0, 1]
        center = frame_ref[0, 2:5].reshape(3, 1)
        ext = coord_max - coord_min
        scale = 2.0 / (ext * 1.1)
        offset = (-center - coord_min + 0.05 * ext) * scale - 1.0

        bones_t = bones_ref[:]               # (16, 24)
        x = x_ref[:]                         # (3, T)
        T = x.shape[1]

        def fwd(xp):
            xn = xp * scale + offset
            h = xn
            for i in range(n_layers - 1):
                h = _softplus100(
                    jnp.dot(w_refs[i][:], h,
                            preferred_element_type=jnp.float32)
                    + b_refs[i][:])
            logits = jnp.dot(w_refs[n_layers - 1][:], h,
                             preferred_element_type=jnp.float32) \
                + b_refs[-1][:]
            w24 = _hier_softmax_rows(logits * softmax_scale)
            T16 = jnp.dot(bones_t, w24,
                          preferred_element_type=jnp.float32)
            return jnp.concatenate([
                T16[0:1] * xp[0:1] + T16[1:2] * xp[1:2]
                + T16[2:3] * xp[2:3] + T16[3:4],
                T16[4:5] * xp[0:1] + T16[5:6] * xp[1:2]
                + T16[6:7] * xp[2:3] + T16[7:8],
                T16[8:9] * xp[0:1] + T16[9:10] * xp[1:2]
                + T16[10:11] * xp[2:3] + T16[11:12]], axis=0)

        # one linearize: the primal chain runs once, each basis tangent
        # is a cheap forward re-sweep of the stored linearization
        _, f_lin = jax.linearize(fwd, x)
        cols = []
        for k in range(3):
            t_in = jnp.concatenate(
                [jnp.ones((1, T)) if i == k else jnp.zeros((1, T))
                 for i in range(3)], axis=0)
            cols.append(f_lin(t_in))         # (3, T)
        jac_ref[:] = jnp.concatenate(cols, axis=0)   # rows k*3+i
    return kernel


@partial(jax.jit, static_argnames=('tile', 'softmax_scale', 'interpret'))
def skinning_jac_pallas(x_hat, skin_weights, skin_biases, bones16,
                        coord_min, coord_max, center,
                        tile: int = 1024, softmax_scale: float = 20.0,
                        interpret: bool | None = None):
    """Exact forward-skinning Jacobian d xb / d x_hat at (N, 3) metric
    canonical points, as one fused (k, T)-layout Pallas pass. Pads N to
    a tile multiple. Non-differentiable (callers stop-grad the J anyway,
    `renderer.py:shade_samples`).

    tile 1024: unlike the solver kernel (tile 2048, transient state),
    the in-kernel linearize keeps every primal intermediate resident for
    the three tangent sweeps — measured 20.5 MB scoped VMEM at tile 2048
    on v5e (> the 16 MB limit), fits at 1024."""
    if interpret is None:
        interpret = not _on_tpu()
    n = x_hat.shape[0]
    pad = (-n) % tile
    xp = jnp.pad(x_hat, ((0, pad), (0, 0))) if pad else x_hat
    np_ = n + pad
    n_layers = len(skin_weights)
    frame_vec = jnp.concatenate(
        [jnp.reshape(coord_min, (1,)), jnp.reshape(coord_max, (1,)),
         jnp.reshape(center, (3,)), jnp.zeros((3,))]).reshape(1, 8)

    operands = [xp.T]
    in_specs = [pl.BlockSpec((3, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for w, b in zip(skin_weights, skin_biases):
        b2 = b.reshape(-1, 1)
        operands += [w, b2]
        in_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)]
    operands += [bones16.T, frame_vec]
    in_specs += [
        pl.BlockSpec((16, 24), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(frame_vec.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM)]
    out = pl.pallas_call(
        _make_jac_kernel(n_layers, softmax_scale),
        grid=(np_ // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((9, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, np_), jnp.float32),
        interpret=interpret,
    )(*operands)
    # (9, T) rows k*3+i = d xb_i/d x_k -> (N, 3, 3) as [i, k]
    return out.T[:n].reshape(n, 3, 3).transpose(0, 2, 1)
