"""Pallas TPU kernel pair: fused forward+BACKWARD differentiable shading.

The training-step profile (PERF.md round 2b) attributed 60 of 128 ms to
the reverse-over-forward SIREN shading: XLA materializes the
(n_points, 3, hidden) jacfwd tangent chain plus every hidden activation
in HBM as backward residuals (~670 GB/s of f32 traffic). This module
makes the whole differentiable shading primitive

    (generated-SIREN params, points) -> (sdf, features, d(sdf)/dx)

a `jax.custom_vjp` whose forward is the existing fused eval kernel
(`ops/pallas/shade_kernel.py`) and whose backward is ONE Pallas kernel
that *recomputes* the primal + normal chains per point-tile in VMEM and
applies hand-written cotangents — including the second-order sine terms
that arise because the normal is itself a derivative. Nothing of the
tangent chain ever touches HBM; HBM traffic is O(points) in/out plus one
weight read.

Math (per point; layer i = 0..L-2 sine layers, final linear L-1):
    z_i = W_i h_i + b_i;  u_i = f_i*z_i + p_i (FiLM);  h_{i+1} = sin(30 u_i)
    c_i = 30 f_i cos(30 u_i)                  (sine-derivative factors)
    out = W_{L-1} h_{L-1} + b_{L-1};  feat = h_{L-1}
    normal n computed reverse:  g_{L-1} = W_{L-1}[0]; a_i = g_{i+1} ∘ c_i;
    g_i = W_i^T a_i;  n = g_0.
Given cotangents (ĝ_out, ĝ_feat, ĝ_n), the adjoint of the reverse chain
is a FORWARD chain seeded with t_0 = ĝ_n:
    â_i = W_i t_i;   W̄_i += a_i ⊗ t_i;   c̄_i = g_{i+1} ∘ â_i;
    t_{i+1} = c_i ∘ â_i;   W̄_{L-1}[0] += Σ t_{L-1}
    f̄_i += 30 cos(30u_i) ∘ c̄_i;   ū_i^{(c)} = -900 f_i sin(30u_i) ∘ c̄_i
followed by the ordinary primal backward with the extra ū^{(c)} term:
    h̄_{L-1} = W_{L-1}^T ĝ_out + ĝ_feat
    ū_i = 30 cos(30u_i) ∘ h̄_{i+1} + ū_i^{(c)};  z̄_i = f_i ∘ ū_i
    f̄_i += z_i ∘ ū_i;  p̄_i += ū_i;  W̄_i += z̄_i ⊗ h_i;  b̄_i += z̄_i
    h̄_i = W_i^T z̄_i;   x̄ = h̄_0.

Weight/bias/FiLM gradients accumulate across the (sequential) TPU grid
in constant-index VMEM output blocks, zero-initialized at grid step 0.

Replaces the shading hot loop of the reference
(`im2mesh/metaavatar_render/renderer/implicit_differentiable_renderer.py:336-361`,
whose torch autograd holds the same residuals in GPU global memory).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arah_tpu.nn.siren import GeneratedMLP
from arah_tpu.ops.pallas.shade_kernel import _dot, _dot_nt, _shade_pallas


def _shade_bwd_kernel(n_layers: int, use_film: bool, bf16: bool,
                      resid_bf16: bool, x_ref, *refs):
    """refs: [W^T x L (in,out)], [b x L], [W x L (out,in)],
    (freqs, phases if film), g_out, g_feat, g_n;
    outs: dx, [dW x L], [db x L (1,out)], (dfreqs, dphases if film)."""
    L = n_layers
    w_t = refs[:L]
    b = refs[L:2 * L]
    w_o = refs[2 * L:3 * L]
    idx = 3 * L
    if use_film:
        freqs_ref, phases_ref = refs[idx], refs[idx + 1]
        idx += 2
    gout_ref, gfeat_ref, gn_ref = refs[idx:idx + 3]
    idx += 3
    dx_ref = refs[idx]
    idx += 1
    dW = refs[idx:idx + L]
    db = refs[idx + L:idx + 2 * L]
    idx += 2 * L
    if use_film:
        dfr_ref, dph_ref = refs[idx], refs[idx + 1]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for r in list(dW) + list(db):
            r[:] = jnp.zeros(r.shape, r.dtype)
        if use_film:
            dfr_ref[:] = jnp.zeros(dfr_ref.shape, dfr_ref.dtype)
            dph_ref[:] = jnp.zeros(dph_ref.shape, dph_ref.dtype)

    tile = x_ref.shape[0]
    hidden = w_o[L - 1].shape[1]
    out_dim = w_o[L - 1].shape[0]
    # resid_bf16: residents (h/C/z/c/g/a/ubar_c lists) are STORED bf16,
    # halving scoped VMEM so bigger point tiles fit; the running chain
    # values and every cotangent product stay f32 (bf16 * f32 promotes).
    st = (lambda v: v.astype(jnp.bfloat16)) if resid_bf16 else (lambda v: v)

    # ---- recompute the primal chain (residuals stay in VMEM)
    h_cur = x_ref[:]
    h = [h_cur]
    C = []          # cos(30 u_i)
    z = []          # pre-FiLM linear outputs (needed for dfreqs)
    c = []          # 30 f_i cos(30 u_i)
    for i in range(L - 1):
        zi = _dot(h_cur, w_t[i][:], bf16) + b[i][:]
        if use_film:
            f = freqs_ref[i]
            u = f * zi + phases_ref[i]
            z.append(st(zi))
        else:
            u = zi
        Ci = jnp.cos(30.0 * u)
        C.append(st(Ci))
        c.append(st(30.0 * f * Ci if use_film else 30.0 * Ci))
        h_cur = jnp.sin(30.0 * u)
        h.append(st(h_cur))
    feat = h[L - 1]

    # ---- recompute the reverse normal chain, keeping g_{i+1} and a_i
    g_list = [None] * (L - 1)
    a_list = [None] * (L - 1)
    gcur = jnp.broadcast_to(w_o[L - 1][0:1, :], (tile, hidden))
    for i in range(L - 2, -1, -1):
        g_list[i] = st(gcur)
        ai = gcur * c[i]                       # f32 (promotion)
        a_list[i] = st(ai)
        gcur = _dot(ai, w_o[i][:], bf16)

    # ---- adjoint of the reverse chain: forward sweep seeded with g_n
    t = gn_ref[:]
    ubar_c = [None] * (L - 1)
    for i in range(L - 1):
        abar = _dot(t, w_t[i][:], bf16)
        dW[i][:] = dW[i][:] + _dot_nt(a_list[i], t, bf16)
        cbar = g_list[i] * abar
        if use_film:
            f = freqs_ref[i]
            # f32 scalar: a weak-typed `30.0 * C[i]` would compute (and
            # round) in bf16 first when resid_bf16 stores C in bf16
            dfr_ref[i, :] = dfr_ref[i, :] + jnp.sum(
                jnp.float32(30.0) * C[i] * cbar, axis=0)
            ubar_c[i] = st(-900.0 * f * h[i + 1] * cbar)
        else:
            ubar_c[i] = st(-900.0 * h[i + 1] * cbar)
        t = c[i] * abar

    # ---- output-layer cotangents
    gout = gout_ref[:]
    dWl = _dot_nt(gout, feat, bf16)                    # (out_dim, hidden)
    sum_t = jnp.sum(t, axis=0, keepdims=True)          # w_sdf = row 0
    if out_dim == 1:
        dWl = dWl + sum_t
    else:
        row0 = jax.lax.broadcasted_iota(jnp.int32, dWl.shape, 0) == 0
        dWl = dWl + jnp.where(row0, sum_t, 0.0)
    dW[L - 1][:] = dW[L - 1][:] + dWl
    db[L - 1][:] = db[L - 1][:] + jnp.sum(gout, axis=0, keepdims=True)
    hbar = _dot(gout, w_o[L - 1][:], bf16) + gfeat_ref[:]

    # ---- primal backward
    for i in range(L - 2, -1, -1):
        ubar = jnp.float32(30.0) * C[i] * hbar + ubar_c[i]
        if use_film:
            f = freqs_ref[i]
            dfr_ref[i, :] = dfr_ref[i, :] + jnp.sum(z[i] * ubar, axis=0)
            dph_ref[i, :] = dph_ref[i, :] + jnp.sum(ubar, axis=0)
            zbar = f * ubar
        else:
            zbar = ubar
        dW[i][:] = dW[i][:] + _dot_nt(zbar, h[i], bf16)
        db[i][:] = db[i][:] + jnp.sum(zbar, axis=0, keepdims=True)
        hbar = _dot(zbar, w_o[i][:], bf16)
    dx_ref[:] = hbar


@partial(jax.jit,
         static_argnames=('tile', 'bf16', 'resid_bf16', 'interpret'))
def _shade_bwd_pallas(gen: GeneratedMLP, x: jax.Array,
                      g_out: jax.Array, g_feat: jax.Array, g_n: jax.Array,
                      tile: int, bf16: bool, resid_bf16: bool,
                      interpret: bool):
    n, d_in = x.shape
    assert n % tile == 0, (n, tile)
    L = len(gen.weights)
    use_film = len(gen.freqs) > 0
    out_dim = gen.weights[-1].shape[0]
    hidden = gen.weights[-1].shape[1]

    rep = lambda s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                 memory_space=pltpu.VMEM)
    row = lambda d: pl.BlockSpec((tile, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    operands = [x]
    in_specs = [row(d_in)]
    for w in gen.weights:
        wt = w.T
        operands.append(wt)
        in_specs.append(rep(wt.shape))
    for bias in gen.biases:
        operands.append(bias)
        in_specs.append(rep(bias.shape))
    for w in gen.weights:
        operands.append(w)
        in_specs.append(rep(w.shape))
    if use_film:
        freqs = jnp.stack(gen.freqs)
        phases = jnp.stack(gen.phases)
        operands += [freqs, phases]
        in_specs += [rep(freqs.shape), rep(phases.shape)]
    operands += [g_out, g_feat, g_n]
    in_specs += [row(out_dim), row(hidden), row(d_in)]

    out_specs = [row(d_in)]
    out_shape = [jax.ShapeDtypeStruct((n, d_in), jnp.float32)]
    for w in gen.weights:
        out_specs.append(rep(w.shape))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for bias in gen.biases:
        out_specs.append(rep((1, bias.shape[0])))
        out_shape.append(jax.ShapeDtypeStruct((1, bias.shape[0]),
                                              jnp.float32))
    if use_film:
        out_specs += [rep((L - 1, hidden)), rep((L - 1, hidden))]
        out_shape += [jax.ShapeDtypeStruct((L - 1, hidden), jnp.float32)] * 2

    return pl.pallas_call(
        partial(_shade_bwd_kernel, L, use_film, bf16, resid_bf16),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == 'tpu'


@lru_cache(maxsize=None)
def _make_op(tile: int, tile_bwd: int, bf16: bool, resid_bf16: bool,
             interpret: bool):
    """custom_vjp op (gen, x) -> (out, feat, d(out[:,0])/dx).

    Forward = the fused eval kernel; backward = _shade_bwd_kernel.
    Padding rows (zero x, zero cotangents) contribute exactly zero to
    every gradient: all cotangent chains are seeded from the padded-zero
    (g_out, g_feat, g_n) rows.
    """

    def _fwd_call(gen, x):
        n = x.shape[0]
        pad = (-n) % tile
        xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
        out, feat, grad = _shade_pallas(gen, xp, tile, bf16, resid_bf16,
                                        interpret)
        return out[:n], feat[:n], grad[:n]

    @jax.custom_vjp
    def op(gen, x):
        return _fwd_call(gen, x)

    def fwd(gen, x):
        return _fwd_call(gen, x), (gen, x)

    def bwd(res, cts):
        gen, x = res
        g_out, g_feat, g_n = (c.astype(jnp.float32) for c in cts)
        n = x.shape[0]
        pad = (-n) % tile_bwd
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            g_out = jnp.pad(g_out, ((0, pad), (0, 0)))
            g_feat = jnp.pad(g_feat, ((0, pad), (0, 0)))
            g_n = jnp.pad(g_n, ((0, pad), (0, 0)))
        grads = _shade_bwd_pallas(gen, x, g_out, g_feat, g_n,
                                  tile_bwd, bf16, resid_bf16, interpret)
        L = len(gen.weights)
        dx = grads[0][:n]
        dW = tuple(grads[1:1 + L])
        db = tuple(g[0] for g in grads[1 + L:1 + 2 * L])
        if len(gen.freqs) > 0:
            dfr, dph = grads[1 + 2 * L], grads[2 + 2 * L]
            dfreqs = tuple(dfr[i] for i in range(L - 1))
            dphases = tuple(dph[i] for i in range(L - 1))
        else:
            dfreqs, dphases = (), ()
        return GeneratedMLP(dW, db, dfreqs, dphases), dx

    op.defvjp(fwd, bwd)
    return op


@lru_cache(maxsize=None)
def _make_op_xla(bf16: bool):
    """Pure-XLA twin of the fused op: same hand-derived forward (primal +
    reverse normal chain) and backward cotangent math as the Pallas
    kernels, written over full (N, .) arrays with plain jnp.

    Two uses: (1) CPU/non-TPU backends — it avoids materializing the
    (N, 3, hidden) jacfwd tangent chain that dominates the autodiff
    path's memory traffic there too; (2) an independent reference for the
    kernel tests. Values/gradients match the autodiff path to float
    reassociation (tests/test_pallas.py::TestShadeGradKernel).
    """

    def _fwd_math(gen, x):
        L = len(gen.weights)
        use_film = len(gen.freqs) > 0
        h = [x]
        C, z, c = [], [], []
        for i in range(L - 1):
            zi = _dot(h[i], gen.weights[i].T, bf16) + gen.biases[i]
            u = gen.freqs[i] * zi + gen.phases[i] if use_film else zi
            z.append(zi)
            Ci = jnp.cos(30.0 * u)
            C.append(Ci)
            c.append(30.0 * gen.freqs[i] * Ci if use_film else 30.0 * Ci)
            h.append(jnp.sin(30.0 * u))
        out = _dot(h[L - 1], gen.weights[L - 1].T, bf16) + gen.biases[L - 1]
        # reverse chain for n = d(out[:, 0])/dx
        g_list = [None] * (L - 1)
        a_list = [None] * (L - 1)
        gcur = jnp.broadcast_to(gen.weights[L - 1][0:1, :],
                                (x.shape[0], gen.weights[L - 1].shape[1]))
        for i in range(L - 2, -1, -1):
            g_list[i] = gcur
            a_list[i] = gcur * c[i]
            gcur = _dot(a_list[i], gen.weights[i], bf16)
        return out, h, C, z, c, g_list, a_list, gcur

    @jax.custom_vjp
    def op(gen, x):
        out, h, *_, n = _fwd_math(gen, x)
        return out, h[-1], n

    def fwd(gen, x):
        return op(gen, x), (gen, x)

    def bwd(res, cts):
        gen, x = res
        gout, gfeat, gn = (ct.astype(jnp.float32) for ct in cts)
        L = len(gen.weights)
        use_film = len(gen.freqs) > 0
        _, h, C, z, c, g_list, a_list, _ = _fwd_math(gen, x)
        dW = [None] * L
        db = [None] * L
        dfr = [None] * (L - 1)
        dph = [None] * (L - 1)
        # adjoint of the reverse chain: forward sweep seeded with gn
        t = gn
        ubar_c = [None] * (L - 1)
        for i in range(L - 1):
            abar = _dot(t, gen.weights[i].T, bf16)
            dW[i] = _dot_nt(a_list[i], t, bf16)
            cbar = g_list[i] * abar
            if use_film:
                dfr[i] = jnp.sum(30.0 * C[i] * cbar, axis=0)
                ubar_c[i] = -900.0 * gen.freqs[i] * h[i + 1] * cbar
            else:
                ubar_c[i] = -900.0 * h[i + 1] * cbar
            t = c[i] * abar
        dWl = _dot_nt(gout, h[L - 1], bf16)
        sum_t = jnp.sum(t, axis=0, keepdims=True)
        if gen.weights[L - 1].shape[0] == 1:
            dWl = dWl + sum_t
        else:
            dWl = dWl.at[0, :].add(sum_t[0])
        dW[L - 1] = dWl
        db[L - 1] = jnp.sum(gout, axis=0)
        hbar = _dot(gout, gen.weights[L - 1], bf16) + gfeat
        for i in range(L - 2, -1, -1):
            ubar = 30.0 * C[i] * hbar + ubar_c[i]
            if use_film:
                dfr[i] = dfr[i] + jnp.sum(z[i] * ubar, axis=0)
                dph[i] = jnp.sum(ubar, axis=0)
                zbar = gen.freqs[i] * ubar
            else:
                zbar = ubar
            dW[i] = dW[i] + _dot_nt(zbar, h[i], bf16)
            db[i] = jnp.sum(zbar, axis=0)
            hbar = _dot(zbar, gen.weights[i], bf16)
        dfreqs = tuple(dfr) if use_film else ()
        dphases = tuple(dph) if use_film else ()
        return GeneratedMLP(tuple(dW), tuple(db), dfreqs, dphases), hbar

    op.defvjp(fwd, bwd)
    return op


def siren_shade_grad_xla(gen: GeneratedMLP, x: jax.Array,
                         bf16: bool = False):
    """XLA (any-backend) fused shading op: (out, feat, d(out[:,0])/dx)
    with the hand-written VJP — no (N, 3, hidden) tangent chain."""
    return _make_op_xla(bf16)(gen, x)


def siren_shade_grad(gen: GeneratedMLP, x: jax.Array, tile: int = 1024,
                     tile_bwd: int = 128, bf16: bool = False,
                     resid_bf16: bool = False,
                     interpret: bool | None = None):
    """Differentiable fused shading: (N, 3) points -> (sdf (N, out_dim),
    features (N, hidden), d(sdf)/dx (N, 3)), with a fused Pallas VJP
    producing cotangents for every generated-SIREN leaf AND the points.

    Training-path replacement for `jax.vmap(jax.jacfwd(sdf_feat))`
    (`render/renderer.py:shade_samples`). Outputs are f32 (activations are
    *computed* bf16-operand/f32-accumulate under `bf16`, but stored f32 —
    one rounding step fewer than the XLA `bf16_shading` storage path).
    """
    if interpret is None:
        interpret = not _on_tpu()
    return _make_op(tile, tile_bwd, bf16, resid_bf16, interpret)(gen, x)
