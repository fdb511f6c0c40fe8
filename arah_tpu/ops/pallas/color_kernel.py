"""Pallas TPU kernel pair: fused differentiable color-MLP shading.

The round-4 attributed profile (PERF.md / ROADMAP #2) puts the color
stage at ~15-20 ms of the 219 ms train step, including ~5 ms assembling
the (n_points, ~545) input concat. The XLA graph materializes in HBM:
the (N, d0) input block (built from a concat of points / PE'd view dirs
/ normals / SDF features / a broadcast pose row), the same block AGAIN
at the skip layer, and every inter-layer activation as backward
residuals. All of that is O(N * hidden) round-trip traffic for a plain
5x256 ReLU MLP.

This module makes the whole stage one `jax.custom_vjp` primitive

    (split weights, biases, small, feats, pose) -> rgb

whose forward is ONE Pallas kernel (inputs stream tile-by-tile, the
input block is never materialized: each layer's matmul is computed as
per-component partial dots straight from the component refs, with the
(1, P) pose row broadcast in-register) and whose backward is ONE Pallas
kernel that recomputes the forward chain per tile in VMEM and applies
the standard ReLU-MLP cotangents. No activation or input block ever
touches HBM; traffic is O(N * (S + F + 3)) in/out plus one weight read
per grid pass.

The weight-norm reparametrization (g, v) -> W and the view-dir
positional encoding stay in XLA *outside* the primitive (tiny,
differentiable; autodiff carries the cotangents the kernels emit for W
back onto g and v). Unlike the XLA `fold_input` A/B (a measured
negative, `nn/color.py`), the per-component partial dots here read VMEM,
not HBM — splitting costs nothing and saves the concat entirely.

Replaces the rendering-network stage of the reference
(`im2mesh/metaavatar_render/models/decoder.py:10-124` feeding
`renderer/implicit_differentiable_renderer.py:336-361`).

Component layout (matching `nn/color.py::color_apply`'s concat order):
  x0    = [ small (S) | feats (F) | pose (P, broadcast row) ]
  skip  = [ x0 (d0)   | x (hidden/2) ]
where `small` = concat of the point-shaped narrow inputs (points,
PE'd view dirs, normals — per ColorConfig.mode) built by the caller.

ReLU subgradient at exactly 0 is taken as 0 (torch semantics; JAX's
`maximum` autodiff splits ties 0.5 — measure-zero with float inputs).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arah_tpu.ops.pallas.shade_kernel import _dot, _dot_nt


def _on_tpu() -> bool:
    return jax.devices()[0].platform == 'tpu'


def _relu(z):
    return jnp.maximum(z, 0.0)


def _parse_refs(specs, has_pose, refs):
    """Common ref-list parsing: [small, feats, (pose), Wt per (l, comp)]."""
    i = 0
    small_ref, feats_ref = refs[0], refs[1]
    i = 2
    pose_ref = None
    if has_pose:
        pose_ref = refs[i]
        i += 1
    wt = []
    for spec in specs:
        wt.append(refs[i:i + len(spec)])
        i += len(spec)
    return small_ref, feats_ref, pose_ref, wt, i


def _recompute_chain(specs, bf16, small_ref, feats_ref, pose_ref, wt, b,
                     want_hidden: bool):
    """Forward chain from the component refs. Returns (z_last, xs) where
    xs[l] is the post-ReLU input activation consumed by layer l's 'x'
    component (xs[0] unused)."""
    L = len(specs)
    xs = [None] * L
    x = None
    for l, spec in enumerate(specs):
        z = b[l][:]
        for k, name in enumerate(spec):
            if name == 'x':
                a = x
            elif name == 'small':
                a = small_ref[:]
            elif name == 'feats':
                a = feats_ref[:]
            else:
                a = pose_ref[:]                       # (1, P) row
            z = z + _dot(a, wt[l][k][:], bf16)
        if l < L - 1:
            x = _relu(z)
            if want_hidden:
                xs[l + 1] = x
    return z, xs


def _color_fwd_kernel(specs, has_pose, squeeze, bf16, *refs):
    small_ref, feats_ref, pose_ref, wt, i = _parse_refs(
        specs, has_pose, refs)
    b = refs[i:i + len(specs)]
    out_ref = refs[i + len(specs)]
    z, _ = _recompute_chain(specs, bf16, small_ref, feats_ref, pose_ref,
                            wt, b, want_hidden=False)
    out_ref[:] = jax.nn.sigmoid(z) if squeeze else z


def _color_bwd_kernel(specs, has_pose, squeeze, bf16, *refs):
    """ins: small, feats, (pose), [Wt (in_c, out) per (l, comp)],
    [Wo (out, in_c) per (l, comp)], [b x L], g_rgb;
    outs: dsmall, dfeats, (dpose (1, P)), [dW (in_c, out) per (l, comp)],
    [db (1, out) x L]. Weight/bias/pose grads accumulate across the
    sequential grid in constant-index VMEM blocks (zeroed at step 0)."""
    L = len(specs)
    small_ref, feats_ref, pose_ref, wt, i = _parse_refs(
        specs, has_pose, refs)
    n_w = sum(len(s) for s in specs)
    wo = []
    for spec in specs:
        wo.append(refs[i:i + len(spec)])
        i += len(spec)
    b = refs[i:i + L]
    g_ref = refs[i + L]
    i += L + 1
    dsmall_ref, dfeats_ref = refs[i], refs[i + 1]
    i += 2
    dpose_ref = None
    if has_pose:
        dpose_ref = refs[i]
        i += 1
    dW = []
    for spec in specs:
        dW.append(refs[i:i + len(spec)])
        i += len(spec)
    db = refs[i:i + L]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for per_layer in dW:
            for r in per_layer:
                r[:] = jnp.zeros(r.shape, r.dtype)
        for r in db:
            r[:] = jnp.zeros(r.shape, r.dtype)
        if has_pose:
            dpose_ref[:] = jnp.zeros(dpose_ref.shape, dpose_ref.dtype)

    # ---- recompute the forward chain (activations stay in VMEM)
    z_last, xs = _recompute_chain(specs, bf16, small_ref, feats_ref,
                                  pose_ref, wt, b, want_hidden=True)

    # ---- backward
    if squeeze:
        rgb = jax.nn.sigmoid(z_last)
        delta = g_ref[:] * rgb * (1.0 - rgb)
    else:
        delta = g_ref[:]
    dsmall = jnp.zeros(dsmall_ref.shape, jnp.float32)
    dfeats = jnp.zeros(dfeats_ref.shape, jnp.float32)
    for l in range(L - 1, -1, -1):
        colsum = jnp.sum(delta, axis=0, keepdims=True)     # (1, out)
        db[l][:] = db[l][:] + colsum
        dx = None
        for k, name in enumerate(specs[l]):
            if name == 'pose':
                # dW_pose = pose_row^T (x) colsum; dpose = colsum @ Wo
                dW[l][k][:] = dW[l][k][:] + _dot_nt(pose_ref[:], colsum,
                                                    bf16)
                dpose_ref[:] = dpose_ref[:] + _dot(colsum, wo[l][k][:],
                                                   bf16)
                continue
            if name == 'x':
                a = xs[l]
            elif name == 'small':
                a = small_ref[:]
            else:
                a = feats_ref[:]
            dW[l][k][:] = dW[l][k][:] + _dot_nt(a, delta, bf16)
            da = _dot(delta, wo[l][k][:], bf16)
            if name == 'x':
                dx = da
            elif name == 'small':
                dsmall = dsmall + da
            else:
                dfeats = dfeats + da
        if l > 0:
            # ReLU mask of the producing layer's output (post-ReLU > 0)
            delta = dx * (xs[l] > 0)
    dsmall_ref[:] = dsmall
    dfeats_ref[:] = dfeats


def _rep(s):
    return pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                        memory_space=pltpu.VMEM)


def _row(tile, d):
    return pl.BlockSpec((tile, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=('specs', 'squeeze', 'bf16', 'tile',
                                   'interpret'))
def _color_fwd_pallas(wt, b, small, feats, pose, specs, squeeze, bf16,
                      tile, interpret):
    n = small.shape[0]
    assert n % tile == 0, (n, tile)
    has_pose = pose is not None
    n_out = b[-1].shape[-1]

    operands = [small, feats]
    in_specs = [_row(tile, small.shape[1]), _row(tile, feats.shape[1])]
    if has_pose:
        operands.append(pose)
        in_specs.append(_rep(pose.shape))
    for w in wt:
        operands.append(w)
        in_specs.append(_rep(w.shape))
    for bias in b:
        operands.append(bias)
        in_specs.append(_rep(bias.shape))
    return pl.pallas_call(
        partial(_color_fwd_kernel, specs, has_pose, squeeze, bf16),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=_row(tile, n_out),
        out_shape=jax.ShapeDtypeStruct((n, n_out), jnp.float32),
        interpret=interpret,
    )(*operands)


@partial(jax.jit, static_argnames=('specs', 'squeeze', 'bf16', 'tile',
                                   'interpret'))
def _color_bwd_pallas(wt, b, small, feats, pose, g, specs, squeeze, bf16,
                      tile, interpret):
    n = small.shape[0]
    assert n % tile == 0, (n, tile)
    has_pose = pose is not None

    operands = [small, feats]
    in_specs = [_row(tile, small.shape[1]), _row(tile, feats.shape[1])]
    if has_pose:
        operands.append(pose)
        in_specs.append(_rep(pose.shape))
    for w in wt:
        operands.append(w)
        in_specs.append(_rep(w.shape))
    for w in wt:
        wo = w.T
        operands.append(wo)
        in_specs.append(_rep(wo.shape))
    for bias in b:
        operands.append(bias)
        in_specs.append(_rep(bias.shape))
    operands.append(g)
    in_specs.append(_row(tile, g.shape[1]))

    out_specs = [_row(tile, small.shape[1]), _row(tile, feats.shape[1])]
    out_shape = [jax.ShapeDtypeStruct((n, small.shape[1]), jnp.float32),
                 jax.ShapeDtypeStruct((n, feats.shape[1]), jnp.float32)]
    if has_pose:
        out_specs.append(_rep(pose.shape))
        out_shape.append(jax.ShapeDtypeStruct(pose.shape, jnp.float32))
    for w in wt:
        out_specs.append(_rep(w.shape))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for bias in b:
        out_specs.append(_rep(bias.shape))
        out_shape.append(jax.ShapeDtypeStruct(bias.shape, jnp.float32))
    return pl.pallas_call(
        partial(_color_bwd_kernel, specs, has_pose, squeeze, bf16),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands)


def _pad_rows(x, pad):
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


@lru_cache(maxsize=None)
def _make_op(specs, squeeze: bool, bf16: bool, tile: int, tile_bwd: int,
             interpret: bool):
    """custom_vjp op (wt, b, small, feats, pose) -> rgb.

    Padding rows (zero inputs, zero cotangents) contribute exactly zero
    to every gradient: delta is seeded from the padded-zero g rows (the
    sigmoid factor is finite), and the pose/weight/bias accumulations are
    all delta-weighted.
    """
    has_pose = any('pose' in s for s in specs)

    def _fwd_call(wt, b, small, feats, pose):
        n = small.shape[0]
        pad = (-n) % tile
        out = _color_fwd_pallas(
            wt, b, _pad_rows(small, pad), _pad_rows(feats, pad), pose,
            specs, squeeze, bf16, tile, interpret)
        return out[:n]

    @jax.custom_vjp
    def op(wt, b, small, feats, pose):
        return _fwd_call(wt, b, small, feats, pose)

    def fwd(wt, b, small, feats, pose):
        return _fwd_call(wt, b, small, feats, pose), \
            (wt, b, small, feats, pose)

    def bwd(res, g):
        wt, b, small, feats, pose = res
        n = small.shape[0]
        pad = (-n) % tile_bwd
        grads = _color_bwd_pallas(
            wt, b, _pad_rows(small, pad), _pad_rows(feats, pad), pose,
            _pad_rows(g.astype(jnp.float32), pad),
            specs, squeeze, bf16, tile_bwd, interpret)
        dsmall, dfeats = grads[0][:n], grads[1][:n]
        i = 2
        dpose = None
        if has_pose:
            dpose = grads[i]
            i += 1
        n_w = sum(len(s) for s in specs)
        dwt = tuple(grads[i:i + n_w])
        dbs = tuple(grads[i + n_w:i + n_w + len(specs)])
        return dwt, dbs, dsmall, dfeats, dpose

    op.defvjp(fwd, bwd)
    return op


def color_mlp_fused(weights, biases, small, feats, pose,
                    skips: tuple, squeeze_out: bool = True,
                    bf16: bool = False, tile: int = 512,
                    tile_bwd: int = 256,
                    interpret: bool | None = None):
    """Fused color MLP: rgb at N points.

    Args:
      weights: list of L dense (out, in) matrices (weight-norm already
        applied) with columns in `nn/color.py::color_apply`'s concat
        order — x0 = [small | feats | pose], skip input = [x0 | x].
      biases: list of L (out,) vectors.
      small: (N, S) concat of the narrow point-shaped inputs.
      feats: (N, F) SDF features.
      pose: (1, P) pose feature row or None.
      skips: layer indices whose input re-injects x0.

    The column split per layer happens here in XLA (differentiable
    slices; dW cotangents flow back through them onto the weight-norm
    (g, v) leaves).
    """
    if interpret is None:
        interpret = not _on_tpu()
    S = small.shape[1]
    F = feats.shape[1]
    P = 0 if pose is None else pose.shape[-1]
    d0 = S + F + P
    L = len(weights)

    specs = []
    wt_flat = []
    for l, w in enumerate(weights):
        comps = []
        if l == 0:
            comps = [('small', 0, S), ('feats', S, F)]
            if P:
                comps.append(('pose', S + F, P))
        elif l in skips:
            assert w.shape[1] > d0, (l, w.shape, d0)
            comps = [('x', d0, w.shape[1] - d0), ('small', 0, S),
                     ('feats', S, F)]
            if P:
                comps.append(('pose', S + F, P))
        else:
            comps = [('x', 0, w.shape[1])]
        specs.append(tuple(name for name, _, _ in comps))
        for _, start, width in comps:
            wt_flat.append(jnp.transpose(w[:, start:start + width]))
    b_flat = tuple(jnp.reshape(bv, (1, -1)) for bv in biases)

    op = _make_op(tuple(specs), bool(squeeze_out), bool(bf16),
                  int(tile), int(tile_bwd), bool(interpret))
    pose_in = None if pose is None else jnp.reshape(pose, (1, P))
    return op(tuple(wt_flat), b_flat, small, feats, pose_in)
