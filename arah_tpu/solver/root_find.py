"""Root-finding searches for canonical correspondences and ray-surface
intersections.

TPU-first re-design of `im2mesh/utils/root_finding_utils.py:147-484`:
  * `forward_skinning`        — canonical point -> posed point via the
    skinning network + LBS (`:147-167`).
  * `forward_skinning_jac`    — exact 3x3 Jacobian via vmapped jacfwd
    (replaces the reference's per-output-row autograd loop,
    `diff_operators.py:53-66`).
  * `search_canonical_corr`   — Broyden on fwd(x_hat) = x_bar with analytic
    init Jacobian (sum_j w_j B_j)^{-1} (`:267-362`).
  * `search_iso_surface_depth`— joint 4D root-find on (x_hat, z) with
    residual [sdf(x_hat); fwd(x_hat) - (o + z d - trans)] (`:365-484`).

All functions are dense and fixed-shape; masked lanes are carried as data.
Solvers run under stop_gradient at the call site (the reference runs Broyden
under no_grad); training gradients flow via the implicit-differentiation
correction in the renderer (`implicit_differentiable_renderer.py:315-334`),
reproduced in render/renderer.py.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from arah_tpu.core.linalg import inv3x3, inv4x4

from arah_tpu.core.body import (normalize_canonical_points, sdf_to_metric,
                                skinning)
from arah_tpu.solver.broyden import broyden


class CanonicalFrame(NamedTuple):
    """Per-frame quantities needed by the skinning/root-finding pipeline."""
    bone_transforms: jax.Array  # (24, 4, 4) cano(Vitruvian) -> posed
    trans: jax.Array            # (3,) global translation
    coord_min: jax.Array        # () or (3,)
    coord_max: jax.Array        # () or (3,)
    center: jax.Array           # (3,)


def forward_skinning(skin_fn: Callable, frame: CanonicalFrame,
                     x_hat: jax.Array, return_w: bool = False):
    """Canonical (metric) points (N, 3) -> posed points (N, 3).

    skin_fn: normalized canonical points (N, 3) -> (N, 24) weights.
    """
    x_norm = normalize_canonical_points(
        x_hat, frame.coord_min, frame.coord_max, frame.center)
    w = skin_fn(x_norm)
    x_bar, T = skinning(x_hat, w, frame.bone_transforms)
    if return_w:
        return x_bar, T, w
    return x_bar, T


def forward_skinning_jac(skin_fn: Callable, frame: CanonicalFrame,
                         x_hat: jax.Array) -> jax.Array:
    """(N, 3) -> (N, 3, 3) exact Jacobian d fwd / d x_hat (includes the
    dw/dx term through the skinning network).

    Computed as jax.linearize + three batched tangent passes (one per
    input basis vector) instead of vmap(jacfwd(per-point)): identical
    values, but every pass is a plain (N, in) x (in, out) matmul chain —
    the vmapped-tangent form lowers to awkward (N, 3, in) generalized
    dots on TPU — and the primal network evaluation runs ONCE instead of
    once per basis vector (jvp re-traces it per call; XLA CSE is not
    reliable across the big fused subgraphs).
    """
    f = lambda p: forward_skinning(skin_fn, frame, p)[0]
    _, f_lin = jax.linearize(f, x_hat)
    cols = []
    for k in range(3):
        t = jnp.zeros_like(x_hat).at[:, k].set(1.0)
        cols.append(f_lin(t))
    return jnp.stack(cols, axis=-1)


def init_transforms_from_weights(w: jax.Array,
                                 bone_transforms: jax.Array) -> jax.Array:
    """(N, 24) weights x (24, 4, 4) -> (N, 4, 4)."""
    return jnp.einsum('nj,jab->nab', w, bone_transforms)


class CorrResult(NamedTuple):
    x_hat: jax.Array        # (N, 3) canonical correspondences (metric)
    T_fwd: jax.Array        # (N, 4, 4) forward transforms
    valid: jax.Array        # (N,) bool converged
    diff: jax.Array         # (N,) residual norms
    active: jax.Array = None  # (N,) bool still-iterating at max_steps


def search_canonical_corr(skin_fn: Callable, frame: CanonicalFrame,
                          x_bar: jax.Array, x_hat_0: jax.Array,
                          T_fwd_0: jax.Array,
                          max_steps: int = 50, cvg_thresh: float = 1e-5,
                          active_init: jax.Array | None = None,
                          track_point_iters: bool = False) -> CorrResult:
    """Find x_hat with fwd_skin(x_hat) == x_bar (both in metric space,
    x_bar already has global translation removed).

    track_point_iters: diagnostics only (bench_warmstart.py) — returns
    the raw BroydenResult (with per-point convergence iterations in
    `.steps`) instead of a CorrResult."""

    def g(x):
        x_bar_opt, T = forward_skinning(skin_fn, frame, x)
        return x_bar_opt - x_bar, T

    # Analytic init Jacobian: (sum_j w(x0)_j B_j)[:3,:3]^-1.
    x0_norm = normalize_canonical_points(
        x_hat_0, frame.coord_min, frame.coord_max, frame.center)
    w0 = skin_fn(x0_norm)
    J0 = init_transforms_from_weights(w0, frame.bone_transforms)[:, :3, :3]
    J_inv_0 = inv3x3(J0)

    res = broyden(g, x_hat_0, T_fwd_0, J_inv_0, max_steps=max_steps,
                  cvg_thresh=cvg_thresh, active_init=active_init,
                  track_point_iters=track_point_iters)
    if track_point_iters:
        return res
    return CorrResult(res.x, res.aux, res.valid, res.diff, res.active)


class IsoSurfaceResult(NamedTuple):
    x_hat: jax.Array        # (N, 3)
    z_depth: jax.Array      # (N,)
    T_fwd: jax.Array        # (N, 4, 4)
    converged: jax.Array    # (N,) bool
    active: jax.Array = None  # (N,) bool still-iterating at max_steps


def iso_init_inv_jacobian(sdf_fn: Callable, skin_fn: Callable,
                          frame: CanonicalFrame, cam_rays: jax.Array,
                          x_hat_0: jax.Array) -> jax.Array:
    """Init inverse Jacobian for the joint iso-surface solve: rows
    [grad_sdf, 0] ; [J_lbs, -ray], inverted (N, 4, 4). Shared by the XLA
    solver below and the fused Pallas kernel (ops/pallas/iso_kernel.py),
    which takes only the iteration loop.

    Both Jacobians come out of ONE jax.linearize of the joint
    (fwd_skin, sdf) map: the normalize + primal network evaluations run
    once, followed by three batched tangent passes (one per input basis
    vector; see the forward_skinning_jac note) — vs six full jvp passes
    when the two Jacobians are computed separately (~1/3 of this block's
    network FLOPs saved; it was ~28 ms of an eval step at 8192 rays)."""
    def joint(x_hat):
        x_norm = normalize_canonical_points(
            x_hat, frame.coord_min, frame.coord_max, frame.center)
        x_bar, _ = skinning(x_hat, skin_fn(x_norm), frame.bone_transforms)
        s = sdf_to_metric(sdf_fn(x_norm), frame.coord_min, frame.coord_max)
        return x_bar, s

    _, joint_lin = jax.linearize(joint, x_hat_0)
    jl_cols, gs_cols = [], []
    for k in range(3):
        t = jnp.zeros_like(x_hat_0).at[:, k].set(1.0)
        xb_t, s_t = joint_lin(t)
        jl_cols.append(xb_t)
        gs_cols.append(s_t)
    J_lbs = jnp.stack(jl_cols, axis=-1)                          # (N, 3, 3)
    grad_sdf = jnp.stack(gs_cols, axis=-1)                       # (N, 3)
    n = x_hat_0.shape[0]
    top = jnp.concatenate(
        [grad_sdf[:, None, :], jnp.zeros((n, 1, 1))], axis=-1)
    bottom = jnp.concatenate([J_lbs, -cam_rays[..., None]], axis=-1)
    J_init = jnp.concatenate([top, bottom], axis=-2)            # (N, 4, 4)
    return inv4x4(J_init)


def search_iso_surface_depth(sdf_fn: Callable, skin_fn: Callable,
                             frame: CanonicalFrame, cam_pos: jax.Array,
                             cam_rays: jax.Array, valid_mask: jax.Array,
                             x_hat_0: jax.Array, z_0: jax.Array,
                             T_fwd_0: jax.Array, max_steps: int = 50,
                             cvg_thresh: float = 1e-5,
                             track_point_iters: bool = False
                             ) -> IsoSurfaceResult:
    """Joint 4D root-find for the SDF iso-surface point along each ray.

    Args:
      sdf_fn: normalized canonical points (N, 3) -> (N,) normalized SDF.
      cam_pos/cam_rays: (N, 3) per-ray origin and direction (world).
      valid_mask: (N,) rays to solve (others frozen at init).
      x_hat_0: (N, 3) canonical init (metric); z_0: (N,) depth init.
    """

    def sdf_metric(x_hat):
        x_norm = normalize_canonical_points(
            x_hat, frame.coord_min, frame.coord_max, frame.center)
        return sdf_to_metric(sdf_fn(x_norm), frame.coord_min, frame.coord_max)

    def g(u):
        x_hat = u[:, :3]
        z = u[:, 3]
        x_bar_tgt = cam_rays * z[:, None] + cam_pos - frame.trans
        x_bar_opt, T = forward_skinning(skin_fn, frame, x_hat)
        err_corr = x_bar_opt - x_bar_tgt
        err_sdf = sdf_metric(x_hat)
        return jnp.concatenate([err_sdf[:, None], err_corr], axis=-1), T

    J_inv_0 = iso_init_inv_jacobian(sdf_fn, skin_fn, frame, cam_rays,
                                    x_hat_0)
    u0 = jnp.concatenate([x_hat_0, z_0[:, None]], axis=-1)
    res = broyden(g, u0, T_fwd_0, J_inv_0, max_steps=max_steps,
                  cvg_thresh=cvg_thresh, active_init=valid_mask,
                  track_point_iters=track_point_iters)
    if track_point_iters:
        # diagnostics (bench_iters.py): raw result incl. per-point iters
        return res
    return IsoSurfaceResult(res.x[:, :3], res.x[:, 3], res.aux, res.valid,
                            res.active)
