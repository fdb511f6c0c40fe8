"""Dense TPU ray tracer for articulated human SDFs.

Re-design of reference `im2mesh/metaavatar_render/renderer/ray_tracing.py`
(`BodyRayTracing`): identical algorithm — KNN-skinning sphere tracing, joint
root-finding refinement, near/far-surface stratified sampling, canonical
correspondence search — but with *dense fixed-shape* ray/sample blocks and
convergence masks carried as data instead of boolean gather/scatter, and a
`lax.fori_loop` sphere tracer. Everything here runs under stop_gradient
(the reference wraps the tracer in no_grad).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from arah_tpu.core.linalg import inv_affine

from arah_tpu.core.body import (normalize_canonical_points,
                                sdf_to_metric, unnormalize_canonical_points)
from arah_tpu.core.rays import stratified_z_vals
from arah_tpu.ops.fused import fused_nn_idx as nn_idx
from arah_tpu.solver.root_find import (CanonicalFrame, search_canonical_corr,
                                       search_iso_surface_depth)


def _pallas_ok() -> bool:
    """Kernel-dispatch gate: on by default on TPU; ARAH_FORCE_PALLAS=1
    lets CPU tests drive the full dispatch path in interpret mode;
    ARAH_DISABLE_PALLAS=1 is the global escape hatch back to the XLA
    solver/march paths (config: model.use_pallas_{corr,march,iso})."""
    import os
    if os.environ.get('ARAH_DISABLE_PALLAS') == '1':
        return False
    return (jax.default_backend() == 'tpu'
            or os.environ.get('ARAH_FORCE_PALLAS') == '1')


class RayTracerConfig(NamedTuple):
    root_finding_threshold: float = 1e-5
    sphere_tracing_iters: int = 50
    n_steps: int = 64
    near_surface_vol_samples: int = 16
    far_surface_vol_samples: int = 16
    surface_vol_range: float = 0.05
    clamp_dist: float = 0.1
    corr_max_steps: int = 50
    # the joint (canonical point, depth) iso-surface Broyden ALWAYS runs
    # 50 steps in the reference (`broyden.py:4` default, independent of
    # sphere_tracing_iters) — with fewer steps deep roots past the first
    # marching stall silently fail to converge
    iso_max_steps: int = 50
    # > 0: run the canonical-correspondence Broyden in fixed-size point
    # chunks via lax.map so each chunk's while_loop exits as soon as ITS
    # points converge (the dense loop pays the global worst straggler for
    # every point; convergence is spatially correlated along rays).
    # Measured +16% eval and +3% train throughput on v5e (PERF.md); falls
    # back to the dense path when the point count isn't divisible by the
    # chunk.
    corr_chunk: int = 16384
    # > 0 (eval only): run sphere tracing + iso refinement in fixed-size
    # ray chunks via lax.map, each with its own early-exit while_loop.
    # Measured: no gain over the global early-exit while (sphere-trace
    # convergence is uniform across rays — 39.2k rays/s either way on
    # v5e), so the default stays 0 (dense, simpler graph); the eval-mode
    # early-exit while itself is +8% over the old fixed-50-iter fori.
    trace_chunk: int = 0
    # fused transposed-layout Pallas Broyden kernel for the corr search
    # (ops/pallas/corr_kernel_t.py): default-on — measured 61 ms vs 81 ms
    # for the chunked XLA solve at 262k points on v5e (bench_corr.py).
    # Used only when running on TPU, the point count divides the tile,
    # and the skinning net is kernel-compatible (no PE/skips/cond);
    # otherwise the XLA paths below apply.
    use_pallas_corr: bool = True
    pallas_corr_tile: int = 2048
    # matmul precision inside the fused solver kernels: 'f32' (default)
    # or 'split3' (three bf16 MXU passes ~= f32 accuracy; measured
    # SLOWER on v5e — the solver kernels are not matmul-bound, see
    # ops/pallas/precision.py and PERF.md).
    pallas_precision: str = 'f32'
    # fused KNN+LBS+SIREN sphere-trace march kernel
    # (ops/pallas/march_kernel.py); same guard conditions as the corr
    # kernel plus a generated-SIREN handle (sdf_gen) from the renderer.
    use_pallas_march: bool = True
    pallas_march_tile: int = 256
    # coarse-to-fine warm start for the canonical-correspondence search:
    # solve every `stride`th sample per ray from the KNN init, then
    # initialize the remaining samples by interpolating the bracketing
    # coarse roots along the ray (adjacent volume samples are mm apart,
    # but the reference — and stride=0 — Broyden-solves every sample
    # from an independent KNN init, `ray_tracing.py:403-461`). Falls
    # back to the KNN init where a bracket is unconverged or the two
    # bracketing roots disagree by > corr_warm_gate meters (a
    # multi-root/occlusion-boundary signal). Cuts fine-point Broyden
    # iterations ~2.7x (bench_warmstart.py histogram, PERF.md round 4);
    # not bit-identical to stride=0 — roots agree on the common valid
    # set to solver tolerance. 0 = off (exact reference init semantics).
    corr_coarse_stride: int = 0
    corr_warm_gate: float = 0.1
    # straggler-resolve split of the corr solve (value-identical up to
    # ulp reassociation; see _corr_solve_split): phase 1 caps every tile/chunk at this many
    # Broyden iterations, then the rare still-active points (measured
    # ~0.35% past 16 iterations on the flagship bench scene) re-solve
    # from scratch at corr_max_steps in ONE compacted corr_resolve_cap-
    # point batch. 0 = single-pass (reference scheduling).
    corr_phase1_steps: int = 0
    corr_resolve_cap: int = 4096
    # same straggler-resolve split for the sphere-trace march and the
    # iso refinement: bench_iters.py measures BOTH at their full 50-iter
    # caps in every tile (each 256/512-ray tile contains a straggler),
    # so capping phase 1 and re-marching/re-solving only the compacted
    # stragglers bounds every tile's trip count. march_resolve_cap must
    # be a pallas_march_tile multiple (512 = 2 tiles).
    march_phase1_steps: int = 0
    march_resolve_cap: int = 512
    iso_phase1_steps: int = 0
    iso_resolve_cap: int = 512
    # transposed-layout fused KNN kernel for the corr-init
    # nearest-vertex query (ops/pallas/knn_kernel.py:nn_idx_pallas_t):
    # the chunked-XLA argmin lowers as a serial VPU loop fusion costing
    # ~21.6 ms/step at 8192 rays (bench_profile round 4); the (k, T)
    # kernel keeps points on lanes and reduces over sublanes — measured
    # +2.7% train in-step (36,562 vs 35,612 rays/s interleaved).
    # Default on; identical nearest verts incl. first-match ties.
    use_pallas_knn: bool = True
    pallas_knn_tile: int = 2048
    # fused joint (canonical point, depth) iso-surface Broyden kernel
    # (ops/pallas/iso_kernel.py); needs BOTH skin_dense and sdf_gen.
    # Default ON since round 3b: re-measured IN-STEP after the glue pass,
    # it wins at both train (2048 rays: 76.9 vs 80.0 ms/step) and eval
    # (8192 rays: 46.2k vs 45.4k rays/s) — the round-2 "slower than XLA"
    # reading (44 vs ~20 ms isolated at 8192 rays) predates the current
    # step structure; bench.py BENCH_PALLAS_ISO=0/1 reproduces the A/B.
    use_pallas_iso: bool = True
    pallas_iso_tile: int = 512


class SmplRef(NamedTuple):
    """Posed SMPL reference data for KNN-based initialization."""
    verts_posed: jax.Array        # (V, 3) posed verts in world (with trans)
    skinning_weights: jax.Array   # (V, 24)


class SphereTraceResult(NamedTuple):
    points_norm: jax.Array   # (N, 3) canonical surface points (normalized)
    transforms: jax.Array    # (N, 4, 4) forward transforms at surface
    unconverged: jax.Array   # (N,) bool — rays needing dense sampling
    start_dis: jax.Array     # (N,) surface depth (or near bound)
    end_dis: jax.Array       # (N,) far bound


def _nn_backward_map(points_world: jax.Array, smpl: SmplRef,
                     frame: CanonicalFrame):
    """Nearest-SMPL-vertex backward skinning: world points -> canonical.

    Mirrors `inv_transform_points_smpl_verts` (`ray_tracing.py:382-400`).
    Returns (x_hat_metric, x_hat_norm, T_fwd).
    """
    idx = nn_idx(points_world, smpl.verts_posed)
    w = smpl.skinning_weights[idx]                       # (N, 24)
    T_fwd = jnp.einsum('nj,jab->nab', w, frame.bone_transforms)
    T_bwd = inv_affine(T_fwd)
    x = points_world - frame.trans
    x_hat = jnp.einsum('nab,nb->na', T_bwd[:, :3, :3], x) + T_bwd[:, :3, 3]
    x_norm = normalize_canonical_points(
        x_hat, frame.coord_min, frame.coord_max, frame.center)
    return x_hat, x_norm, T_fwd


class MarchCarry(NamedTuple):
    t: jax.Array             # (N,) marching depth
    unfinished: jax.Array    # (N,)
    diverged: jax.Array      # (N,)
    x_norm: jax.Array        # (N, 3) latest canonical estimate
    T_fwd: jax.Array         # (N, 4, 4)


def _march_body(cfg: RayTracerConfig, sdf_fn: Callable,
                frame: CanonicalFrame, smpl: SmplRef, cam_loc, ray_dirs,
                far):
    """One sphere-trace iteration as a reusable MarchCarry -> MarchCarry
    function (shared by the XLA while_loop below and the per-ray
    iteration calibration in bench_iters.py)."""
    thresh = cfg.root_finding_threshold

    def body(c: MarchCarry):
        pts = cam_loc + c.t[:, None] * ray_dirs
        _, x_norm, T_fwd = _nn_backward_map(pts, smpl, frame)
        sdf = sdf_to_metric(sdf_fn(x_norm), frame.coord_min,
                            frame.coord_max)
        # lanes outside the active set: the reference's 1e11 fill
        sdf = jnp.where(c.unfinished, sdf, 1e11)

        x_norm_new = jnp.where(c.unfinished[:, None], x_norm, c.x_norm)
        T_new = jnp.where(c.unfinished[:, None, None], T_fwd, c.T_fwd)

        sdf_march = jnp.clip(sdf, -cfg.clamp_dist, cfg.clamp_dist)
        update = (jnp.abs(sdf_march) > thresh) & (jnp.abs(sdf) < 1e6)
        t = jnp.where(update, c.t + sdf_march, c.t)
        diverged = jnp.where(update, t >= far, c.diverged)
        remove = (c.unfinished & (jnp.abs(sdf) <= thresh)) | diverged
        unfinished = c.unfinished & ~remove
        return MarchCarry(t, unfinished, diverged, x_norm_new, T_new)

    return body


def _march_xla(cfg: RayTracerConfig, sdf_fn: Callable,
               frame: CanonicalFrame, smpl: SmplRef, cam_loc, ray_dirs,
               near, far) -> MarchCarry:
    """The sphere-trace march loop (XLA while_loop)."""
    n = ray_dirs.shape[0]
    unfinished0 = near < far
    carry = MarchCarry(near, unfinished0, near >= far,
                       jnp.zeros((n, 3)), jnp.zeros((n, 4, 4)))
    body = _march_body(cfg, sdf_fn, frame, smpl, cam_loc, ray_dirs, far)

    # early exit once every ray in this block converged/diverged —
    # the loop body is a no-op on finished rays, so this is value-
    # identical to the fixed-iteration loop. The tracer runs under
    # stop_gradient in training too, so the while_loop is never on
    # the reverse-mode path.
    def cond(ic):
        i, c = ic
        return (i < cfg.sphere_tracing_iters) & jnp.any(c.unfinished)
    _, c = jax.lax.while_loop(
        cond, lambda ic: (ic[0] + 1, body(ic[1])), (0, carry))
    return c


def _march(cfg: RayTracerConfig, sdf_fn: Callable, frame: CanonicalFrame,
           smpl: SmplRef, cam_loc, ray_dirs, near, far,
           sdf_gen=None) -> MarchCarry:
    """March-loop dispatch: fused Pallas kernel on TPU when the generated
    SIREN weights (sdf_gen) are provided, XLA while_loop otherwise."""
    n = ray_dirs.shape[0]
    if (cfg.use_pallas_march and sdf_gen is not None
            and _pallas_ok()
            and n % cfg.pallas_march_tile == 0):
        from arah_tpu.ops.pallas.march_kernel import sphere_march_pallas
        t, unf, div, x_norm, T16 = sphere_march_pallas(
            cam_loc, ray_dirs, near, far, smpl.verts_posed,
            smpl.skinning_weights, frame.bone_transforms.reshape(24, 16),
            list(sdf_gen.weights), list(sdf_gen.biases),
            list(sdf_gen.freqs), list(sdf_gen.phases),
            frame.coord_min, frame.coord_max, frame.center, frame.trans,
            tile=cfg.pallas_march_tile, n_iters=cfg.sphere_tracing_iters,
            thresh=cfg.root_finding_threshold, clamp_dist=cfg.clamp_dist)
        return MarchCarry(t, unf, div, x_norm, T16.reshape(n, 4, 4))
    return _march_xla(cfg, sdf_fn, frame, smpl, cam_loc, ray_dirs,
                      near, far)


def _march_split(cfg: RayTracerConfig, sdf_fn: Callable,
                 frame: CanonicalFrame, smpl: SmplRef, cam_loc, ray_dirs,
                 near, far, sdf_gen=None) -> MarchCarry:
    """Straggler-resolve split of the sphere-trace march (same pattern
    as _corr_solve_split; march trajectories are per-ray deterministic,
    so re-marching a straggler from scratch at the full iteration cap
    reproduces the single-pass result). bench_iters.py: every
    256-ray tile contains a ray that marches all 50 iterations, so the
    per-tile early exit never fires — phase 1 caps every tile at
    `march_phase1_steps`, then only the compacted still-unfinished rays
    re-march at the full cap."""
    p1 = cfg.march_phase1_steps
    n = ray_dirs.shape[0]
    if p1 <= 0 or p1 >= cfg.sphere_tracing_iters:
        return _march(cfg, sdf_fn, frame, smpl, cam_loc, ray_dirs, near,
                      far, sdf_gen=sdf_gen)
    c1 = _march(cfg._replace(sphere_tracing_iters=p1), sdf_fn, frame,
                smpl, cam_loc, ray_dirs, near, far, sdf_gen=sdf_gen)
    act = c1.unfinished
    cap = min(cfg.march_resolve_cap, n)
    idx = jnp.nonzero(act, size=cap, fill_value=0)[0]
    sub_m = jnp.arange(cap) < jnp.sum(act)
    # RESUME rather than re-march: unlike the Broyden solvers (whose
    # resume state — J_inv, best-so-far — stays inside the kernel), the
    # march's whole state is the depth t: a still-unfinished ray at
    # phase-1 exit has unfinished=True, diverged=False, and the loop
    # body recomputes x/T from t each iteration, so marching from
    # near=c1.t with the REMAINING iteration budget continues the exact
    # single-pass trajectory at 0 redo cost.
    c2 = _march(cfg._replace(
        sphere_tracing_iters=cfg.sphere_tracing_iters - p1),
        sdf_fn, frame, smpl, cam_loc[idx], ray_dirs[idx],
        c1.t[idx], far[idx], sdf_gen=sdf_gen)
    w1 = lambda a, b: jnp.where(sub_m, a, b)
    return MarchCarry(
        t=c1.t.at[idx].set(w1(c2.t, c1.t[idx])),
        unfinished=c1.unfinished.at[idx].set(
            w1(c2.unfinished, c1.unfinished[idx])),
        diverged=c1.diverged.at[idx].set(w1(c2.diverged, c1.diverged[idx])),
        x_norm=c1.x_norm.at[idx].set(
            jnp.where(sub_m[:, None], c2.x_norm, c1.x_norm[idx])),
        T_fwd=c1.T_fwd.at[idx].set(
            jnp.where(sub_m[:, None, None], c2.T_fwd, c1.T_fwd[idx])))


def sphere_trace(cfg: RayTracerConfig, sdf_fn: Callable, skin_fn: Callable,
                 frame: CanonicalFrame, smpl: SmplRef, cam_loc: jax.Array,
                 ray_dirs: jax.Array, near: jax.Array, far: jax.Array,
                 eval_mode: bool = False, sdf_gen=None,
                 skin_dense=None) -> SphereTraceResult:
    """KNN-skinning sphere tracing + joint root-finding refinement.

    Mirrors `BodyRayTracing.sphere_tracing` (`ray_tracing.py:174-296`).
    cam_loc: (N, 3) per-ray origins; ray_dirs: (N, 3); near/far: (N,).
    """
    thresh = cfg.root_finding_threshold

    def _iso_solve(cam_loc, ray_dirs, valid, x_hat, z0, T_fwd,
                   max_steps):
        n = ray_dirs.shape[0]
        if (cfg.use_pallas_iso and sdf_gen is not None
                and skin_dense is not None
                and _pallas_ok()
                and n % cfg.pallas_iso_tile == 0):
            from arah_tpu.ops.pallas.iso_kernel import iso_refine_pallas
            from arah_tpu.solver.root_find import (IsoSurfaceResult,
                                                   iso_init_inv_jacobian)
            J_inv0 = iso_init_inv_jacobian(sdf_fn, skin_fn, frame,
                                           ray_dirs, x_hat)
            u0 = jnp.concatenate([x_hat, z0[:, None]], axis=-1)
            wts, bs, softmax_scale = skin_dense
            u, T16, ok, act = iso_refine_pallas(
                cam_loc, ray_dirs, u0, T_fwd.reshape(n, 16),
                J_inv0.reshape(n, 16), valid, list(wts), list(bs),
                frame.bone_transforms.reshape(24, 16),
                list(sdf_gen.weights), list(sdf_gen.biases),
                list(sdf_gen.freqs), list(sdf_gen.phases),
                frame.coord_min, frame.coord_max, frame.center,
                frame.trans, tile=cfg.pallas_iso_tile,
                max_steps=max_steps, cvg_thresh=thresh,
                softmax_scale=softmax_scale)
            return IsoSurfaceResult(u[:, :3], u[:, 3],
                                    T16.reshape(n, 4, 4), ok, act)
        return search_iso_surface_depth(
            sdf_fn, skin_fn, frame, cam_loc, ray_dirs, valid,
            x_hat, z0, T_fwd, max_steps=max_steps,
            cvg_thresh=thresh)

    def _iso(cam_loc, ray_dirs, valid, x_hat, z0, T_fwd):
        """Iso refinement with the optional straggler-resolve split
        (same pattern as _corr_solve_split / _march_split)."""
        p1 = cfg.iso_phase1_steps
        if p1 <= 0 or p1 >= cfg.iso_max_steps:
            return _iso_solve(cam_loc, ray_dirs, valid, x_hat, z0,
                              T_fwd, cfg.iso_max_steps)
        r1 = _iso_solve(cam_loc, ray_dirs, valid, x_hat, z0, T_fwd, p1)
        act = r1.active
        cap = min(cfg.iso_resolve_cap, ray_dirs.shape[0])
        idx = jnp.nonzero(act, size=cap, fill_value=0)[0]
        sub_m = jnp.arange(cap) < jnp.sum(act)
        r2 = _iso_solve(cam_loc[idx], ray_dirs[idx], sub_m, x_hat[idx],
                        z0[idx], T_fwd[idx], cfg.iso_max_steps)
        from arah_tpu.solver.root_find import IsoSurfaceResult
        w1 = lambda a, b: jnp.where(sub_m, a, b)
        return IsoSurfaceResult(
            x_hat=r1.x_hat.at[idx].set(
                jnp.where(sub_m[:, None], r2.x_hat, r1.x_hat[idx])),
            z_depth=r1.z_depth.at[idx].set(w1(r2.z_depth, r1.z_depth[idx])),
            T_fwd=r1.T_fwd.at[idx].set(
                jnp.where(sub_m[:, None, None], r2.T_fwd, r1.T_fwd[idx])),
            converged=r1.converged.at[idx].set(
                w1(r2.converged, r1.converged[idx])),
            active=jnp.zeros_like(act))

    def _trace_block(args) -> SphereTraceResult:
        cam_loc, ray_dirs, near, far = args
        n = ray_dirs.shape[0]
        c = _march_split(cfg, sdf_fn, frame, smpl, cam_loc, ray_dirs,
                         near, far, sdf_gen=sdf_gen)

        # Joint root-finding refinement of (canonical point, depth).
        x_hat = unnormalize_canonical_points(
            c.x_norm, frame.coord_min, frame.coord_max, frame.center)
        valid = (~c.diverged) if eval_mode else jnp.ones((n,), bool)
        iso = _iso(cam_loc, ray_dirs, valid, x_hat, c.t, c.T_fwd)

        converged = iso.converged & (iso.z_depth >= near) \
            & (iso.z_depth <= far)
        t_out = jnp.where(converged, iso.z_depth, near)
        x_out_norm = normalize_canonical_points(
            iso.x_hat, frame.coord_min, frame.coord_max, frame.center)
        return SphereTraceResult(x_out_norm, iso.T_fwd, ~converged, t_out,
                                 far)

    n_rays = ray_dirs.shape[0]
    if cfg.trace_chunk > 0 and eval_mode \
            and n_rays % cfg.trace_chunk == 0 and n_rays > cfg.trace_chunk:
        nc = n_rays // cfg.trace_chunk
        reshape = lambda a: a.reshape((nc, cfg.trace_chunk) + a.shape[1:])
        res = jax.lax.map(
            _trace_block,
            (reshape(cam_loc), reshape(ray_dirs), reshape(near),
             reshape(far)))
        return jax.tree.map(
            lambda a: a.reshape((n_rays,) + a.shape[2:]), res)
    return _trace_block((cam_loc, ray_dirs, near, far))


class SamplerResult(NamedTuple):
    z_vals: jax.Array          # (N, S) sorted sample depths
    sample_mask: jax.Array     # (N, S) active-sample mask
    points_norm: jax.Array     # (N, S, 3) canonical samples (normalized)
    transforms: jax.Array      # (N, S, 4, 4) forward transforms
    converge_mask: jax.Array   # (N, S) root-finding convergence
    jac: jax.Array = None      # (N, S, 3, 3) exact d fwd_skin/d x_hat at
    #                            the roots (corr-kernel want_jac output;
    #                            None on XLA/CPU paths) — feeds the
    #                            renderer's implicit-diff correction


def sample_z_vals(cfg: RayTracerConfig, key, body_mask: jax.Array,
                  surface_depth: jax.Array, near: jax.Array, far: jax.Array,
                  eval_mode: bool) -> tuple[jax.Array, jax.Array]:
    """Per-ray depth samples + activity mask. Mirrors `ray_sampler`
    (`ray_tracing.py:313-351`): 64 stratified samples on non-converged rays;
    on converged rays 16+1 near-surface + 16 far-surface samples (sorted),
    remaining slots masked off.
    """
    n = body_mask.shape[0]
    S = cfg.n_steps
    ns, fs = cfg.near_surface_vol_samples, cfg.far_surface_vol_samples
    rng_lin = jnp.linspace(0.0, 1.0, S)
    k1, k2, k3 = jax.random.split(key, 3)

    # base: [surface-or-near, far]
    z0 = surface_depth[:, None] + (far - surface_depth)[:, None] * rng_lin
    if not eval_mode:
        z0 = stratified_z_vals(k1, z0)
    mask = jnp.ones((n, S), bool)

    if ns > 0 or fs > 0:
        lin_ns = jnp.linspace(0.0, 1.0, ns + 1)
        z_near = (surface_depth[:, None] - cfg.surface_vol_range
                  + 2.0 * cfg.surface_vol_range * lin_ns)
        if not eval_mode:
            z_near = stratified_z_vals(k2, z_near, fix_idx=ns // 2)

        lin_fs = jnp.linspace(0.0, 1.0, max(fs, 1))
        span = jnp.maximum(surface_depth - cfg.surface_vol_range - near, 1e-5)
        z_far = near[:, None] + span[:, None] * lin_fs
        if not eval_mode:
            z_far = stratified_z_vals(k3, z_far)

        surf = jnp.sort(jnp.concatenate([z_near, z_far], axis=-1), axis=-1)
        n_surf = ns + 1 + fs
        z_body = jnp.concatenate([surf, z0[:, n_surf:]], axis=-1)
        mask_body = jnp.arange(S)[None, :] < n_surf
        z = jnp.where(body_mask[:, None], z_body, z0)
        mask = jnp.where(body_mask[:, None], mask_body, mask)
        return z, mask
    return z0, mask


def _corr_solve(cfg: RayTracerConfig, skin_fn: Callable,
                frame: CanonicalFrame, skin_dense, x_bar, x0, T0, mask,
                max_steps: int | None = None, want_jac: bool = False):
    """Flat canonical-correspondence solve with Pallas/chunked/dense
    dispatch. x_bar/x0: (N, 3); T0: (N, 4, 4); mask: (N,).
    Returns (x_hat (N, 3) metric, T_fwd (N, 4, 4), valid (N,),
    active (N,)) — `active` marks points still iterating at max_steps
    (the straggler-resolve input, `_corr_solve_split`)."""
    n_total = x_bar.shape[0]
    if max_steps is None:
        max_steps = cfg.corr_max_steps
    if (cfg.use_pallas_corr and skin_dense is not None
            and _pallas_ok()
            and n_total % cfg.pallas_corr_tile == 0):
        from arah_tpu.ops.pallas.corr_kernel_t import corr_search_pallas_t
        wts, bs, softmax_scale = skin_dense
        out = corr_search_pallas_t(
            x_bar, x0, T0.reshape(n_total, 16), mask, list(wts),
            list(bs), frame.bone_transforms.reshape(24, 16),
            frame.coord_min, frame.coord_max, frame.center,
            tile=cfg.pallas_corr_tile, max_steps=max_steps,
            cvg_thresh=cfg.root_finding_threshold,
            softmax_scale=softmax_scale,
            precision=cfg.pallas_precision, want_jac=want_jac)
        x_hat, T16, valid, active = out[:4]
        jac = out[4] if want_jac else None
        return (x_hat, T16.reshape(n_total, 4, 4), valid & mask, active,
                jac)

    def solve(args):
        xb, xi, ti, m = args
        return search_canonical_corr(
            skin_fn, frame, xb, xi, ti, max_steps=max_steps,
            cvg_thresh=cfg.root_finding_threshold, active_init=m)

    # chunked solve in train mode too: +3% step time (15.5k -> 15.9k
    # rays/s on v5e) at a ~37 s warm compile; the solver runs under
    # stop_gradient so the lax.map/while never sits on the reverse path
    if cfg.corr_chunk > 0 \
            and n_total % cfg.corr_chunk == 0 \
            and n_total > cfg.corr_chunk:
        nc = n_total // cfg.corr_chunk
        reshape = lambda a: a.reshape((nc, cfg.corr_chunk) + a.shape[1:])
        corr = jax.lax.map(
            solve, (reshape(x_bar), reshape(x0), reshape(T0),
                    reshape(mask)))
        corr = jax.tree.map(
            lambda a: a.reshape((n_total,) + a.shape[2:])
            if a.ndim >= 2 else a, corr)
    else:
        corr = solve((x_bar, x0, T0, mask))
    return corr.x_hat, corr.T_fwd, corr.valid & mask, corr.active, None


def _corr_solve_split(cfg: RayTracerConfig, skin_fn: Callable,
                      frame: CanonicalFrame, skin_dense, x_bar, x0, T0,
                      mask, want_jac: bool = False):
    """Straggler-resolve split of the corr solve — value-identical
    results (round-4 perf structure; identical in exact arithmetic,
    observed <=5e-7 ulp-level gemm reassociation from the differently-
    shaped phase-2 batch on XLA:CPU).

    The per-tile/per-chunk early-exit loops pay each tile's WORST lane:
    on the flagship bench scene the mean point deactivates in ~4 Broyden
    iterations, yet 2048-point tiles average a 36-iteration max because
    ~0.35% of points stay active past 16 (bench_warmstart.py deactivation
    histograms). Phase 1 therefore caps every tile at
    `corr_phase1_steps`; the few still-active stragglers are compacted
    into one `corr_resolve_cap`-point batch and re-solved FROM SCRATCH at
    the full `corr_max_steps`. Per-point trajectories are independent
    and deterministic, so a from-scratch phase-2 solve reproduces the
    single-pass trajectory exactly, and every point that deactivated
    within phase 1 already holds its final state — the split changes
    kernel scheduling, not the computation (pinned by
    tests/test_sampler.py::TestCorrSplit: masks/convergence exactly
    equal, values to 1e-6). Overflow guard: actives
    beyond the cap keep the phase-1 truncated result (valid=False, like
    any non-converged point); the cap is ~10x the measured worst case.
    """
    p1 = cfg.corr_phase1_steps
    if p1 <= 0 or p1 >= cfg.corr_max_steps:
        return _corr_solve(cfg, skin_fn, frame, skin_dense, x_bar, x0,
                           T0, mask, want_jac=want_jac)
    x1, T1, v1, act, J1 = _corr_solve(cfg, skin_fn, frame, skin_dense,
                                      x_bar, x0, T0, mask, max_steps=p1,
                                      want_jac=want_jac)
    cap = min(cfg.corr_resolve_cap, x_bar.shape[0])
    idx = jnp.nonzero(act, size=cap, fill_value=0)[0]
    sub_m = jnp.arange(cap) < jnp.sum(act)
    x2, T2, v2, _, J2 = _corr_solve(cfg, skin_fn, frame, skin_dense,
                                    x_bar[idx], x0[idx], T0[idx], sub_m,
                                    want_jac=want_jac)
    x = x1.at[idx].set(jnp.where(sub_m[:, None], x2, x1[idx]))
    T = T1.at[idx].set(jnp.where(sub_m[:, None, None], T2, T1[idx]))
    v = v1.at[idx].set(jnp.where(sub_m, v2, v1[idx]))
    J = None
    if J1 is not None and J2 is not None:
        J = J1.at[idx].set(jnp.where(sub_m[:, None, None], J2, J1[idx]))
    return x, T, v, jnp.zeros_like(act), J


def _warm_start_inits(cfg: RayTracerConfig, z_vals, x_hat_c, T_c, valid_c,
                      x0_f, T0_f):
    """Fine-sample warm-start inits from bracketing coarse roots.

    z_vals: (n, Sc, C) sample depths; x_hat_c/T_c/valid_c: (n, Sc, ...)
    coarse solve results; x0_f/T0_f: (n, Sc, C-1, ...) KNN fallbacks.
    Returns (x_init, T_init) for the fine slots r = 1..C-1 of each
    coarse block. The interpolation is linear in depth between the two
    bracketing coarse roots; a bracket is usable only when both sides
    converged AND agree within corr_warm_gate (else: one-sided copy
    where a single side converged, KNN fallback otherwise).
    """
    # shifted (next-block) coarse arrays, edge-clamped
    x_hi = jnp.concatenate([x_hat_c[:, 1:], x_hat_c[:, -1:]], axis=1)
    T_hi = jnp.concatenate([T_c[:, 1:], T_c[:, -1:]], axis=1)
    valid_hi = jnp.concatenate([valid_c[:, 1:], valid_c[:, -1:]], axis=1)
    z_lo = z_vals[:, :, 0]                                     # (n, Sc)
    z_hi = jnp.concatenate([z_lo[:, 1:], z_lo[:, -1:]], axis=1)

    z_f = z_vals[:, :, 1:]                                     # (n, Sc, C-1)
    a = jnp.clip((z_f - z_lo[..., None])
                 / jnp.maximum(z_hi - z_lo, 1e-8)[..., None], 0.0, 1.0)

    dist = jnp.linalg.norm(x_hi - x_hat_c, axis=-1)            # (n, Sc)
    both = (valid_c & valid_hi & (dist < cfg.corr_warm_gate))[..., None]
    lo_only = (valid_c & ~valid_hi)[..., None]
    hi_only = (valid_hi & ~valid_c)[..., None]

    x_lo_b = x_hat_c[:, :, None, :]                        # (n, Sc, 1, 3)
    x_hi_b = x_hi[:, :, None, :]
    x_interp = (1.0 - a[..., None]) * x_lo_b + a[..., None] * x_hi_b
    x_init = jnp.where(
        both[..., None], x_interp,
        jnp.where(lo_only[..., None], jnp.broadcast_to(x_lo_b, x0_f.shape),
                  jnp.where(hi_only[..., None],
                            jnp.broadcast_to(x_hi_b, x0_f.shape), x0_f)))

    near_hi = (a > 0.5)[..., None, None]                   # (n, Sc, C-1,1,1)
    T_lo_b = jnp.broadcast_to(T_c[:, :, None], T0_f.shape)
    T_hi_b = jnp.broadcast_to(T_hi[:, :, None], T0_f.shape)
    T_near = jnp.where(near_hi, T_hi_b, T_lo_b)
    b4 = both[..., None, None]
    lo4 = lo_only[..., None, None]
    hi4 = hi_only[..., None, None]
    T_init = jnp.where(b4, T_near,
                       jnp.where(lo4, T_lo_b,
                                 jnp.where(hi4, T_hi_b, T0_f)))
    return x_init, T_init


def canonicalize_samples(cfg: RayTracerConfig, sdf_fn: Callable,
                         skin_fn: Callable, frame: CanonicalFrame,
                         smpl: SmplRef, cam_loc: jax.Array,
                         ray_dirs: jax.Array, z_vals: jax.Array,
                         sample_mask: jax.Array, eval_mode: bool = True,
                         skin_dense=None, want_jac: bool = False):
    """Backward-map all ray samples to canonical space via root-finding.

    Mirrors `inv_transform_points_opt` (`ray_tracing.py:403-461`): KNN-init
    (nearest posed SMPL vert's skinning weights) then Broyden canonical
    correspondence search; masked samples are frozen and report
    converge=False.

    With cfg.corr_coarse_stride = C > 1, runs coarse-to-fine: every Cth
    sample solves from the KNN init, the rest warm-start from the
    bracketing coarse roots (see RayTracerConfig).

    skin_dense: optional ((weights...), (biases...), softmax_scale) of the
    collapsed skinning MLP — enables the fused Pallas corr kernel on TPU.
    want_jac: also return the exact per-root d fwd_skin/d x_hat from the
    corr kernel (None when the XLA path solves) — the renderer's
    implicit-diff correction consumes it instead of running three XLA
    tangent passes.
    """
    n, S = z_vals.shape
    pts_world = (cam_loc[:, None, :] + z_vals[..., None] * ray_dirs[:, None, :]
                 ).reshape(-1, 3)
    flat_mask = sample_mask.reshape(-1)

    if (cfg.use_pallas_knn and _pallas_ok()
            and pts_world.shape[0] % cfg.pallas_knn_tile == 0):
        from arah_tpu.ops.pallas.knn_kernel import nn_idx_pallas_t
        idx = nn_idx_pallas_t(pts_world, smpl.verts_posed,
                              tile=cfg.pallas_knn_tile)
    else:
        idx = nn_idx(pts_world, smpl.verts_posed)
    w = smpl.skinning_weights[idx]
    T0 = jnp.einsum('nj,jab->nab', w, frame.bone_transforms)
    T0_inv = inv_affine(T0)
    x_bar = pts_world - frame.trans
    x0 = jnp.einsum('nab,nb->na', T0_inv[:, :3, :3], x_bar) + T0_inv[:, :3, 3]

    C = cfg.corr_coarse_stride
    if C > 1 and S % C == 0 and S > C:
        Sc = S // C
        blk = lambda arr: arr.reshape((n, Sc, C) + arr.shape[1:])
        xb_b, x0_b, T0_b = blk(x_bar), blk(x0), blk(T0)
        m_b = blk(flat_mask)
        flat_c = lambda arr: arr[:, :, 0].reshape((n * Sc,) + arr.shape[3:])

        # phase 1: coarse samples (slot 0 of each block), KNN init
        xc, Tc, vc, _, Jc = _corr_solve_split(
            cfg, skin_fn, frame, skin_dense, flat_c(xb_b), flat_c(x0_b),
            flat_c(T0_b), flat_c(m_b), want_jac=want_jac)
        xc = xc.reshape(n, Sc, 3)
        Tc = Tc.reshape(n, Sc, 4, 4)
        vc = vc.reshape(n, Sc)

        # phase 2: remaining samples, warm-started
        x_init, T_init = _warm_start_inits(
            cfg, z_vals.reshape(n, Sc, C), xc, Tc, vc,
            x0_b[:, :, 1:], T0_b[:, :, 1:])
        nf = n * Sc * (C - 1)
        xf, Tf, vf, _, Jf = _corr_solve_split(
            cfg, skin_fn, frame, skin_dense,
            xb_b[:, :, 1:].reshape(nf, 3), x_init.reshape(nf, 3),
            T_init.reshape(nf, 4, 4), m_b[:, :, 1:].reshape(nf),
            want_jac=want_jac)

        x_hat = jnp.concatenate(
            [xc[:, :, None], xf.reshape(n, Sc, C - 1, 3)],
            axis=2).reshape(-1, 3)
        T_fwd = jnp.concatenate(
            [Tc[:, :, None], Tf.reshape(n, Sc, C - 1, 4, 4)],
            axis=2).reshape(-1, 4, 4)
        valid = jnp.concatenate(
            [vc[:, :, None], vf.reshape(n, Sc, C - 1)], axis=2).reshape(-1)
        jac = None
        if Jc is not None and Jf is not None:
            jac = jnp.concatenate(
                [Jc.reshape(n, Sc, 1, 3, 3),
                 Jf.reshape(n, Sc, C - 1, 3, 3)], axis=2).reshape(-1, 3, 3)
    else:
        x_hat, T_fwd, valid, _, jac = _corr_solve_split(
            cfg, skin_fn, frame, skin_dense, x_bar, x0, T0, flat_mask,
            want_jac=want_jac)

    x_norm = normalize_canonical_points(
        x_hat, frame.coord_min, frame.coord_max, frame.center)
    return (x_norm.reshape(n, S, 3),
            T_fwd.reshape(n, S, 4, 4),
            (valid & flat_mask).reshape(n, S),
            jac.reshape(n, S, 3, 3) if jac is not None else None)


class TraceOutput(NamedTuple):
    surface: SphereTraceResult
    samples: SamplerResult


def trace_and_sample(cfg: RayTracerConfig, sdf_fn: Callable,
                     skin_fn: Callable, frame: CanonicalFrame, smpl: SmplRef,
                     cam_loc: jax.Array, ray_dirs: jax.Array,
                     near: jax.Array, far: jax.Array, key,
                     eval_mode: bool = False, skin_dense=None,
                     sdf_gen=None, want_jac: bool = False) -> TraceOutput:
    """Full ray-tracing pass: sphere trace + sample + canonicalize.

    Mirrors `BodyRayTracing.forward` (`ray_tracing.py:51-172`). Everything
    is stop_gradient'ed by the renderer caller.
    """
    surf = sphere_trace(cfg, sdf_fn, skin_fn, frame, smpl, cam_loc,
                        ray_dirs, near, far, eval_mode=eval_mode,
                        sdf_gen=sdf_gen, skin_dense=skin_dense)
    body_mask = ~surf.unconverged
    z_vals, sample_mask = sample_z_vals(
        cfg, key, body_mask, surf.start_dis, near, far, eval_mode)
    pts, tfs, cvg, jac = canonicalize_samples(
        cfg, sdf_fn, skin_fn, frame, smpl, cam_loc, ray_dirs, z_vals,
        sample_mask, eval_mode=eval_mode, skin_dense=skin_dense,
        want_jac=want_jac)
    return TraceOutput(surf, SamplerResult(z_vals, sample_mask, pts, tfs,
                                           cvg, jac))
