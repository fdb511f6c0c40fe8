#!/usr/bin/env python
"""Calibrate EFFECTIVE solver iteration counts of the flagship train
step (VERDICT r3 next-round #6).

The step's three solver loops (sphere-trace march, joint iso refinement,
canonical-correspondence Broyden) have data-dependent trip counts; the
BENCH JSON brackets MFU between 0 iterations (`mfu`) and the configured
caps (`mfu_at_solver_caps`). This script measures what actually
executes on the bench scene:

  * per-point/per-ray first-convergence iterations (instrumented XLA
    solvers — iteration count is a property of (init, problem), not of
    the backend), then
  * aggregated with the shipped kernels' cost semantics: each Pallas
    tile / XLA chunk runs until its WORST point converges, so effective
    iterations = mean over tiles of the tile max (capped). Dense lanes
    in a live tile execute whether converged or not — that's the FLOP
    count the hardware really pays.

Writes EFFECTIVE_ITERS.json {march,iso,corr} which bench.py folds into
`mfu_effective`. Re-run when tracer defaults or the bench scene change.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def tile_max_mean(iters: np.ndarray, active: np.ndarray, tile: int,
                  cap: int) -> float:
    """Mean over tiles of the tile's max capped iteration count (flat
    order = the kernels' point order). Inactive lanes charge 0; a tile
    with any active lane pays its worst active lane."""
    it = np.where(active, np.minimum(iters, cap), 0)
    pad = (-len(it)) % tile
    if pad:
        it = np.concatenate([it, np.zeros(pad, it.dtype)])
    return float(it.reshape(-1, tile).max(axis=1).mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rays', type=int, default=2048)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--out', default='EFFECTIVE_ITERS.json')
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from arah_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config, _build_scene
    from arah_tpu.core.body import unnormalize_canonical_points
    from arah_tpu.core.linalg import inv_affine
    from arah_tpu.ops.knn import nn_idx
    from arah_tpu.render.ray_tracing import (MarchCarry, _march_body,
                                             sample_z_vals)
    from arah_tpu.render.renderer import (generate_sdf, make_sdf_fn,
                                          make_skin_fn)
    from arah_tpu.solver.root_find import (search_canonical_corr,
                                           search_iso_surface_depth)

    cfg = _flagship_config()
    from bench import apply_env_overrides
    cfg = apply_env_overrides(cfg)
    tr = cfg.tracer
    params, fd, inp = _build_scene(cfg, n_rays=args.rays)
    gen = generate_sdf(params, cfg, inp.rots, inp.Jtrs, inp.geo_latent)
    sdf_fn = make_sdf_fn(gen, stop_grad=True)
    skin_fn = make_skin_fn(params, cfg, stop_grad=True)
    cam = jnp.broadcast_to(inp.cam_loc, inp.ray_dirs.shape)
    n = args.rays

    # ---- march: scan the shared loop body, record first-finished iter
    @jax.jit
    def march_tracked():
        body = _march_body(tr, sdf_fn, inp.frame, inp.smpl, cam,
                           inp.ray_dirs, inp.far)
        unf0 = inp.near < inp.far
        c0 = MarchCarry(inp.near, unf0, inp.near >= inp.far,
                        jnp.zeros((n, 3)), jnp.zeros((n, 4, 4)))
        fin0 = jnp.where(unf0, tr.sphere_tracing_iters, 0).astype(jnp.int32)

        def step(carry, i):
            c, fin = carry
            c2 = body(c)
            newly = c.unfinished & ~c2.unfinished
            fin = jnp.where(newly, i + 1, fin)
            return (c2, fin), None

        (c, fin), _ = jax.lax.scan(
            step, (c0, fin0), jnp.arange(tr.sphere_tracing_iters))
        return c, fin, unf0

    c, march_fin, march_active = jax.block_until_ready(march_tracked())

    # ---- iso refinement (training-mode valid = all rays)
    x_hat0 = unnormalize_canonical_points(
        c.x_norm, inp.frame.coord_min, inp.frame.coord_max,
        inp.frame.center)
    iso_res = jax.jit(lambda: search_iso_surface_depth(
        sdf_fn, skin_fn, inp.frame, cam, inp.ray_dirs,
        jnp.ones((n,), bool), x_hat0, c.t, c.T_fwd,
        max_steps=tr.iso_max_steps, cvg_thresh=tr.root_finding_threshold,
        track_point_iters=True))()
    iso_res = jax.block_until_ready(iso_res)

    # ---- corr search on the training sampler's points
    surf_conv = iso_res.valid & (iso_res.x[:, 3] >= inp.near) \
        & (iso_res.x[:, 3] <= inp.far)
    z, m = sample_z_vals(tr, jax.random.PRNGKey(7), surf_conv,
                         jnp.where(surf_conv, iso_res.x[:, 3], inp.near),
                         inp.near, inp.far, eval_mode=False)
    pts = (cam[:, None, :]
           + z[..., None] * inp.ray_dirs[:, None, :]).reshape(-1, 3)
    flat_m = m.reshape(-1)

    @jax.jit
    def corr_tracked():
        idx = nn_idx(pts, inp.smpl.verts_posed)
        w = inp.smpl.skinning_weights[idx]
        T0 = jnp.einsum('nj,jab->nab', w, inp.frame.bone_transforms)
        Ti = inv_affine(T0)
        x_bar = pts - inp.frame.trans
        x0 = jnp.einsum('nab,nb->na', Ti[:, :3, :3], x_bar) + Ti[:, :3, 3]
        return search_canonical_corr(
            skin_fn, inp.frame, x_bar, x0, T0,
            max_steps=tr.corr_max_steps,
            cvg_thresh=tr.root_finding_threshold, active_init=flat_m,
            track_point_iters=True), x_bar, x0, T0

    corr_res, x_bar, x0, T0 = jax.block_until_ready(corr_tracked())

    def pcts(a, active, cap):
        a = np.minimum(np.asarray(a)[np.asarray(active)], cap)
        return {'p50': int(np.percentile(a, 50)),
                'p90': int(np.percentile(a, 90)),
                'p99': int(np.percentile(a, 99)),
                'at_cap_frac': float((a >= cap).mean()),
                # straggler-resolve cap sizing: points still active past
                # each candidate phase-1 cutoff (resolve_cap must exceed
                # these with margin or phase 2 truncates)
                'active_past': {k: int((a > k).sum())
                                for k in (8, 12, 16, 24)}}

    def split_eff(deact, active, tile, cap, p1, resolve_cap):
        """Effective per-point iterations under the straggler-resolve
        split: phase 1 pays tile-max capped at p1; the still-active
        points re-solve from scratch in ceil(n_active/tile) tiles that
        pay their own (<= cap) tile max."""
        if p1 <= 0 or p1 >= cap:
            return tile_max_mean(deact, active, tile, cap)
        d = np.asarray(deact)
        act = np.asarray(active)
        phase1 = tile_max_mean(d, act, tile, p1)
        still = act & (np.minimum(d, cap) > p1)
        n_res = min(int(still.sum()), resolve_cap)
        res_iters = np.minimum(d[still], cap)[:n_res]
        n_tiles_res = -(-max(n_res, 1) // tile)
        phase2 = (n_tiles_res * tile
                  * (res_iters.max() if n_res else 0)) / len(d)
        return float(phase1 + phase2)

    out = {
        'rays': n,
        'samples': tr.n_steps,
        'march': split_eff(march_fin, march_active, tr.pallas_march_tile,
                           tr.sphere_tracing_iters,
                           tr.march_phase1_steps, tr.march_resolve_cap),
        'march_point_pcts': pcts(march_fin, march_active,
                                 tr.sphere_tracing_iters),
        'iso': split_eff(np.asarray(iso_res.steps)[:, 1],
                         np.ones(n, bool), tr.pallas_iso_tile,
                         tr.iso_max_steps, tr.iso_phase1_steps,
                         tr.iso_resolve_cap),
        'iso_point_pcts': pcts(iso_res.steps[:, 1], np.ones(n, bool),
                               tr.iso_max_steps),
        'split_phase1': {'corr': tr.corr_phase1_steps,
                         'march': tr.march_phase1_steps,
                         'iso': tr.iso_phase1_steps},
        'tiles': {'march': tr.pallas_march_tile, 'iso': tr.pallas_iso_tile,
                  'corr': tr.pallas_corr_tile},
        'method': 'mean over Pallas tiles of the tile-max capped '
                  'DEACTIVATION iteration (when a lane leaves the active '
                  'set by convergence or divergence-freeze; instrumented '
                  'XLA solvers, flagship bench scene, training-mode '
                  'sampler)',
    }

    C = tr.corr_coarse_stride
    if C > 1 and tr.n_steps % C == 0:
        # coarse-to-fine: effective per-SAMPLE-point iterations =
        # (coarse tile work + fine tile work) / total points
        from arah_tpu.render.ray_tracing import _warm_start_inits
        S = tr.n_steps
        Sc = S // C
        blk = lambda a: a.reshape((n, Sc, C) + a.shape[1:])
        xb_b, x0_b, T0_b, m_b = blk(x_bar), blk(x0), blk(T0), blk(flat_m)
        fc = lambda a: a[:, :, 0].reshape((n * Sc,) + a.shape[3:])
        solve = jax.jit(lambda xb, xi, ti, mm: search_canonical_corr(
            skin_fn, inp.frame, xb, xi, ti, max_steps=tr.corr_max_steps,
            cvg_thresh=tr.root_finding_threshold, active_init=mm,
            track_point_iters=True))
        res_c = jax.block_until_ready(
            solve(fc(xb_b), fc(x0_b), fc(T0_b), fc(m_b)))
        x_init, T_init = _warm_start_inits(
            tr, z.reshape(n, Sc, C), res_c.x.reshape(n, Sc, 3),
            res_c.aux.reshape(n, Sc, 4, 4), res_c.valid.reshape(n, Sc),
            x0_b[:, :, 1:], T0_b[:, :, 1:])
        nf = n * Sc * (C - 1)
        mf = m_b[:, :, 1:].reshape(nf)
        res_f = jax.block_until_ready(solve(
            xb_b[:, :, 1:].reshape(nf, 3), x_init.reshape(nf, 3),
            T_init.reshape(nf, 4, 4), mf))
        t = tr.pallas_corr_tile
        coarse_eff = tile_max_mean(np.asarray(res_c.steps)[:, 1],
                                   np.asarray(fc(m_b)), t,
                                   tr.corr_max_steps)
        fine_eff = tile_max_mean(np.asarray(res_f.steps)[:, 1], np.asarray(mf),
                                 t, tr.corr_max_steps)
        total_pts = n * S
        out['corr'] = (coarse_eff * (n * Sc)
                       + fine_eff * nf) / total_pts
        out['corr_coarse_tilemax'] = coarse_eff
        out['corr_fine_tilemax'] = fine_eff
        out['corr_stride'] = C
    else:
        out['corr'] = split_eff(np.asarray(corr_res.steps)[:, 1],
                                np.asarray(flat_m), tr.pallas_corr_tile,
                                tr.corr_max_steps, tr.corr_phase1_steps,
                                tr.corr_resolve_cap)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           args.out), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
