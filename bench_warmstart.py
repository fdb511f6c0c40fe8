#!/usr/bin/env python
"""Corr-solver iteration-count study: KNN init vs coarse-to-fine warm
start (VERDICT r3 next-round #1).

Builds the flagship bench scene, runs the real tracer up to the
canonical-correspondence inputs, then Broyden-solves the same points two
ways with per-point iteration tracking (`broyden(track_point_iters=...)`,
XLA path — iteration count is a property of (init, problem), not of the
backend, so the histogram transfers to the Pallas kernel whose per-tile
early exit pays the tile's worst point):

  A. reference semantics — every sample from its own KNN init;
  B. coarse-to-fine — every Cth sample from KNN init (full solve), the
     rest from interpolated bracketing coarse roots.

Prints one JSON line with both histograms, means, warm-start fallback
fraction, and agreement stats. Wall-clock A/B of the end-to-end train
step lives in bench_ablate.py (`--configs default,warm4`).
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rays', type=int, default=2048)
    p.add_argument('--stride', type=int, default=4)
    p.add_argument('--cpu', action='store_true')
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from arah_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config, _build_scene
    from arah_tpu.core.linalg import inv_affine
    from arah_tpu.ops.knn import nn_idx
    from arah_tpu.render.ray_tracing import (_warm_start_inits, sample_z_vals,
                                             sphere_trace)
    from arah_tpu.render.renderer import (generate_sdf, make_sdf_fn,
                                          make_skin_fn)
    from arah_tpu.solver.root_find import search_canonical_corr

    cfg = _flagship_config()
    params, fd, inp = _build_scene(cfg, n_rays=args.rays)
    gen = generate_sdf(params, cfg, inp.rots, inp.Jtrs, inp.geo_latent)
    sdf_fn = make_sdf_fn(gen, stop_grad=True)
    skin_fn = make_skin_fn(params, cfg, stop_grad=True)
    tr = cfg.tracer
    cam = jnp.broadcast_to(inp.cam_loc, inp.ray_dirs.shape)

    @jax.jit
    def trace_inputs():
        surf = sphere_trace(tr, sdf_fn, skin_fn, inp.frame, inp.smpl, cam,
                            inp.ray_dirs, inp.near, inp.far, eval_mode=True)
        z, m = sample_z_vals(tr, jax.random.PRNGKey(0), ~surf.unconverged,
                             surf.start_dis, inp.near, inp.far, True)
        pts = (cam[:, None, :]
               + z[..., None] * inp.ray_dirs[:, None, :]).reshape(-1, 3)
        idx = nn_idx(pts, inp.smpl.verts_posed)
        w = inp.smpl.skinning_weights[idx]
        T0 = jnp.einsum('nj,jab->nab', w, inp.frame.bone_transforms)
        Ti = inv_affine(T0)
        x_bar = pts - inp.frame.trans
        x0 = (jnp.einsum('nab,nb->na', Ti[:, :3, :3], x_bar)
              + Ti[:, :3, 3])
        return z, m, x_bar, x0, T0

    z, m, x_bar, x0, T0 = jax.block_until_ready(trace_inputs())
    n, S = z.shape
    C = args.stride
    Sc = S // C
    flat_m = m.reshape(-1)

    solve = jax.jit(lambda xb, xi, ti, mm: search_canonical_corr(
        skin_fn, inp.frame, xb, xi, ti, max_steps=tr.corr_max_steps,
        cvg_thresh=tr.root_finding_threshold, active_init=mm,
        track_point_iters=True))

    def stats(res, mm, tile=None):
        mm = np.asarray(mm)
        it = np.asarray(res.steps)[:, 0][mm]     # first convergence
        de_full = np.asarray(res.steps)[:, 1]    # deactivation (work)
        de = de_full[mm]
        ok = np.asarray(res.valid)[mm]
        hist = np.bincount(np.clip(it, 0, tr.corr_max_steps),
                           minlength=tr.corr_max_steps + 1)
        dhist = np.bincount(np.clip(de, 0, tr.corr_max_steps),
                            minlength=tr.corr_max_steps + 1)
        out = {'n': int(mm.sum()), 'valid': int(ok.sum()),
               'iters_mean': float(it[ok].mean()) if ok.any() else None,
               'iters_p50': int(np.percentile(it[ok], 50)) if ok.any() else None,
               'iters_p99': int(np.percentile(it[ok], 99)) if ok.any() else None,
               'deact_mean': float(de.mean()) if mm.any() else None,
               'deact_p99': int(np.percentile(de, 99)) if mm.any() else None,
               'hist': hist.tolist(), 'deact_hist': dhist.tolist()}
        if tile:
            # what the per-tile early-exit kernel pays: max over lanes
            w = np.where(mm, np.minimum(de_full, tr.corr_max_steps), 0)
            pad = (-len(w)) % tile
            if pad:
                w = np.concatenate([w, np.zeros(pad, w.dtype)])
            out['tile_max_mean'] = float(w.reshape(-1, tile).max(1).mean())
        return out

    # A: all points, KNN init
    res_a = jax.block_until_ready(solve(x_bar, x0, T0, flat_m))
    tile = tr.pallas_corr_tile
    out = {'rays': n, 'samples': S, 'stride': C,
           'knn_all': stats(res_a, np.asarray(flat_m), tile=tile)}

    # B: coarse-to-fine
    blk = lambda a: a.reshape((n, Sc, C) + a.shape[1:])
    xb_b, x0_b, T0_b, m_b = blk(x_bar), blk(x0), blk(T0), blk(flat_m)
    fc = lambda a: a[:, :, 0].reshape((n * Sc,) + a.shape[3:])
    res_c = jax.block_until_ready(
        solve(fc(xb_b), fc(x0_b), fc(T0_b), fc(m_b)))
    out['coarse'] = stats(res_c, np.asarray(fc(m_b)), tile=tile)

    xc = res_c.x.reshape(n, Sc, 3)
    Tc = res_c.aux.reshape(n, Sc, 4, 4)
    vc = res_c.valid.reshape(n, Sc)
    x_init, T_init = _warm_start_inits(
        tr._replace(corr_coarse_stride=C), z.reshape(n, Sc, C),
        xc, Tc, vc, x0_b[:, :, 1:], T0_b[:, :, 1:])
    nf = n * Sc * (C - 1)
    mf = m_b[:, :, 1:].reshape(nf)
    res_f = jax.block_until_ready(solve(
        xb_b[:, :, 1:].reshape(nf, 3), x_init.reshape(nf, 3),
        T_init.reshape(nf, 4, 4), mf))
    out['fine_warm'] = stats(res_f, np.asarray(mf), tile=tile)

    # fallback fraction: fine slots that did NOT get a two-sided bracket
    x_hi = jnp.concatenate([xc[:, 1:], xc[:, -1:]], axis=1)
    v_hi = jnp.concatenate([vc[:, 1:], vc[:, -1:]], axis=1)
    dist = jnp.linalg.norm(x_hi - xc, axis=-1)
    both = vc & v_hi & (dist < tr.corr_warm_gate)
    out['bracket_frac'] = float(
        jnp.broadcast_to(both[:, :, None], (n, Sc, C - 1)).reshape(nf)[
            mf].mean())

    # agreement between A and B on the common valid set
    va = np.asarray(res_a.valid)
    idx_f = np.arange(n * S).reshape(n, Sc, C)[:, :, 1:].reshape(-1)
    va_f = va[idx_f]
    vf = np.asarray(res_f.valid)
    common = va_f & vf
    xa_f = np.asarray(res_a.x)[idx_f]
    xf = np.asarray(res_f.x)
    d = np.linalg.norm(xa_f - xf, axis=-1)[common]
    out['valid_agreement'] = float((va_f == vf).mean())
    out['common_valid_root_dist_p99'] = float(np.percentile(d, 99))
    out['common_valid_root_dist_max'] = float(d.max())

    # effective work ratios. point-level: sum of per-point active
    # (deactivation) iterations. tile-level: what the shipped per-tile
    # early-exit kernel pays — N_points x tile-max mean.
    it_a = np.asarray(res_a.steps)[:, 1][np.asarray(flat_m)]
    work_a = float(np.minimum(it_a, tr.corr_max_steps).sum())
    it_c = np.asarray(res_c.steps)[:, 1][np.asarray(fc(m_b))]
    it_f = np.asarray(res_f.steps)[:, 1][np.asarray(mf)]
    work_b = float(np.minimum(it_c, tr.corr_max_steps).sum()
                   + np.minimum(it_f, tr.corr_max_steps).sum())
    out['point_iter_work_ratio'] = work_b / max(work_a, 1.0)
    tile_work_a = out['knn_all']['tile_max_mean'] * (n * S)
    tile_work_b = (out['coarse']['tile_max_mean'] * (n * Sc)
                   + out['fine_warm']['tile_max_mean'] * nf)
    out['tile_work_ratio'] = tile_work_b / max(tile_work_a, 1.0)

    print(json.dumps(out))


if __name__ == '__main__':
    main()
