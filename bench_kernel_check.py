#!/usr/bin/env python
"""On-device Pallas-vs-XLA agreement check (machine-readable).

CI tests the kernels in interpret mode only (tests/test_pallas.py on
CPU); a Mosaic *lowering* regression would ship silently. This script
runs on the real device and prints one JSON line per check plus a final
summary line {"check": "summary", "ok": true/false}, exit code 0/1.

Thresholds are ROBUST statistics, not maxima: the generated SIREN is a
30x sine chain, so float reassociation between the kernel and XLA is
chaos-amplified ~30x per layer — measured on v5e with exact-f32 dots on
a random-init flagship gen: sdf |d| median 2.8e-4 / max 2.3e-3, feat
median 4.5e-3 / max 0.10, normal median 4.3e-3 (bit-identical in
interpret mode). A lowering regression produces O(1) medians and broken
masks; reassociation noise cannot move a median past these thresholds.

Checks:
  1. eval render end-to-end: default kernel config (corr + march + shade
     kernels) vs the pure-XLA path — body-mask agreement, rgb/depth
     median+p95 over commonly-valid rays (a few rays legitimately
     converge to a different-but-valid root, so max is not a signal).
  2. fused shading fwd kernel vs XLA vmap(grad) on a random-init
     flagship gen: sdf/feat/normal median |d|.
  3. fused shading VJP kernel vs the XLA reverse-over-forward path:
     per-leaf gradient-norm relative error (norms average out the
     decorrelated reassociation noise; a regression is O(1)).

Runtime: the default shapes are sized for a bounded DRIVER-RUNNABLE
check (<300 s warm, see `wall_s` in the summary line); `--full` restores
the round-3 calibration shapes (4096 rays / 8192 points — first cold run
can take >10 min of axon remote compiles). Every graph persists to the
on-disk compilation cache, so the second run of either mode is warm.
The medians the thresholds gate on are size-robust statistics.

Usage: python bench_kernel_check.py [--rays N] [--points N] [--full]
"""
import argparse
import json
import sys
import time

import numpy as np

T0 = time.perf_counter()


def emit(rec):
    rec = dict(rec, wall_s=round(time.perf_counter() - T0, 1))
    print(json.dumps(rec), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rays', type=int, default=None)
    p.add_argument('--points', type=int, default=None)
    p.add_argument('--full', action='store_true',
                   help='round-3 calibration shapes (4096 rays/8192 pts)')
    args = p.parse_args()
    if args.rays is None:
        args.rays = 4096 if args.full else 1024
    if args.points is None:
        args.points = 8192 if args.full else 4096

    import jax
    import jax.numpy as jnp
    from arah_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config, _build_scene
    from arah_tpu.render.renderer import render, siren_apply

    ok = True
    cfg = _flagship_config()
    params, fd, inp = _build_scene(cfg, n_rays=args.rays)
    key = jax.random.PRNGKey(7)

    def run(c):
        f = jax.jit(lambda p, i: render(p, c, i, key, training=False))
        return jax.tree.map(np.asarray, f(params, inp))

    # trusted-path SDF for root-validity classification: the XLA siren
    # on the same generated weights the render used
    from arah_tpu.render.renderer import generate_sdf
    gen_scene = generate_sdf(params, cfg, inp.rots, inp.Jtrs,
                             inp.geo_latent)
    sdf_xla = jax.jit(lambda q: siren_apply(gen_scene, q)[..., 0])

    def compare(out_a, out_b):
        m_a = out_a['network_body_mask']
        m_b = out_b['network_body_mask']
        both = m_a & m_b
        stats = {'mask_agreement': round(float((m_a == m_b).mean()), 5)}
        for name, key_ in (('rgb', 'rgb_values'),
                           ('depth', 'surface_depth')):
            d = np.abs(out_a[key_][both] - out_b[key_][both]).ravel() \
                if both.any() else np.zeros(1)
            stats[f'{name}_med'] = round(float(np.median(d)), 8)
            stats[f'{name}_p95'] = round(float(np.quantile(d, 0.95)), 8)
            stats[f'{name}_max'] = round(float(d.max()), 8)
        # --- root-validity of the disagreeing tail (VERDICT r4 #6):
        # a chaotic Broyden flip lands on a DIFFERENT VALID root —
        # |sdf_xla(root)| stays near the 1e-5 convergence threshold
        # (plus the ~3e-4 kernel-vs-XLA reassociation noise measured in
        # the module docstring); a silent kernel bug confined to
        # stragglers produces O(0.1-1) residuals. 5e-3 separates the
        # two regimes by >1 order of magnitude on both sides.
        flipped = (m_a != m_b) | (both & (np.abs(
            out_a['surface_depth'] - out_b['surface_depth']) > 1e-3))
        stats['flipped_rays'] = int(flipped.sum())
        fracs = []
        for out in (out_a, out_b):
            check = flipped & out['surface_converged'] \
                & out['network_body_mask']
            if check.any():
                resid = np.abs(np.asarray(sdf_xla(
                    jnp.asarray(out['surface_points_norm'][check]))))
                fracs.append(float((resid < 5e-3).mean()))
                stats['flipped_resid_max'] = max(
                    stats.get('flipped_resid_max', 0.0),
                    round(float(resid.max()), 6))
        stats['flipped_valid_frac'] = round(min(fracs), 5) if fracs \
            else 1.0
        return stats

    # ---- 1a. end-to-end eval render, kernels vs XLA, single-pass
    # solvers on BOTH sides: a pure Mosaic-lowering regression check
    # (the straggler-resolve splits are disabled here because their
    # phase-2 batch shape resamples the floating-point chaos of hard
    # stragglers — see check 1b — which would mask a lowering bug)
    nosplit = dict(corr_phase1_steps=0, march_phase1_steps=0,
                   iso_phase1_steps=0)
    cfg_k0 = cfg._replace(tracer=cfg.tracer._replace(**nosplit))
    cfg_x0 = cfg_k0._replace(
        use_pallas_shade=False, use_pallas_shade_grad=False,
        color=cfg_k0.color._replace(use_pallas=False),
        tracer=cfg_k0.tracer._replace(use_pallas_corr=False,
                                      use_pallas_march=False,
                                      use_pallas_iso=False))
    out_k0 = run(cfg_k0)
    stats = compare(out_k0, run(cfg_x0))
    rec_ok = (stats['mask_agreement'] > 0.98 and stats['rgb_med'] < 1e-2
              and stats['depth_med'] < 1e-4
              and stats['flipped_valid_frac'] > 0.9)
    ok &= rec_ok
    emit({'check': 'eval_render_kernels_vs_xla', 'rays': args.rays,
          **stats, 'bf16_shading': cfg.bf16_shading, 'ok': rec_ok})

    # ---- 1b. straggler-resolve split vs single-pass, kernel path:
    # scheduling invariance. Identical in exact arithmetic; in floats
    # the phase-2 resolve batch reassociates gemms at the ulp level and
    # Broyden is chaotic for hard stragglers past ~16 iterations, so a
    # few marginal rays (~2% of box rays) flip to a
    # different-but-equally-valid root — measured 0.963-0.981 agreement
    # band on the bench scene; a real scheduling bug (wrong
    # gather/scatter, cap overflow) collapses agreement entirely.
    stats = compare(out_k0, run(cfg))
    rec_ok = (stats['mask_agreement'] > 0.95 and stats['rgb_med'] < 1e-2
              and stats['depth_med'] < 1e-4
              and stats['flipped_valid_frac'] > 0.9)
    ok &= rec_ok
    emit({'check': 'eval_render_split_vs_singlepass', 'rays': args.rays,
          'phase1': cfg.tracer.corr_phase1_steps, **stats, 'ok': rec_ok})

    # ---- 2+3. fused shading kernels, random-init flagship gen, exact f32
    # (matches the calibration measurements in the docstring)
    from arah_tpu.nn.hypernet import (hypernet_cond, hypernet_generate,
                                      init_hypernet)
    rng = np.random.RandomState(0)
    hcfg = cfg.hypernet
    hp = init_hypernet(jax.random.PRNGKey(0), hcfg)
    cond = hypernet_cond(
        hp, hcfg, jnp.asarray(rng.randn(1, 24, 9).astype(np.float32)),
        jnp.asarray(rng.randn(1, 24, 3).astype(np.float32)))[0]
    latent = jnp.asarray(rng.randn(hcfg.latent_dim).astype(np.float32)) \
        if hcfg.use_film else None
    gen = hypernet_generate(hp, hcfg, cond, latent)
    x = jnp.asarray(rng.uniform(-1, 1,
                                (args.points, 3)).astype(np.float32))

    def xla_path(g, pts):
        def sdf_feat(q):
            out, feat = siren_apply(g, q[None], return_features=True)
            return out[0, 0], (out[0], feat[0])
        grads, (out, feat) = jax.vmap(
            jax.jacfwd(sdf_feat, has_aux=True))(pts)
        return out, feat, grads

    from arah_tpu.ops.pallas.shade_kernel import siren_shade_pallas
    o_x, f_x, g_x = jax.jit(xla_path)(gen, x)
    o_k, f_k, g_k = jax.jit(
        lambda g, pts: siren_shade_pallas(g, pts, tile=512))(gen, x)
    med = lambda a, b: float(np.median(np.abs(np.asarray(a)
                                              - np.asarray(b))))
    d_out, d_feat, d_grad = med(o_x, o_k), med(f_x, f_k), med(g_x, g_k)
    rec_ok = d_out < 3e-3 and d_feat < 5e-2 and d_grad < 5e-2
    ok &= rec_ok
    emit({'check': 'shade_fwd_kernel_vs_xla', 'points': int(x.shape[0]),
          'sdf_med_abs_diff': d_out, 'feat_med_abs_diff': d_feat,
          'normal_med_abs_diff': d_grad, 'ok': rec_ok})

    from arah_tpu.ops.pallas.shade_grad_kernel import siren_shade_grad
    co = jnp.asarray(rng.randn(*o_x.shape).astype(np.float32))
    cf = jnp.asarray(rng.randn(*f_x.shape).astype(np.float32))
    cn = jnp.asarray(rng.randn(*g_x.shape).astype(np.float32))

    def loss(fn):
        return lambda g, pts: (
            jnp.sum(fn(g, pts)[0] * co) + jnp.sum(fn(g, pts)[1] * cf)
            + jnp.sum(fn(g, pts)[2] * cn))

    gr_x = jax.jit(jax.grad(loss(xla_path), argnums=(0, 1)))(gen, x)
    gr_k = jax.jit(jax.grad(loss(
        lambda g, pts: siren_shade_grad(g, pts, tile=512, tile_bwd=256)),
        argnums=(0, 1)))(gen, x)
    worst_norm_rel, worst_leaf = 0.0, ''
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gr_x),
            jax.tree_util.tree_leaves_with_path(gr_k)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        na = np.linalg.norm(a)
        rel = float(np.linalg.norm(a - b) / max(na, 1e-3))
        if rel > worst_norm_rel:
            worst_norm_rel, worst_leaf = rel, jax.tree_util.keystr(pa)
    # threshold note: the worst leaf is historically an early-layer
    # freq/phase grad — its cotangent path runs through the full 30x-sine
    # chain TWICE (primal + normal adjoint), so reassociation chaos is
    # amplified ~30^2x relative to a late-layer weight grad; the measured
    # ~4% norm-rel-err on random-init weights is that noise, not a
    # lowering bug (a real regression is O(1) and flips eval_render
    # agreement too). Values are bit-identical in interpret mode
    # (tests/test_pallas.py).
    rec_ok = worst_norm_rel < 0.05
    ok &= rec_ok
    emit({'check': 'shade_vjp_kernel_vs_xla', 'points': int(x.shape[0]),
          'worst_leaf_grad_norm_rel_err': worst_norm_rel,
          'worst_leaf': worst_leaf, 'ok': rec_ok})

    emit({'check': 'summary', 'ok': bool(ok)})
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
