#!/usr/bin/env python
"""On-device Pallas-vs-XLA agreement check (machine-readable).

CI tests the kernels in interpret mode only (tests/test_pallas.py on
CPU); a Mosaic *lowering* regression would ship silently. This script
runs on the real device and prints one JSON line per check plus a final
summary line {"check": "summary", "ok": true/false}, exit code 0/1.

Checks (flagship-size scene, pretrained synthetic body):
  1. eval render end-to-end: default kernel config (corr + march + shade
     kernels) vs the pure-XLA path — body mask agreement, rgb/depth
     max|d| on commonly-valid rays.
  2. fused shading fwd kernel vs XLA vmap(grad): sdf/feat/normal max|d|.
  3. fused shading VJP kernel vs the XLA reverse-over-forward path:
     max relative gradient error over every generated-SIREN leaf and
     the points (random-cotangent scalarization).

Usage: python bench_kernel_check.py [--rays 4096]
"""
import argparse
import json
import sys

import numpy as np


def emit(rec):
    print(json.dumps(rec), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rays', type=int, default=4096)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from arah_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config, _build_scene
    from arah_tpu.render.renderer import generate_sdf, render, siren_apply

    ok = True
    cfg = _flagship_config()
    params, fd, inp = _build_scene(cfg, n_rays=args.rays)
    key = jax.random.PRNGKey(7)

    # ---- 1. end-to-end eval render, kernels vs XLA
    cfg_xla = cfg._replace(
        use_pallas_shade=False, use_pallas_shade_grad=False,
        tracer=cfg.tracer._replace(use_pallas_corr=False,
                                   use_pallas_march=False,
                                   use_pallas_iso=False))

    def run(c):
        f = jax.jit(lambda p, i: render(p, c, i, key, training=False))
        return jax.tree.map(np.asarray, f(params, inp))

    out_k = run(cfg)
    out_x = run(cfg_xla)
    m_k = out_k['network_body_mask']
    m_x = out_x['network_body_mask']
    mask_agree = float((m_k == m_x).mean())
    both = m_k & m_x
    rgb_d = float(np.abs(out_k['rgb_values'][both]
                         - out_x['rgb_values'][both]).max()) \
        if both.any() else 0.0
    dep_d = float(np.abs(out_k['surface_depth'][both]
                         - out_x['surface_depth'][both]).max()) \
        if both.any() else 0.0
    # bf16_shading rounds matmul operands in BOTH paths, but the kernels
    # reassociate the dots; boundary rays of the 30x sine net can reach
    # ~1e-2 under bf16 (PERF.md), exact-f32 paths agree to ~1e-9
    rgb_tol = 5e-2 if cfg.bf16_shading else 1e-6
    rec_ok = mask_agree > 0.995 and rgb_d < rgb_tol and dep_d < 1e-5
    ok &= rec_ok
    emit({'check': 'eval_render_kernels_vs_xla', 'rays': args.rays,
          'mask_agreement': round(mask_agree, 5),
          'rgb_max_abs_diff_both_valid': rgb_d,
          'depth_max_abs_diff_both_valid': dep_d,
          'bf16_shading': cfg.bf16_shading, 'ok': rec_ok})

    # ---- 2+3. fused shading kernels at flagship sizes (exact f32)
    gen = generate_sdf(params, cfg, fd.rots, fd.Jtrs, params['latent'][0])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8192, 3)).astype(np.float32))

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
    d_out = float(jnp.abs(o_x - o_k).max())
    d_feat = float(jnp.abs(f_x - f_k).max())
    d_grad = float(jnp.abs(g_x - g_k).max())
    rec_ok = d_out < 1e-5 and d_feat < 1e-5 and d_grad < 1e-3
    ok &= rec_ok
    emit({'check': 'shade_fwd_kernel_vs_xla', 'points': int(x.shape[0]),
          'sdf_max_abs_diff': d_out, 'feat_max_abs_diff': d_feat,
          'normal_max_abs_diff': d_grad, 'ok': rec_ok})

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
        lambda g, pts: siren_shade_grad(g, pts, tile=512, tile_bwd=128)),
        argnums=(0, 1)))(gen, x)
    worst = 0.0
    for a, b in zip(jax.tree.leaves(gr_x), jax.tree.leaves(gr_k)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        worst = max(worst, float(np.abs(a - b).max() / scale))
    rec_ok = worst < 1e-4
    ok &= rec_ok
    emit({'check': 'shade_vjp_kernel_vs_xla', 'points': int(x.shape[0]),
          'max_rel_grad_err': worst, 'ok': rec_ok})

    emit({'check': 'summary', 'ok': bool(ok)})
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
