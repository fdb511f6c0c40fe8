#!/usr/bin/env python
"""Microbenchmark: joint iso-surface refinement, XLA vs fused Pallas."""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=8192)
    p.add_argument('--iters', type=int, default=5)
    p.add_argument('--tiles', default='256,512,1024')
    p.add_argument('--variants', default='xla,pallas')
    args = p.parse_args()

    import sys
    sys.path.insert(0, '.')
    from __graft_entry__ import _flagship_config, _build_scene
    from arah_tpu.render.ray_tracing import _march_xla
    from arah_tpu.render.renderer import (generate_sdf, make_sdf_fn,
                                          make_skin_fn)
    from arah_tpu.core.body import unnormalize_canonical_points
    from arah_tpu.solver.root_find import (iso_init_inv_jacobian,
                                           search_iso_surface_depth)
    from arah_tpu.ops.pallas.corr_kernel_t import skinning_dense_params
    from arah_tpu.ops.pallas.iso_kernel import iso_refine_pallas
    from arah_tpu.model import init_model_params

    cfg = _flagship_config()
    params, fd, inp = _build_scene(cfg, n_rays=args.n)
    gen = generate_sdf(params, cfg, inp.rots, inp.Jtrs, inp.geo_latent)
    sdf_fn = make_sdf_fn(gen)
    skin_fn = make_skin_fn(params, cfg)
    n = args.n
    cam_b = jnp.broadcast_to(inp.cam_loc, inp.ray_dirs.shape)

    c = jax.jit(lambda: _march_xla(cfg.tracer, sdf_fn, inp.frame, inp.smpl,
                                   cam_b, inp.ray_dirs, inp.near,
                                   inp.far))()
    jax.block_until_ready(c.t)
    x_hat = unnormalize_canonical_points(
        c.x_norm, inp.frame.coord_min, inp.frame.coord_max,
        inp.frame.center)
    valid = ~c.diverged
    print('valid frac:', float(valid.mean()))
    import os
    if os.environ.get('BENCH_ISO_ALL') == '1':
        valid = jnp.ones_like(valid)   # train-mode: solve every ray
        print('forcing all rays active (train-mode semantics)')

    def timeit(name, fn):
        out = jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jax.block_until_ready(fn())
        dt = (time.perf_counter() - t0) / args.iters
        print(f'{name:24s} {dt * 1e3:8.1f} ms')
        return out

    if 'xla' in args.variants:
        f = jax.jit(lambda: search_iso_surface_depth(
            sdf_fn, skin_fn, inp.frame, cam_b, inp.ray_dirs, valid,
            x_hat, c.t, c.T_fwd, max_steps=50))
        timeit('XLA iso', f)
    if 'pallas' in args.variants:
        wts, bs = skinning_dense_params(params['skinning'], cfg.skinning)
        J_inv0 = jax.jit(lambda: iso_init_inv_jacobian(
            sdf_fn, skin_fn, inp.frame, inp.ray_dirs, x_hat))()
        u0 = jnp.concatenate([x_hat, c.t[:, None]], axis=-1)
        for tile in [int(t) for t in args.tiles.split(',')]:
            f = lambda tile=tile: iso_refine_pallas(
                cam_b, inp.ray_dirs, u0, c.T_fwd.reshape(n, 16),
                J_inv0.reshape(n, 16), valid, list(wts), list(bs),
                inp.frame.bone_transforms.reshape(24, 16),
                list(gen.weights), list(gen.biases), list(gen.freqs),
                list(gen.phases), inp.frame.coord_min,
                inp.frame.coord_max, inp.frame.center, inp.frame.trans,
                tile=tile, max_steps=50,
                softmax_scale=cfg.skinning.softmax_scale)
            timeit(f'pallas iso tile={tile}', f)
        # also time the init-jacobian piece the kernel path adds
        f = jax.jit(lambda: iso_init_inv_jacobian(
            sdf_fn, skin_fn, inp.frame, inp.ray_dirs, x_hat))
        timeit('init inv-jacobian (XLA)', f)


if __name__ == '__main__':
    main()
