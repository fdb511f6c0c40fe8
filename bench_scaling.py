"""Scaling-efficiency harness: sharded train step over an N-device mesh.

Measures steps/s of the data-parallel train step at several mesh sizes
with a fixed per-device ray-block load (weak scaling), and reports
efficiency vs the single-device rate. On this sandbox it runs on the
virtual CPU mesh (methodology check); on a real pod slice it measures ICI
/DCN scaling (BASELINE target: >= 85% at >= 2 hosts).

Usage: python bench_scaling.py [--devices 1 2 4 8] [--rays 256]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--devices', type=int, nargs='+', default=[1, 2, 4, 8])
    p.add_argument('--rays', type=int, default=256)
    p.add_argument('--iters', type=int, default=3)
    p.add_argument('--cpu', action='store_true',
                   help='force the virtual CPU mesh')
    args = p.parse_args()

    if args.cpu or os.environ.get('ARAH_SCALING_CPU') == '1':
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                                   + ' --xla_force_host_platform_device_count='
                                   + str(max(args.devices))).strip()
    import jax
    if args.cpu or os.environ.get('ARAH_SCALING_CPU') == '1':
        jax.config.update('jax_platforms', 'cpu')

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from __graft_entry__ import _flagship_config
    from arah_tpu.data.batch import synthetic_train_batch
    from arah_tpu.data.synthetic import synthetic_smpl
    from arah_tpu.model import init_model_params, prepare_frame
    from arah_tpu.parallel.mesh import block_sharding, replicated
    from arah_tpu.parallel.train_step import TrainState, make_train_step
    from arah_tpu.train.loss import LossWeights
    from arah_tpu.train.optim import OptimConfig, make_optimizer

    cfg = _flagship_config(small=True)
    model = synthetic_smpl(n_verts=512)
    rng = np.random.RandomState(0)
    params = init_model_params(jax.random.PRNGKey(0), cfg,
                               n_latent_frames=2)
    fd = prepare_frame(
        model, jnp.asarray(rng.randn(10).astype(np.float32) * 0.3),
        jnp.asarray((rng.randn(72) * 0.2).astype(np.float32)),
        jnp.zeros(3))
    loss_w = LossWeights(n_ray_loss=args.rays)
    optimizer, _ = make_optimizer(OptimConfig(), params)
    per_block = ('cam_loc', 'ray_dirs', 'near', 'far', 'rgb_gt',
                 'body_mask', 'points_uniform', 'points_skinning',
                 'points_inside', 'sampled_weights', 'rots_noise',
                 'view_noise', 'rot_noise', 'trans_noise', 'uv', 'cam_idx')

    results = {}
    for n_dev in args.devices:
        if n_dev > len(jax.devices()):
            continue
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ('data',))
        batch = synthetic_train_batch(jax.random.PRNGKey(1), fd,
                                      n_blocks=n_dev, n_rays=args.rays,
                                      n_reg=64)
        bs, rep = block_sharding(mesh), replicated(mesh)
        batch = batch._replace(
            **{f: jax.device_put(getattr(batch, f), bs)
               for f in per_block},
            frame=jax.device_put(batch.frame, rep),
            latent_idx=jax.device_put(batch.latent_idx, rep))
        state = jax.device_put(
            TrainState(params, optimizer.init(params), jnp.int32(0)), rep)
        step = make_train_step(cfg, loss_w, optimizer, mesh=mesh)
        key = jax.random.PRNGKey(2)
        state, losses = step(state, batch, key)
        jax.block_until_ready(losses['loss'])
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, losses = step(state, batch,
                                 jax.random.fold_in(key, i))
        jax.block_until_ready(losses['loss'])
        dt = (time.perf_counter() - t0) / args.iters
        results[n_dev] = {'step_s': dt,
                          'rays_per_s': n_dev * args.rays / dt}

    base = results.get(1, {}).get('rays_per_s')
    out = []
    for n_dev, r in sorted(results.items()):
        eff = r['rays_per_s'] / (base * n_dev) if base else None
        out.append({'devices': n_dev,
                    'rays_per_s': round(r['rays_per_s'], 1),
                    'efficiency': round(eff, 3) if eff else None})
    print(json.dumps(out))


if __name__ == '__main__':
    main()
