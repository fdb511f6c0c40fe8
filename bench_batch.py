#!/usr/bin/env python
"""Per-chip batch-size (rays/step) scaling curve for the flagship train
step (VERDICT r3 next-round #2), drift-robust: all sizes compile in ONE
process and their timed rounds interleave (A,B,C,A,B,C,...), medians per
size — the axon-tunnelled TPU's wall clock drifts >2x between processes
(PERF.md), so sequential sweeps are meaningless.

Also sweeps eval chunk sizes with --phase eval.

Fixed overheads (Adam ~3 ms on 90 M params, per-frame hypernet,
~4-5 ms dispatch gap) amortize with bigger ray blocks; per-ray blocks
(corr/march/shade) scale linearly. The reference fixes rays-per-IMAGE
(1024 fg + 1024 bg, `configs/arah-zju/ZJUMOCAP-313_4gpus.yaml:45-50`),
not rays-per-step, so a larger per-step block keeps reference loss
semantics (denominators are per-ray).
"""
import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--phase', default='train', choices=['train', 'eval'])
    p.add_argument('--sizes', default='2048,4096,8192,16384')
    p.add_argument('--rounds', type=int, default=6)
    p.add_argument('--iters', type=int, default=3)
    args = p.parse_args()

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp
    from arah_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config, _build_scene
    from bench import apply_env_overrides

    cfg = apply_env_overrides(_flagship_config())
    sizes = [int(s) for s in args.sizes.split(',')]
    fns = {}

    if args.phase == 'train':
        from arah_tpu.data.batch import synthetic_train_batch
        from arah_tpu.parallel.train_step import (TrainState,
                                                  make_train_step)
        from arah_tpu.train.loss import LossWeights
        from arah_tpu.train.optim import OptimConfig, make_optimizer
        params, fd, _ = _build_scene(cfg, n_rays=16)
        optimizer, _ = make_optimizer(OptimConfig(train_skinning_net=True),
                                      params)
        state = TrainState(params, optimizer.init(params), jnp.int32(0))
        key = jax.random.PRNGKey(2)
        for n in sizes:
            batch = synthetic_train_batch(jax.random.PRNGKey(1), fd,
                                          n_blocks=1, n_rays=n,
                                          n_reg=1024)
            step = make_train_step(cfg, LossWeights(n_ray_loss=n),
                                   optimizer, donate=False)
            fns[n] = (lambda step=step, batch=batch:
                      step(state, batch, key)[1]['loss'])
    else:
        from arah_tpu.render.renderer import render
        key = jax.random.PRNGKey(1)
        for n in sizes:
            params, fd, inp = _build_scene(cfg, n_rays=n)
            f = jax.jit(lambda p, i: render(
                p, cfg, i, key, training=False)['rgb_values'])
            fns[n] = (lambda f=f, params=params, inp=inp: f(params, inp))

    for n, f in fns.items():
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        print(f'compiled {n} rays in {time.perf_counter() - t0:.0f}s',
              flush=True)

    times = {n: [] for n in sizes}
    for r in range(args.rounds):
        for n in sizes:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fns[n]()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            times[n].append(dt)
            print(f'round {r} rays={n:6d} {n / dt:9.0f} rays/s '
                  f'({dt * 1e3:.1f} ms)', flush=True)

    print('--- medians ---')
    base = None
    for n in sizes:
        med = float(np.median(times[n]))
        rps = n / med
        if base is None:
            base = rps
        print(f'rays={n:6d} {rps:9.0f} rays/s  {med * 1e3:8.1f} ms/step '
              f'({rps / base:.2f}x vs {sizes[0]})')


if __name__ == '__main__':
    main()
