"""Benchmark: rays/s/chip for a full forward+backward training step of the
flagship (ZJU full-size) model on synthetic assets.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); `vs_baseline`
is computed against `baseline_rays_s` in BENCH_BASELINE.json if that file
exists (to be filled with a measured A100 reference number), else 0.0.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from arah_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from __graft_entry__ import _flagship_config, _build_scene
    from arah_tpu.data.batch import synthetic_train_batch
    from arah_tpu.model import init_model_params
    from arah_tpu.parallel.train_step import TrainState, make_train_step
    from arah_tpu.train.loss import LossWeights
    from arah_tpu.train.optim import OptimConfig, make_optimizer

    n_rays = int(os.environ.get('BENCH_RAYS', 2048))
    n_blocks = int(os.environ.get('BENCH_BLOCKS', 1))
    iters = int(os.environ.get('BENCH_ITERS', 5))

    cfg = _flagship_config()
    params, fd, _ = _build_scene(cfg, n_rays=16)
    batch = synthetic_train_batch(jax.random.PRNGKey(1), fd,
                                  n_blocks=n_blocks, n_rays=n_rays,
                                  n_reg=1024)
    loss_w = LossWeights(n_ray_loss=n_rays)
    optimizer, _ = make_optimizer(
        OptimConfig(train_skinning_net=cfg.train_skinning_net), params)
    state = TrainState(params, optimizer.init(params), jnp.int32(0))
    step = make_train_step(cfg, loss_w, optimizer)
    key = jax.random.PRNGKey(2)

    # compile + warmup
    state, losses = step(state, batch, key)
    jax.block_until_ready(losses['loss'])

    t0 = time.perf_counter()
    for i in range(iters):
        state, losses = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(losses['loss'])
    dt = (time.perf_counter() - t0) / iters

    rays_per_step = n_rays * n_blocks
    rays_per_s = rays_per_step / dt

    baseline = 0.0
    if os.path.exists('BENCH_BASELINE.json'):
        with open('BENCH_BASELINE.json') as f:
            baseline = float(json.load(f).get('baseline_rays_s', 0.0))
    vs = rays_per_s / baseline if baseline > 0 else 0.0

    print(json.dumps({
        'metric': 'train_rays_per_s_per_chip_fwd_bwd',
        'value': round(rays_per_s, 2),
        'unit': 'rays/s',
        'vs_baseline': round(vs, 3),
    }))


if __name__ == '__main__':
    main()
