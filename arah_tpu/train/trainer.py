"""Training loop: epochs over frames, checkpointing, logging, profiling.

Re-design of the reference's Lightning trainer usage (`train.py:83-135`):
epoch loop over the frame sampler, jitted (optionally sharded) train step,
Orbax checkpoint/resume (incl. `--epochs-per-run` style job chaining and
`--exit-after` timed exit), TSV/stdout metric logging, and optional JAX
profiler traces (the reference has no profiling subsystem at all).
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from arah_tpu.data.batch import identity_noise, sample_noise
from arah_tpu.data.loader import (FrameBatchSampler, Prefetcher,
                                  collate_train_batch)
from arah_tpu.parallel.train_step import TrainState, make_train_step
from arah_tpu.train import checkpoints as ckpt_lib


class MetricLogger:
    """TSV + stdout metrics (wandb-free observability)."""

    def __init__(self, out_dir: str, log_every: int = 10):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, 'metrics.tsv')
        self.log_every = log_every
        self._header_written = os.path.exists(self.path)

    def log(self, step: int, metrics: dict):
        if step % self.log_every:
            return
        vals = {k: float(v) for k, v in metrics.items()}
        if not self._header_written:
            with open(self.path, 'a') as f:
                f.write('step\t' + '\t'.join(vals) + '\n')
            self._header_written = True
        with open(self.path, 'a') as f:
            f.write(f'{step}\t' + '\t'.join(f'{v:.6g}'
                                            for v in vals.values()) + '\n')
        print(f'[step {step}] ' + ' '.join(
            f'{k}={v:.4g}' for k, v in vals.items()), flush=True)


def train(cfg: dict, model_cfg, loss_w, optim_cfg, dataset, params,
          mesh=None, max_epochs: int | None = None,
          exit_after: float | None = None, profile_dir: str | None = None,
          pose_input_noise: bool = False, view_input_noise: bool = False,
          nv_noise_type: str = 'rotation', seed: int = 0,
          checkpoint_every_n_epochs: int | None = None,
          on_epoch_end: Callable | None = None,
          smpl_model=None, refine_smpl: bool = False,
          refine_cameras: bool = False):
    """Run training; returns (final TrainState, stopped_early).

    Resumes from `out_dir/checkpoints` when present (the reference's
    `last.ckpt` + job-chaining contract, `train.py:103-135`);
    `stopped_early` is True when `exit_after` fired (callers exit with
    code 2 per the reference's timed-exit contract, `train.py:28-34`).
    """
    from arah_tpu.train.optim import make_optimizer

    out_dir = cfg['training']['out_dir']
    ckpt_dir = os.path.join(out_dir, 'checkpoints')
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = MetricLogger(out_dir)

    optimizer, _ = make_optimizer(optim_cfg, params)
    state = TrainState(params, optimizer.init(params), jnp.int32(0))

    start_epoch = 0
    restored, step = ckpt_lib.restore_checkpoint(ckpt_dir, state)
    if restored is not None:
        state = restored
        meta_path = os.path.join(ckpt_dir, 'META.json')
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                start_epoch = json.load(f).get('epoch', 0)
        print(f'resumed from step {step} (epoch {start_epoch})', flush=True)

    step_fn = make_train_step(model_cfg, loss_w, optimizer, mesh=mesh,
                              smpl_model=smpl_model,
                              refine_smpl=refine_smpl,
                              refine_cameras=refine_cameras)
    sampler = FrameBatchSampler(dataset, shuffle=True, seed=seed)
    key = jax.random.PRNGKey(seed)
    if max_epochs is None:
        max_epochs = cfg['training'].get('max_epochs', 250)
    if checkpoint_every_n_epochs is None:
        checkpoint_every_n_epochs = cfg['training'].get(
            'checkpoint_every_n_epochs', 10)

    t_start = time.time()
    stop = False
    epoch = start_epoch

    def save(epoch):
        ckpt_lib.save_checkpoint(ckpt_dir, int(state.step), state)
        with open(os.path.join(ckpt_dir, 'META.json'), 'w') as f:
            json.dump({'epoch': epoch, 'step': int(state.step)}, f)

    for epoch in range(start_epoch, max_epochs):
        def collate(items, _key_holder=[0]):
            key_b = jax.random.fold_in(key, _key_holder[0])
            _key_holder[0] += 1
            noise = None
            if pose_input_noise or view_input_noise:
                noise = sample_noise(key_b, len(items), pose_input_noise,
                                     view_input_noise, nv_noise_type)
            return collate_train_batch(items, noise)

        with Prefetcher(dataset, sampler, collate) as prefetcher:
            for batch in prefetcher:
                step_i = int(state.step)
                if profile_dir and step_i == 8:
                    jax.profiler.start_trace(profile_dir)
                state, losses = step_fn(
                    state, batch, jax.random.fold_in(key, step_i))
                logger.log(step_i, losses)
                if profile_dir and step_i == 10:
                    jax.block_until_ready(losses['loss'])
                    jax.profiler.stop_trace()
                if exit_after is not None \
                        and time.time() - t_start > exit_after:
                    print('exit-after reached; checkpointing', flush=True)
                    stop = True
                    break
        if stop:
            break
        if (epoch + 1) % checkpoint_every_n_epochs == 0:
            save(epoch + 1)
        if on_epoch_end is not None:
            on_epoch_end(epoch, state)

    save(epoch + 1 if not stop else epoch)
    return state, stop
