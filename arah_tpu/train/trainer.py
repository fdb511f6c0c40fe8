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

from arah_tpu.data.batch import sample_noise
from arah_tpu.data.loader import (FrameBatchSampler, Prefetcher,
                                  batch_to_device, collate_train_batch_np)
from arah_tpu.parallel.train_step import TrainState, make_train_step
from arah_tpu.train import checkpoints as ckpt_lib


class MetricLogger:
    """TSV + stdout metrics (wandb-free observability).

    The header is validated against the current metric columns on every
    run: resuming with a different loss set appends a fresh header row
    instead of silently misaligning columns."""

    def __init__(self, out_dir: str, log_every: int = 10,
                 filename: str = 'metrics.tsv'):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, filename)
        self.log_every = log_every
        self._columns = self._last_header()

    def _last_header(self):
        if not os.path.exists(self.path):
            return None
        cols = None
        with open(self.path) as f:
            for line in f:
                first = line.split('\t', 1)[0]
                if first == 'step':
                    cols = line.rstrip('\n').split('\t')[1:]
        return cols

    def log(self, step: int, metrics: dict):
        if step % self.log_every:
            return
        vals = {k: float(v) for k, v in metrics.items()}
        if self._columns != list(vals):
            with open(self.path, 'a') as f:
                f.write('step\t' + '\t'.join(vals) + '\n')
            self._columns = list(vals)
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
          refine_cameras: bool = False,
          val_dataset=None, validate_every_n_epochs: int | None = None,
          val_max_frames: int = 4,
          sampler_shard_id: int = 0, sampler_num_shards: int = 1):
    """Run training; returns (final TrainState, stopped_early).

    Resumes from `out_dir/checkpoints` when present (the reference's
    `last.ckpt` + job-chaining contract, `train.py:103-135`);
    `stopped_early` is True when `exit_after` fired (callers exit with
    code 2 per the reference's timed-exit contract, `train.py:28-34`).
    """
    from arah_tpu.train.optim import make_optimizer

    is_main = jax.process_index() == 0
    multiprocess = jax.process_count() > 1
    if multiprocess and sampler_num_shards == 1:
        # default: shard views over processes (DDP-style per-rank data)
        sampler_shard_id = jax.process_index()
        sampler_num_shards = jax.process_count()

    out_dir = cfg['training']['out_dir']
    ckpt_dir = os.path.join(out_dir, 'checkpoints')
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = MetricLogger(out_dir) if is_main else None

    optimizer, _ = make_optimizer(optim_cfg, params)
    state = TrainState(params, jax.jit(optimizer.init)(params), jnp.int32(0))

    start_epoch = 0
    restored, step = ckpt_lib.restore_checkpoint(ckpt_dir, state)
    if restored is not None:
        state = restored
        meta_path = os.path.join(ckpt_dir, 'META.json')
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                start_epoch = json.load(f).get('epoch', 0)
        print(f'resumed from step {step} (epoch {start_epoch})', flush=True)

    if mesh is not None:
        # explicit replicated placement over the (possibly multi-host)
        # mesh; required in multi-process runtimes, avoids an implicit
        # jit-entry reshard in single-process ones
        from arah_tpu.parallel.distributed import replicate_over_mesh
        state = replicate_over_mesh(state, mesh)

    # per-block-frame mode (`training.multi_frame_batch: true`): each ray
    # block carries its OWN frame — independent (frame, view) draws per
    # step instead of the reference's all-views-of-one-frame batches
    # (decorrelated gradients, frames-per-chip scaling; see TrainBatch)
    multi_frame = bool(cfg['training'].get('multi_frame_batch', False))
    step_fn = make_train_step(model_cfg, loss_w, optimizer, mesh=mesh,
                              smpl_model=smpl_model,
                              refine_smpl=refine_smpl,
                              refine_cameras=refine_cameras,
                              per_block_frame=multi_frame)
    # pad each step to a shardable block count: local blocks must be a
    # multiple of this process's device share of the mesh
    block_multiple = 1
    if mesh is not None:
        block_multiple = max(1, mesh.devices.size // jax.process_count())
    if multi_frame:
        from arah_tpu.data.loader import MultiFrameBatchSampler
        sampler = MultiFrameBatchSampler(dataset, block_multiple,
                                         shuffle=True, seed=seed,
                                         shard_id=sampler_shard_id,
                                         num_shards=sampler_num_shards)
    else:
        sampler = FrameBatchSampler(dataset, shuffle=True, seed=seed,
                                    shard_id=sampler_shard_id,
                                    num_shards=sampler_num_shards,
                                    block_multiple=block_multiple)
    key = jax.random.PRNGKey(seed)
    if max_epochs is None:
        max_epochs = cfg['training'].get('max_epochs', 250)
    if checkpoint_every_n_epochs is None:
        checkpoint_every_n_epochs = cfg['training'].get(
            'checkpoint_every_n_epochs', 10)
    if validate_every_n_epochs is None:
        validate_every_n_epochs = cfg['training'].get(
            'validate_every_n_epochs', 0) if val_dataset is not None else 0
    val_logger = MetricLogger(out_dir, log_every=1,
                              filename='val_metrics.tsv') \
        if (val_dataset is not None and validate_every_n_epochs
            and is_main) else None

    best_path = os.path.join(ckpt_dir, 'BEST.json')
    best_psnr = -float('inf')
    if os.path.exists(best_path):
        with open(best_path) as f:
            best_psnr = json.load(f).get('val_psnr', -float('inf'))

    def run_validation(epoch, state):
        """In-training periodic validation (ref `train.py:125` +
        `check_val_every_n_epoch`, `ZJUMOCAP-313_4gpus.yaml:48`),
        with best-checkpoint selection (beyond-reference: the reference
        keeps only `last.ckpt`; the fixture study shows val PSNR can
        decay past its peak, PERF.md)."""
        nonlocal best_psnr
        from arah_tpu.eval.evaluator import evaluate_frame
        params = state.params
        if multiprocess:
            # global replicated arrays -> host-local (process-local jit)
            params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                  params)
        rows = []
        n = min(val_max_frames, len(val_dataset))
        for i in range(n):
            item = val_dataset[i]
            latent = None
            if 'latent' in params:
                d_idx = int(item['inputs.data_idx'])
                if d_idx >= params['latent'].shape[0]:
                    d_idx = params['latent'].shape[0] - 1
                latent = params['latent'][d_idx]
            m = evaluate_frame(params, model_cfg, item, latent)
            rows.append({k: float(m[k]) for k in ('psnr', 'ssim')})
        agg = {f'val_{k}': float(np.mean([r[k] for r in rows]))
               for k in rows[0]} if rows else {}
        agg['epoch'] = epoch
        val_logger.log(int(state.step), agg)
        if agg.get('val_psnr', -float('inf')) > best_psnr:
            best_psnr = agg['val_psnr']
            if not multiprocess:
                # Orbax save is collective; run_validation is rank-0-only
                # in multi-process runs, so the full best-state save is
                # single-process-only — BEST.json still records the best
                # step for the nearest periodic checkpoint either way
                ckpt_lib.save_checkpoint(ckpt_dir, int(state.step), state)
            with open(best_path, 'w') as f:
                json.dump({'step': int(state.step), 'epoch': epoch,
                           'val_psnr': best_psnr,
                           'val_ssim': agg.get('val_ssim')}, f)

    t_start = time.time()
    stop = False
    epoch = start_epoch

    def save(epoch):
        # all processes participate (Orbax multi-host save is collective);
        # META.json is written by process 0 only
        ckpt_lib.save_checkpoint(ckpt_dir, int(state.step), state)
        if is_main:
            with open(os.path.join(ckpt_dir, 'META.json'), 'w') as f:
                json.dump({'epoch': epoch, 'step': int(state.step)}, f)

    # host-side augmentation RNG: numpy so `collate` stays JAX-free in
    # prefetch workers (see data/loader.py concurrency contract); the
    # lock keeps concurrent prefetch collates from racing the RNG stream
    import threading
    noise_rng = np.random.RandomState(seed + 17)
    noise_lock = threading.Lock()

    def collate(items):
        noise = None
        if pose_input_noise or view_input_noise:
            n_rays = np.asarray(items[0]['inputs.ray_dirs']).shape[0]
            with noise_lock:
                noise = sample_noise(noise_rng, len(items),
                                     pose_input_noise, view_input_noise,
                                     nv_noise_type, n_rays=n_rays)
        return collate_train_batch_np(items, noise,
                                      per_block_frame=multi_frame)

    if mesh is not None:
        from arah_tpu.parallel.distributed import make_global_batch
        postprocess = lambda b: make_global_batch(  # noqa: E731
            mesh, b, per_block_frame=multi_frame)
    else:
        postprocess = batch_to_device

    for epoch in range(start_epoch, max_epochs):
        with Prefetcher(dataset, sampler, collate,
                        postprocess=postprocess) as prefetcher:
            for batch in prefetcher:
                step_i = int(state.step)
                if profile_dir and step_i == 8:
                    jax.profiler.start_trace(profile_dir)
                state, losses = step_fn(
                    state, batch, jax.random.fold_in(key, step_i))
                if logger is not None:
                    logger.log(step_i, losses)
                if profile_dir and step_i == 10:
                    jax.block_until_ready(losses['loss'])
                    jax.profiler.stop_trace()
                if exit_after is not None:
                    over = time.time() - t_start > exit_after
                    if multiprocess:
                        # all processes must agree on the stop decision
                        # (a lone break would strand the others in the
                        # next collective) — broadcast process 0's clock
                        from jax.experimental import multihost_utils
                        over = bool(multihost_utils.broadcast_one_to_all(
                            np.asarray(over)))
                    if over:
                        print('exit-after reached; checkpointing',
                              flush=True)
                        stop = True
                        break
        if stop:
            break
        if (epoch + 1) % checkpoint_every_n_epochs == 0:
            save(epoch + 1)
        if val_logger is not None \
                and (epoch + 1) % validate_every_n_epochs == 0:
            run_validation(epoch + 1, state)
        if on_epoch_end is not None:
            on_epoch_end(epoch, state)

    save(epoch + 1 if not stop else epoch)
    return state, stop
