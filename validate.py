#!/usr/bin/env python
"""Novel-view / novel-pose validation of a trained arah_tpu checkpoint.

Usage: python validate.py configs/arah-zju/ZJUMOCAP-313.yaml
           [--novel-view | --novel-pose] [--chunk N]

Mirrors the reference `validate.py:24-106`: novel-view evaluates held-out
cameras on training frames (subsampling rate 30); novel-pose evaluates
held-out frames. Writes metrics.json + per-frame pngs to out_dir/val.
"""
import argparse
import json
import os

import jax
import numpy as np

from arah_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--novel-view', action='store_true')
    p.add_argument('--novel-pose', action='store_true')
    p.add_argument('--novel-pose-view', default=None,
                   help='evaluate novel poses from this single view '
                        '(subsampling rate 1, reference validate.py:47-50)')
    p.add_argument('--chunk', type=int, default=None,
                   help='eval ray chunk; default: pad-aware auto-chunk '
                   '(evaluator.pick_eval_chunk)')
    p.add_argument('--max-frames', type=int, default=-1)
    p.add_argument('--devices', type=int, default=0,
                   help='shard eval ray chunks over the first N devices '
                        '(0 = single device)')
    p.add_argument('--coordinator', default=None,
                   help='jax.distributed coordinator address host:port')
    p.add_argument('--num-processes', type=int, default=None)
    p.add_argument('--process-id', type=int, default=None)
    args = p.parse_args()

    from arah_tpu.parallel import distributed
    distributed.initialize(coordinator=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    from arah_tpu.config import load_config, model_config_from_cfg
    from arah_tpu.config.factory import get_dataset, init_params_from_cfg
    from arah_tpu.eval.evaluator import evaluate_frame, save_image
    from arah_tpu.train import checkpoints as ckpt_lib
    from arah_tpu.parallel.train_step import TrainState

    cfg = load_config(args.config, 'configs/default.yaml')
    model_cfg = model_config_from_cfg(cfg)

    if args.novel_pose_view is not None:
        assert args.novel_pose
        dataset = get_dataset('test', cfg, subsampling_rate=1,
                              view_split=[args.novel_pose_view])
    elif args.novel_view and not args.novel_pose:
        dataset = get_dataset('val', cfg, subsampling_rate=30)
    else:
        dataset = get_dataset('test' if args.novel_pose else 'val', cfg)

    train_ds = get_dataset('train', cfg)
    params = init_params_from_cfg(jax.random.PRNGKey(0), cfg, model_cfg,
                                  train_ds, mode='val')
    ckpt_dir = os.path.join(cfg['training']['out_dir'], 'checkpoints')
    from arah_tpu.train.optim import (OptimConfig, make_optimizer)
    opt, _ = make_optimizer(OptimConfig(), params)
    import jax.numpy as jnp
    state = TrainState(params, opt.init(params), jnp.int32(0))
    restored, step = ckpt_lib.restore_checkpoint(ckpt_dir, state)
    if restored is not None:
        params = restored.params
        print(f'loaded checkpoint step {step}')
    else:
        print('WARNING: no checkpoint found; evaluating random init')

    out_dir = os.path.join(cfg['training']['out_dir'], 'val')
    os.makedirs(out_dir, exist_ok=True)

    mesh = None
    if args.devices > 1:
        from arah_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.devices)
        # chunks are split evenly over the data axis
        if args.chunk is not None:
            args.chunk -= args.chunk % args.devices
        print(f'sharded eval over {args.devices} devices')

    from arah_tpu.utils.lpips_jax import metric_key
    perc_key = metric_key()
    all_metrics = []
    n = len(dataset) if args.max_frames < 0 \
        else min(args.max_frames, len(dataset))
    # multi-process DP over frames: rank r evaluates frames r, r+P, ...
    # (the arah_tpu equivalent of the reference's DDP validation split +
    # all_gather, `lightning_model.py:250-283`)
    proc_id = jax.process_index()
    proc_count = jax.process_count()
    local_rows = []
    for i in range(n):
        if i % proc_count != proc_id:
            continue
        item = dataset[i]
        latent = None
        if 'latent' in params:
            d_idx = int(item['inputs.data_idx'])
            if item.get('inputs.novel_seq') \
                    or d_idx >= params['latent'].shape[0]:
                d_idx = params['latent'].shape[0] - 1
            latent = params['latent'][d_idx]
        m = evaluate_frame(params, model_cfg, item, latent,
                           chunk=args.chunk, mesh=mesh)
        row = {k: float(m[k]) for k in ('psnr', 'ssim', perc_key)}
        local_rows.append([float(i), row['psnr'], row['ssim'],
                           row[perc_key]])
        save_image(os.path.join(out_dir, f'rgb_{i:06d}.png'), m['rgb_pred'])
        save_image(os.path.join(out_dir, f'normal_{i:06d}.png'),
                   m['normal_pred'])
        save_image(os.path.join(out_dir, f'gt_{i:06d}.png'), m['rgb_gt'])
        print(f'[{i+1}/{n}] ' + ' '.join(
            f'{k}={v:.4f}' for k, v in row.items()), flush=True)

    if proc_count > 1:
        # pad ragged local rows (world size may not divide n), allgather,
        # trim the -1 padding on every rank — reference
        # `lightning_model.py:357-378` semantics
        from jax.experimental import multihost_utils
        n_local_max = -(-n // proc_count)
        rows = np.full((n_local_max, 4), -1.0, np.float32)
        if local_rows:
            rows[:len(local_rows)] = np.asarray(local_rows, np.float32)
        gathered = np.asarray(
            multihost_utils.process_allgather(rows)).reshape(-1, 4)
        gathered = gathered[gathered[:, 0] >= 0]
        gathered = gathered[np.argsort(gathered[:, 0])]
    else:
        gathered = np.asarray(local_rows, np.float32).reshape(-1, 4)

    all_metrics = [{'psnr': float(r[1]), 'ssim': float(r[2]),
                    perc_key: float(r[3])} for r in gathered]
    summary = {k: float(np.mean([m[k] for m in all_metrics]))
               for k in ('psnr', 'ssim', perc_key)}
    if proc_id == 0:
        with open(os.path.join(out_dir, 'metrics.json'), 'w') as f:
            json.dump({'per_frame': all_metrics, 'mean': summary},
                      f, indent=2)
        print('mean:', summary)


if __name__ == '__main__':
    main()
