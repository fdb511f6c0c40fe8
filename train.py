#!/usr/bin/env python
"""Train an arah_tpu avatar model.

Usage: python train.py configs/arah-zju/ZJUMOCAP-313.yaml
           [--epochs-per-run N] [--exit-after SECONDS] [--devices N]
           [--profile-dir DIR]

The reference CLI contract (`/root/reference/train.py:24-135`) is kept:
resumes from out_dir/checkpoints automatically, `--epochs-per-run` runs N
more epochs from the checkpointed epoch (HPC job chaining), `--exit-after`
checkpoints and exits after a time budget.
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
    p.add_argument('--epochs-per-run', type=int, default=-1)
    p.add_argument('--exit-after', type=float, default=None)
    p.add_argument('--devices', type=int, default=None)
    p.add_argument('--profile-dir', default=None)
    p.add_argument('--seed', type=int, default=0)
    # manual multi-process bring-up (TPU pods auto-detect via env vars;
    # these flags drive CPU/GPU multi-process testing)
    p.add_argument('--coordinator', default=None,
                   help='jax.distributed coordinator address host:port')
    p.add_argument('--num-processes', type=int, default=None)
    p.add_argument('--process-id', type=int, default=None)
    args = p.parse_args()

    from arah_tpu.parallel import distributed
    distributed.initialize(coordinator=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    from arah_tpu.config import (load_config, model_config_from_cfg,
                                 loss_weights_from_cfg,
                                 optim_config_from_cfg)
    from arah_tpu.config.factory import get_dataset, init_params_from_cfg
    from arah_tpu.parallel.mesh import make_mesh
    from arah_tpu.train.trainer import train

    cfg = load_config(args.config, 'configs/default.yaml')
    model_cfg = model_config_from_cfg(cfg)
    loss_w = loss_weights_from_cfg(cfg)
    optim_cfg = optim_config_from_cfg(cfg)

    dataset = get_dataset('train', cfg)
    params = init_params_from_cfg(jax.random.PRNGKey(args.seed), cfg,
                                  model_cfg, dataset, mode='train')

    if jax.process_count() > 1:
        # multi-process SPMD: one global mesh over every chip of every
        # process (ICI within a slice, DCN across hosts)
        mesh = distributed.global_mesh()
    else:
        n_dev = args.devices or cfg['training'].get('devices', 1)
        mesh = make_mesh(min(n_dev, len(jax.devices()))) \
            if n_dev > 1 else None

    max_epochs = cfg['training'].get('max_epochs', 250)
    if args.epochs_per_run > 0:
        ckpt_meta = os.path.join(cfg['training']['out_dir'], 'checkpoints',
                                 'META.json')
        cur = 0
        if os.path.exists(ckpt_meta):
            with open(ckpt_meta) as f:
                cur = json.load(f).get('epoch', 0)
        max_epochs = min(max_epochs, cur + args.epochs_per_run)

    smpl_model = None
    refine_smpl = bool(cfg['model'].get('train_smpl'))
    if refine_smpl:
        from arah_tpu.core.smpl import load_smpl_assets
        smpl_model = load_smpl_assets(
            cfg['data'].get('smpl_misc', 'body_models/misc'))

    # in-training periodic validation (ref train.py:125 /
    # check_val_every_n_epoch); job-chaining runs skip it like the
    # reference does (`/root/reference/train.py:119-122`)
    val_dataset = None
    val_every = cfg['training'].get('validate_every_n_epochs', 0)
    if val_every and args.epochs_per_run <= 0 \
            and cfg['data'].get('val_split'):
        try:
            val_dataset = get_dataset('val', cfg)
        except Exception as e:
            print(f'periodic validation disabled (no val data: {e})')

    _, stopped = train(
          cfg, model_cfg, loss_w, optim_cfg, dataset, params, mesh=mesh,
          max_epochs=max_epochs, exit_after=args.exit_after,
          profile_dir=args.profile_dir,
          pose_input_noise=cfg['training'].get('pose_input_noise', False),
          view_input_noise=cfg['training'].get('view_input_noise', False),
          nv_noise_type=cfg['training'].get('nv_noise_type', 'rotation'),
          seed=args.seed, smpl_model=smpl_model, refine_smpl=refine_smpl,
          refine_cameras=bool(cfg['model'].get('train_cameras')),
          val_dataset=val_dataset)
    if stopped:
        # reference timed-exit contract: exit code 2 signals "relaunch me"
        raise SystemExit(2)


if __name__ == '__main__':
    main()
