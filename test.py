#!/usr/bin/env python
"""Out-of-distribution pose animation: render a trained avatar under novel
pose sequences (AIST++ / MPI-Limits) and write rgb/normal pngs + vis.mp4.

Usage: python test.py configs/arah-zju/ZJUMOCAP-313.yaml
           [--pose-dir DIR] [--start-frame A --end-frame B]
           [--test-views 1] [--low-vram] [--chunk N]

Mirrors the reference `test.py:23-80` (cfg overridden to the ODP dataset)
+ the canonical-mesh branch of `models/__init__.py:203-311`: per frame,
extract the canonical SDF mesh (marching tets), forward-skin it to the
posed space, rasterize posed + canonical front/back normal maps.
"""
import argparse
import os

import jax
import numpy as np

from arah_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--pose-dir', default=None)
    p.add_argument('--start-frame', type=int, default=0)
    p.add_argument('--end-frame', type=int, default=-1)
    p.add_argument('--test-views', default='1')
    p.add_argument('--low-vram', action='store_true')
    p.add_argument('--chunk', type=int, default=None,
                   help='eval ray chunk; default: pad-aware auto-chunk '
                   '(evaluator.pick_eval_chunk)')
    p.add_argument('--mesh-res', type=int, default=256)
    p.add_argument('--devices', type=int, default=0,
                   help='shard render ray chunks over the first N devices '
                        '(0 = single device)')
    p.add_argument('--free-viewpoint', type=int, default=0,
                   help='render N spiral novel views of each frame '
                        '(reference gen_path)')
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
    from arah_tpu.data.odp import ODPDataset
    from arah_tpu.eval.evaluator import (render_frame_rays, scatter_image,
                                         save_image, write_video)
    from arah_tpu.eval.mesh_vis import render_normal_maps
    from arah_tpu.data.loader import frame_from_item
    from arah_tpu.train import checkpoints as ckpt_lib
    from arah_tpu.train.optim import OptimConfig, make_optimizer
    from arah_tpu.parallel.train_step import TrainState
    import jax.numpy as jnp

    cfg = load_config(args.config, 'configs/default.yaml')
    if args.low_vram:
        args.chunk = min(args.chunk or 4096, 2048)
    model_cfg = model_config_from_cfg(cfg)

    pose_dir = args.pose_dir or cfg['data'].get('pose_dir')
    dataset = ODPDataset(
        cfg['data']['path'], pose_dir=pose_dir,
        cam_name=str(args.test_views),
        smpl_misc_dir=cfg['data'].get('smpl_misc', 'body_models/misc'),
        subjects=tuple(cfg['data']['test_split']),
        start_frame=args.start_frame, end_frame=args.end_frame,
        box_margin=cfg['data'].get('box_margin', 0.05))

    train_ds = get_dataset('train', cfg)
    params = init_params_from_cfg(jax.random.PRNGKey(0), cfg, model_cfg,
                                  train_ds, mode='test')
    ckpt_dir = os.path.join(cfg['training']['out_dir'], 'checkpoints')
    opt, _ = make_optimizer(OptimConfig(), params)
    state = TrainState(params, opt.init(params), jnp.int32(0))
    restored, step = ckpt_lib.restore_checkpoint(ckpt_dir, state)
    if restored is not None:
        params = restored.params
        print(f'loaded checkpoint step {step}')

    vis_dir = os.path.join(cfg['training']['out_dir'], 'vis')
    os.makedirs(vis_dir, exist_ok=True)

    mesh = None
    if args.devices > 1:
        from arah_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.devices)
        if args.chunk is not None:
            args.chunk -= args.chunk % args.devices
        print(f'sharded render over {args.devices} devices')

    spiral = None
    if args.free_viewpoint > 0:
        from arah_tpu.utils.camera_path import gen_spiral_path
        w2cs = []
        for name in dataset.cam_names:
            cam = dataset.cameras[name]
            m = np.eye(4)
            m[:3, :3] = np.asarray(cam['R'])
            m[:3, 3] = np.asarray(cam['T']).ravel()
            w2cs.append(m)
        spiral = gen_spiral_path(w2cs * max(1, 4 // len(w2cs)),
                                 num_render_views=args.free_viewpoint)

    # multi-process DP over animation frames (reference test.py DDP,
    # `test.py:68-73`): rank r renders frames r, r+P, ...
    proc_id = jax.process_index()
    proc_count = jax.process_count()
    for i in range(len(dataset)):
        if i % proc_count != proc_id:
            continue
        item = dataset[i]
        if spiral is not None:
            # cycle the spiral cameras over frames
            m = spiral[i % len(spiral)]
            item['image.R'] = m[:3, :3].astype(np.float32)
            item['image.T'] = m[:3, 3].astype(np.float32)
            item['image.cam_loc'] = (-m[:3, :3].T @ m[:3, 3]
                                     ).astype(np.float32)
        latent = None
        if 'latent' in params:
            latent = params['latent'][-1]   # novel_seq fallback row
        fd = frame_from_item(item)
        rgb, weights, depth, conv = render_frame_rays(
            params, model_cfg, fd, item, latent, chunk=args.chunk,
            mesh=mesh)
        image_mask = np.asarray(item['inputs.image_mask'])
        pred = scatter_image(rgb, image_mask)
        normal, front, back = render_normal_maps(
            params, model_cfg, fd, item, latent, resolution=args.mesh_res)
        save_image(os.path.join(vis_dir, f'rgb_{i:06d}.png'), pred)
        save_image(os.path.join(vis_dir, f'normal_{i:06d}.png'), normal)
        save_image(os.path.join(vis_dir, f'front_{i:06d}.png'), front)
        save_image(os.path.join(vis_dir, f'back_{i:06d}.png'), back)
        print(f'[{i+1}/{len(dataset)}] rendered', flush=True)

    if proc_count > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('test_render_done')
    if proc_id == 0:
        # assemble the mp4 from every rank's pngs (all on shared storage)
        import cv2
        frames = []
        for i in range(len(dataset)):
            row = []
            for kind in ('rgb', 'normal', 'front', 'back'):
                img = cv2.imread(
                    os.path.join(vis_dir, f'{kind}_{i:06d}.png'))
                if img is None:
                    print(f'WARNING: missing {kind}_{i:06d}.png '
                          '(rank output not visible?) — skipping frame')
                    row = None
                    break
                row.append(img[..., ::-1] / 255.0)
            if row is not None:
                frames.append(np.concatenate(row, axis=1))
        write_video(os.path.join(vis_dir, 'vis.mp4'), frames)
        print('wrote', os.path.join(vis_dir, 'vis.mp4'))


if __name__ == '__main__':
    main()
