#!/usr/bin/env python
"""Preprocess raw ZJU-MoCap into the framework's dataset layout.

Equivalent of the reference `preprocess_datasets/preprocess_ZJU-MoCap.py`:
reads `annots.npy` cameras (T in mm -> m), per-frame EasyMocap SMPL params
(`new_params/*.npy`), and writes {out}/{seq}/models/*.npz +
per-camera jpg/png copies + cam_params.json.

The reference refits the global translation against EasyMocap's own posed
vertices (`:132-141`); here the stored `new_vertices/*.npy` (already
EasyMocap-posed) provide the target directly, so the EasyMocap SMPL layer
isn't needed.
"""
import argparse
import glob
import json
import os
import shutil

# host-side tool: pin JAX to CPU before any jax use — preprocessing must
# never grab the (single-tenant) TPU, and the TPU plugin may not even be
# importable in stripped subprocess environments
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np
from scipy.spatial.transform import Rotation

from arah_tpu.core.smpl import load_smpl_assets
from preprocess.smpl_frames import frame_record, posed_vertices


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-dir', required=True)
    p.add_argument('--out-dir', required=True)
    p.add_argument('--seqname', default='CoreView_313')
    p.add_argument('--smpl-misc', default='body_models/misc')
    args = p.parse_args()

    seq = args.seqname
    data_dir = os.path.join(args.data_dir, seq)
    out_dir = os.path.join(args.out_dir, seq)
    os.makedirs(out_dir, exist_ok=True)

    model = load_smpl_assets(args.smpl_misc, 'neutral')
    annots = np.load(os.path.join(data_dir, 'annots.npy'),
                     allow_pickle=True).item()
    cams = annots['cams']

    if seq in ('CoreView_313', 'CoreView_315'):
        cam_names = [str(c) for c in list(range(1, 20)) + [22, 23]]
    else:
        cam_names = [str(c) for c in range(1, 24)]

    all_cam_params = {'all_cam_names': cam_names}
    smpl_out = os.path.join(out_dir, 'models')
    os.makedirs(smpl_out, exist_ok=True)

    for cam_idx, cam_name in enumerate(cam_names):
        K = np.asarray(cams['K'][cam_idx]).tolist()
        D = np.asarray(cams['D'][cam_idx]).tolist()
        R = np.asarray(cams['R'][cam_idx]).tolist()
        T = (np.asarray(cams['T'][cam_idx]).reshape(3, 1) / 1000.0).tolist()
        all_cam_params[cam_name] = {'K': K, 'D': D, 'R': R, 'T': T}

        cam_out = os.path.join(out_dir, cam_name)
        os.makedirs(cam_out, exist_ok=True)
        if seq in ('CoreView_313', 'CoreView_315'):
            img_dir = os.path.join(data_dir, f'Camera ({cam_name})')
            mask_dir = os.path.join(data_dir,
                                    f'mask_cihp/Camera ({cam_name})')
        else:
            img_dir = os.path.join(data_dir, f'Camera_B{cam_name}')
            mask_dir = os.path.join(data_dir, f'mask_cihp/Camera_B{cam_name}')

        for img_file in sorted(glob.glob(os.path.join(img_dir, '*.jpg'))):
            base = os.path.basename(img_file)
            if seq in ('CoreView_313', 'CoreView_315'):
                idx = int(base.split('_')[4])
            else:
                idx = int(base[:-4])
            smpl_file = os.path.join(data_dir, 'new_params', f'{idx}.npy')
            if not os.path.exists(smpl_file):
                continue

            if cam_idx == 0:
                params = np.load(smpl_file, allow_pickle=True).item()
                root = Rotation.from_rotvec(
                    np.asarray(params['Rh']).reshape(-1)).as_rotvec()
                trans = np.asarray(params['Th'], np.float32).reshape(3)
                betas = np.asarray(params['shapes'], np.float32).reshape(-1)
                poses = np.asarray(params['poses'], np.float32).reshape(-1)

                rec = frame_record(model, betas, root, poses[3:66],
                                   poses[66:], trans)
                # refit translation against the stored EasyMocap verts
                verts_file = os.path.join(data_dir, 'new_vertices',
                                          f'{idx}.npy')
                if os.path.exists(verts_file):
                    target = np.load(verts_file).reshape(-1, 3)
                    ours = posed_vertices(model, rec)
                    if target.shape == ours.shape:
                        rec['trans'] = rec['trans'] + \
                            (target - ours).mean(0)
                        rec['Jtr_posed'] = rec['Jtr_posed'] + \
                            (target - ours).mean(0)
                np.savez(os.path.join(smpl_out, f'{idx:06d}.npz'), **rec)

            shutil.copy(img_file, os.path.join(cam_out, f'{idx:06d}.jpg'))
            mask_file = os.path.join(mask_dir, base[:-4] + '.png')
            if os.path.exists(mask_file):
                shutil.copy(mask_file,
                            os.path.join(cam_out, f'{idx:06d}.png'))

    with open(os.path.join(out_dir, 'cam_params.json'), 'w') as f:
        json.dump(all_cam_params, f)
    print('wrote', out_dir)


if __name__ == '__main__':
    main()
