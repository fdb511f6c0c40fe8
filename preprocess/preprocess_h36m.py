#!/usr/bin/env python
"""Preprocess Human3.6M (Animatable-NeRF layout) into the framework's
dataset layout.

Equivalent of `preprocess_datasets/preprocess_H36M.py`: same structure as
the ZJU script but the sequence lives under `{subject}/Posing/`, camera
names come from `annots['ims']`, frames are subsampled 5x up to the
per-subject frame counts from the Animatable-NeRF paper.
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

N_FRAMES = {'S1': 199, 'S5': 327, 'S6': 233, 'S7': 500, 'S8': 337,
            'S9': 393, 'S11': 282}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-dir', required=True)
    p.add_argument('--out-dir', required=True)
    p.add_argument('--seqname', default='S9')
    p.add_argument('--smpl-misc', default='body_models/misc')
    args = p.parse_args()

    seq = args.seqname
    data_dir = os.path.join(args.data_dir, seq, 'Posing')
    out_dir = os.path.join(args.out_dir, seq, 'Posing')
    os.makedirs(out_dir, exist_ok=True)

    model = load_smpl_assets(args.smpl_misc, 'neutral')
    annots = np.load(os.path.join(data_dir, 'annots.npy'),
                     allow_pickle=True).item()
    cams = annots['cams']
    cam_names = [im_path.split('/')[0]
                 for im_path in annots['ims'][0]['ims']]

    all_cam_params = {'all_cam_names': cam_names}
    smpl_out = os.path.join(out_dir, 'models')
    os.makedirs(smpl_out, exist_ok=True)

    for cam_idx, cam_name in enumerate(cam_names):
        all_cam_params[cam_name] = {
            'K': np.asarray(cams['K'][cam_idx]).tolist(),
            'D': np.asarray(cams['D'][cam_idx]).tolist(),
            'R': np.asarray(cams['R'][cam_idx]).tolist(),
            'T': (np.asarray(cams['T'][cam_idx]).reshape(3, 1)
                  / 1000.0).tolist()}
        cam_out = os.path.join(out_dir, cam_name)
        os.makedirs(cam_out, exist_ok=True)
        img_files = sorted(glob.glob(os.path.join(
            data_dir, cam_name, '*.jpg')))[:N_FRAMES[seq] * 5:5]
        for img_file in img_files:
            idx = int(os.path.basename(img_file)[:-4])
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
                verts_file = os.path.join(data_dir, 'new_vertices',
                                          f'{idx}.npy')
                if os.path.exists(verts_file):
                    target = np.load(verts_file).reshape(-1, 3)
                    ours = posed_vertices(model, rec)
                    if target.shape == ours.shape:
                        off = (target - ours).mean(0)
                        rec['trans'] = rec['trans'] + off
                        rec['Jtr_posed'] = rec['Jtr_posed'] + off
                np.savez(os.path.join(smpl_out, f'{idx:06d}.npz'), **rec)
            shutil.copy(img_file, os.path.join(cam_out, f'{idx:06d}.jpg'))
            mask_file = os.path.join(data_dir, 'mask_cihp', cam_name,
                                     os.path.basename(img_file)[:-4]
                                     + '.png')
            if os.path.exists(mask_file):
                shutil.copy(mask_file,
                            os.path.join(cam_out, f'{idx:06d}.png'))

    with open(os.path.join(out_dir, 'cam_params.json'), 'w') as f:
        json.dump(all_cam_params, f)
    print('wrote', out_dir)


if __name__ == '__main__':
    main()
