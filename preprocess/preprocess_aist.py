#!/usr/bin/env python
"""Retarget AIST++ dance motion onto a trained subject for OOD-pose
animation.

Equivalent of `preprocess_datasets/preprocess_aist.py:22-124`:
  * root rotation made relative to the sequence's first frame, x-flipped
    (`additional_R = Rx(pi)`), then rotated into world via the chosen
    camera,
  * global translation fixed at depth 2.7 m in camera space and mapped to
    world,
  * subject identity (betas / minimal shape) taken from the training
    subject's first frame.
Writes {out}/{subject}/{seq}_view{view}/*.npz consumable by ODPDataset.
"""
import argparse
import json
import os
import pickle
import shutil

# host-side tool: pin JAX to CPU before any jax use — preprocessing must
# never grab the (single-tenant) TPU, and the TPU plugin may not even be
# importable in stripped subprocess environments
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np
from scipy.spatial.transform import Rotation

from arah_tpu.core.smpl import load_smpl_assets
from preprocess.smpl_frames import frame_record


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-dir', required=True,
                   help='directory with AIST++ motion pkls')
    p.add_argument('--seqname', required=True)
    p.add_argument('--in-dataset', required=True,
                   help='preprocessed dataset root (for subject + cameras)')
    p.add_argument('--subject', default='CoreView_377')
    p.add_argument('--out-dir', required=True)
    p.add_argument('--view', default='1')
    p.add_argument('--smpl-misc', default='body_models/misc')
    args = p.parse_args()

    with open(os.path.join(args.data_dir, args.seqname + '.pkl'), 'rb') as f:
        motion = pickle.load(f)

    model = load_smpl_assets(args.smpl_misc, 'neutral')
    additional_R = Rotation.from_euler(
        'xyz', [np.pi, 0, 0]).as_matrix().astype(np.float32)

    with open(os.path.join(args.in_dataset, args.subject,
                           'cam_params.json')) as f:
        cameras = json.load(f)
    R = np.asarray(cameras[args.view]['R'], np.float32)
    cam_trans = np.asarray(cameras[args.view]['T'], np.float32).ravel()

    subj = np.load(os.path.join(args.in_dataset, args.subject,
                                'models', sorted(os.listdir(os.path.join(
                                    args.in_dataset, args.subject,
                                    'models')))[0]))
    betas = subj['betas'].astype(np.float32)

    poses = motion['smpl_poses'][::2]

    out_dir = os.path.join(args.out_dir, args.subject,
                           f'{args.seqname}_view{args.view}')
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    cam_json = os.path.join(args.out_dir, args.subject, 'cam_params.json')
    if not os.path.exists(cam_json):
        shutil.copy(os.path.join(args.in_dataset, args.subject,
                                 'cam_params.json'), cam_json)

    root_orient_0_inv = None
    for cnt, pose in enumerate(poses):
        pose = pose.astype(np.float32)
        root = pose[:3]
        if cnt == 0:
            root_orient_0_inv = np.linalg.inv(
                Rotation.from_rotvec(root).as_matrix())
        root_mat = R.T @ additional_R @ root_orient_0_inv \
            @ Rotation.from_rotvec(root).as_matrix()
        root = Rotation.from_matrix(root_mat).as_rotvec().astype(np.float32)

        trans = np.array([0.0, 0.0, 2.7], np.float32)
        trans = (trans - cam_trans) @ R

        rec = frame_record(model, betas, root, pose[3:66], pose[66:], trans)
        np.savez(os.path.join(out_dir, f'{cnt:06d}.npz'), **rec)
    print(f'wrote {len(poses)} frames to {out_dir}')


if __name__ == '__main__':
    main()
