"""Generate a tiny on-disk dataset in the ZJU-MoCap layout from the
synthetic body — lets the full host data pipeline (image IO, undistort,
ray sampling, reg-point sampling) run end-to-end in tests and demos
without the registration-gated real data."""
from __future__ import annotations

import json
import os

import cv2
import numpy as np

import jax.numpy as jnp

from arah_tpu.core.smpl import SmplModel, lbs
from arah_tpu.data.synthetic import synthetic_smpl
from arah_tpu import native


def write_smpl_misc(misc_dir: str, model: SmplModel):
    os.makedirs(misc_dir, exist_ok=True)
    names = ['male', 'female', 'neutral']
    np.savez(os.path.join(misc_dir, 'faces.npz'),
             faces=np.asarray(model.faces))
    np.savez(os.path.join(misc_dir, 'skinning_weights_all.npz'),
             **{n: np.asarray(model.lbs_weights) for n in names})
    # reference posedirs layout: (V, 3, 207)
    posedirs = np.asarray(model.posedirs).T.reshape(-1, 3, 207)
    np.savez(os.path.join(misc_dir, 'posedirs_all.npz'),
             **{n: posedirs for n in names})
    np.savez(os.path.join(misc_dir, 'J_regressors.npz'),
             **{n: np.asarray(model.J_regressor) for n in names})
    np.savez(os.path.join(misc_dir, 'v_templates.npz'),
             **{n: np.asarray(model.v_template) for n in names})
    np.savez(os.path.join(misc_dir, 'shapedirs_all.npz'),
             **{n: np.asarray(model.shapedirs) for n in names})
    kintree = np.stack([np.asarray(model.parents),
                        np.arange(24)]).astype(np.int64)
    np.save(os.path.join(misc_dir, 'kintree_table.npy'), kintree)


def _camera(angle_deg: float, dist: float = 2.8, height: float = 0.0,
            f: float = 1000.0, c: float = 512.0):
    th = np.deg2rad(angle_deg)
    # camera position on a circle, looking at the origin
    pos = np.array([dist * np.sin(th), height, -dist * np.cos(th)])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, -1.0, 0.0])     # opencv-style y-down
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R = np.stack([right, up2, fwd], axis=0)     # w2c rotation
    T = -R @ pos
    K = np.array([[f, 0, c], [0, f, c], [0, 0, 1.0]])
    return K, R, T


def make_fake_zju_dataset(root: str, subject='CoreView_313', n_frames=2,
                          views=('1', '7'), img_size=1024, n_verts=1024,
                          seed=0):
    """Writes {root}/{subject}/{cam}/*.jpg+png, models/*.npz,
    cam_params.json and {root}/body_models/misc/*.npz. Returns
    (misc_dir, model)."""
    rng = np.random.RandomState(seed)
    model = synthetic_smpl(n_verts=n_verts, seed=seed)
    misc_dir = os.path.join(root, 'body_models', 'misc')
    write_smpl_misc(misc_dir, model)

    sdir = os.path.join(root, subject)
    os.makedirs(os.path.join(sdir, 'models'), exist_ok=True)

    cam_params = {'all_cam_names': list(views)}
    cams = {}
    for i, v in enumerate(views):
        K, R, T = _camera(360.0 * i / max(len(views), 1),
                          c=img_size / 2)
        cam_params[v] = {'K': K.tolist(), 'R': R.tolist(),
                         'T': T.tolist(), 'D': [0, 0, 0, 0, 0]}
        cams[v] = (K, R, T)
        os.makedirs(os.path.join(sdir, v), exist_ok=True)

    faces = np.asarray(model.faces)
    for fidx in range(n_frames):
        betas = (rng.randn(10) * 0.2).astype(np.float32)
        pose = (rng.randn(72) * 0.15).astype(np.float32)
        trans = np.array([0.0, 0.0, 0.0], np.float32)
        out = lbs(model, jnp.asarray(betas)[None], jnp.asarray(pose)[None])
        v_shaped = np.asarray(model.v_template) + np.einsum(
            'l,mkl->mk', betas, np.asarray(model.shapedirs))
        np.savez(os.path.join(sdir, 'models', f'{fidx:06d}.npz'),
                 minimal_shape=v_shaped.astype(np.float32),
                 betas=betas,
                 trans=trans,
                 root_orient=pose[:3], pose_body=pose[3:66],
                 pose_hand=pose[66:],
                 Jtr_posed=np.asarray(out.joints_posed[0]) + trans,
                 bone_transforms=np.asarray(out.rel_transforms[0]))

        verts_world = np.asarray(out.verts[0]) + trans
        for v in views:
            K, R, T = cams[v]
            pc = verts_world @ R.T + T
            depth = pc[:, 2]
            proj = pc[:, :2] / np.maximum(depth[:, None], 1e-6)
            proj = proj * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            face_buf, _, _ = native.rasterize_mesh(
                proj, depth, faces, img_size, img_size)
            sil = (face_buf >= 0).astype(np.uint8)
            img = np.zeros((img_size, img_size, 3), np.uint8)
            img[sil > 0] = (180, 120, 90)
            cv2.imwrite(os.path.join(sdir, v, f'{fidx:06d}.jpg'), img)
            cv2.imwrite(os.path.join(sdir, v, f'{fidx:06d}.png'), sil * 255)
    with open(os.path.join(sdir, 'cam_params.json'), 'w') as f:
        json.dump(cam_params, f)
    return misc_dir, model
