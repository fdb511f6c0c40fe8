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
            f: float = 1000.0, c: float = 512.0, cy: float | None = None):
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
    K = np.array([[f, 0, c], [0, f, c if cy is None else cy], [0, 0, 1.0]])
    return K, R, T


def _write_frames(model: SmplModel, rng, n_frames, cams, img_hw,
                  model_dir, img_path, mask_path,
                  trans=np.zeros(3, np.float32)):
    """Write models/*.npz + rasterized silhouette jpg/png per view.
    cams: {name: (K, R, T)}; img_hw: (H, W); img_path/mask_path:
    (cam_name, frame_idx) -> file path."""
    os.makedirs(model_dir, exist_ok=True)
    faces = np.asarray(model.faces)
    H, W = img_hw
    for fidx in range(n_frames):
        betas = (rng.randn(10) * 0.2).astype(np.float32)
        pose = (rng.randn(72) * 0.15).astype(np.float32)
        out = lbs(model, jnp.asarray(betas)[None], jnp.asarray(pose)[None])
        v_shaped = np.asarray(model.v_template) + np.einsum(
            'l,mkl->mk', betas, np.asarray(model.shapedirs))
        np.savez(os.path.join(model_dir, f'{fidx:06d}.npz'),
                 minimal_shape=v_shaped.astype(np.float32),
                 betas=betas,
                 trans=trans.astype(np.float32),
                 root_orient=pose[:3], pose_body=pose[3:66],
                 pose_hand=pose[66:],
                 Jtr_posed=np.asarray(out.joints_posed[0]) + trans,
                 bone_transforms=np.asarray(out.rel_transforms[0]))

        verts_world = np.asarray(out.verts[0]) + trans
        for v, (K, R, T) in cams.items():
            pc = verts_world @ R.T + T
            depth = pc[:, 2]
            proj = pc[:, :2] / np.maximum(depth[:, None], 1e-6)
            proj = proj * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            face_buf, _, _ = native.rasterize_mesh(proj, depth, faces,
                                                   H, W)
            sil = (face_buf >= 0).astype(np.uint8)
            img = np.zeros((H, W, 3), np.uint8)
            img[sil > 0] = (180, 120, 90)
            for p in (img_path(v, fidx), mask_path(v, fidx)):
                os.makedirs(os.path.dirname(p), exist_ok=True)
            cv2.imwrite(img_path(v, fidx), img)
            cv2.imwrite(mask_path(v, fidx), sil * 255)


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

    _write_frames(
        model, rng, n_frames, cams, (img_size, img_size),
        os.path.join(sdir, 'models'),
        lambda v, f: os.path.join(sdir, v, f'{f:06d}.jpg'),
        lambda v, f: os.path.join(sdir, v, f'{f:06d}.png'))
    with open(os.path.join(sdir, 'cam_params.json'), 'w') as f:
        json.dump(cam_params, f)
    return misc_dir, model


def make_fake_raw_zju(root: str, subject='CoreView_313', n_frames=2,
                      views=('1', '7'), img_size=512, n_verts=1024,
                      seed=0, verts_offset=0.05):
    """RAW (pre-preprocessing) ZJU-MoCap layout: `annots.npy` cameras
    (T in mm), EasyMocap `new_params/{idx}.npy` + `new_vertices/{idx}.npy`,
    `Camera (i)/` jpgs and `mask_cihp/Camera (i)/` pngs — the exact tree
    `preprocess/preprocess_zju_mocap.py` (reference
    `preprocess_datasets/preprocess_ZJU-MoCap.py:25-168`) consumes, so the
    L0 preprocessing stage can be exercised end-to-end without the gated
    raw data. `new_vertices` are shifted by `verts_offset` so the
    translation refit has something to recover. Returns (misc_dir, model).
    """
    rng = np.random.RandomState(seed)
    model = synthetic_smpl(n_verts=n_verts, seed=seed)
    misc_dir = os.path.join(root, 'body_models', 'misc')
    write_smpl_misc(misc_dir, model)

    sdir = os.path.join(root, subject)
    # the preprocess script indexes annots['cams'] positionally over the
    # full 21-camera list for CoreView_313 — provide all of them, images
    # only for `views`
    cam_names = [str(c) for c in list(range(1, 20)) + [22, 23]]
    Ks, Ds, Rs, Ts = [], [], [], []
    cams = {}
    for i, v in enumerate(cam_names):
        K, R, T = _camera(360.0 * i / len(cam_names), c=img_size / 2)
        Ks.append(K)
        Ds.append(np.zeros((5, 1)))
        Rs.append(R)
        Ts.append(T.reshape(3, 1) * 1000.0)          # annots store mm
        if v in views:
            cams[v] = (K, R, T)
    os.makedirs(sdir, exist_ok=True)
    np.save(os.path.join(sdir, 'annots.npy'),
            {'cams': {'K': Ks, 'D': Ds, 'R': Rs, 'T': Ts}})

    faces = np.asarray(model.faces)
    for fidx in range(1, n_frames + 1):             # ZJU 313 is 1-based
        betas = (rng.randn(10) * 0.2).astype(np.float32)
        pose = (rng.randn(72) * 0.15).astype(np.float32)
        trans = (rng.randn(3) * 0.05).astype(np.float32)
        # EasyMocap param layout: Rh = root orient, poses[:3] unused
        poses = pose.copy()
        poses[:3] = 0.0
        os.makedirs(os.path.join(sdir, 'new_params'), exist_ok=True)
        np.save(os.path.join(sdir, 'new_params', f'{fidx}.npy'),
                {'Rh': pose[:3].reshape(1, 3), 'Th': trans.reshape(1, 3),
                 'shapes': betas.reshape(1, 10), 'poses': poses.reshape(1, 72)})

        out = lbs(model, jnp.asarray(betas)[None], jnp.asarray(pose)[None])
        verts_world = np.asarray(out.verts[0]) + trans
        os.makedirs(os.path.join(sdir, 'new_vertices'), exist_ok=True)
        np.save(os.path.join(sdir, 'new_vertices', f'{fidx}.npy'),
                (verts_world + verts_offset).astype(np.float32))

        H = W = img_size
        for v, (K, R, T) in cams.items():
            pc = verts_world @ R.T + T
            depth = pc[:, 2]
            proj = pc[:, :2] / np.maximum(depth[:, None], 1e-6)
            proj = proj * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            face_buf, _, _ = native.rasterize_mesh(proj, depth, faces, H, W)
            sil = (face_buf >= 0).astype(np.uint8)
            img = np.zeros((H, W, 3), np.uint8)
            img[sil > 0] = (180, 120, 90)
            # 313-style names: frame index is the 5th '_' field
            base = f'Camera ({v})_CoreView_313_1_{fidx:04d}_2019.jpg'
            ip = os.path.join(sdir, f'Camera ({v})', base)
            mp = os.path.join(sdir, 'mask_cihp', f'Camera ({v})',
                              base[:-4] + '.png')
            for p in (ip, mp):
                os.makedirs(os.path.dirname(p), exist_ok=True)
            cv2.imwrite(ip, img)
            cv2.imwrite(mp, sil * 255)
    return misc_dir, model


def make_fake_raw_h36m(root: str, subject='S9', n_frames=2,
                       views=('54138969', '55011271'), img_size=256,
                       n_verts=512, seed=0, verts_offset=0.04):
    """RAW Human3.6M (Animatable-NeRF) layout under {subject}/Posing/:
    `annots.npy` with mm-translation cameras and `ims` records naming the
    cameras, EasyMocap `new_params`/`new_vertices`, per-camera jpgs and
    `mask_cihp/` pngs — the tree `preprocess/preprocess_h36m.py`
    (reference `preprocess_datasets/preprocess_H36M.py`) consumes. Raw
    frames are consecutive (5*n_frames of them) so the script's own 5x
    subsampling keeps n_frames. Returns (misc_dir, model)."""
    rng = np.random.RandomState(seed)
    model = synthetic_smpl(n_verts=n_verts, seed=seed)
    misc_dir = os.path.join(root, 'body_models', 'misc')
    write_smpl_misc(misc_dir, model)

    sdir = os.path.join(root, subject, 'Posing')
    os.makedirs(sdir, exist_ok=True)
    Ks, Ds, Rs, Ts = [], [], [], []
    cams = {}
    for i, v in enumerate(views):
        K, R, T = _camera(360.0 * i / len(views), c=img_size / 2)
        Ks.append(K)
        Ds.append(np.zeros((5, 1)))
        Rs.append(R)
        Ts.append(T.reshape(3, 1) * 1000.0)          # annots store mm
        cams[v] = (K, R, T)
    frame_idxs = list(range(5 * n_frames))
    np.save(os.path.join(sdir, 'annots.npy'),
            {'cams': {'K': Ks, 'D': Ds, 'R': Rs, 'T': Ts},
             'ims': [{'ims': [f'{v}/{fidx:06d}.jpg' for v in views]}
                     for fidx in frame_idxs]})

    faces = np.asarray(model.faces)
    for fidx in frame_idxs:
        betas = (rng.randn(10) * 0.2).astype(np.float32)
        pose = (rng.randn(72) * 0.15).astype(np.float32)
        trans = (rng.randn(3) * 0.05).astype(np.float32)
        poses = pose.copy()
        poses[:3] = 0.0
        os.makedirs(os.path.join(sdir, 'new_params'), exist_ok=True)
        np.save(os.path.join(sdir, 'new_params', f'{fidx}.npy'),
                {'Rh': pose[:3].reshape(1, 3), 'Th': trans.reshape(1, 3),
                 'shapes': betas.reshape(1, 10), 'poses': poses.reshape(1, 72)})

        out = lbs(model, jnp.asarray(betas)[None], jnp.asarray(pose)[None])
        verts_world = np.asarray(out.verts[0]) + trans
        os.makedirs(os.path.join(sdir, 'new_vertices'), exist_ok=True)
        np.save(os.path.join(sdir, 'new_vertices', f'{fidx}.npy'),
                (verts_world + verts_offset).astype(np.float32))

        H = W = img_size
        for v, (K, R, T) in cams.items():
            pc = verts_world @ R.T + T
            depth = pc[:, 2]
            proj = pc[:, :2] / np.maximum(depth[:, None], 1e-6)
            proj = proj * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            face_buf, _, _ = native.rasterize_mesh(proj, depth, faces, H, W)
            sil = (face_buf >= 0).astype(np.uint8)
            img = np.zeros((H, W, 3), np.uint8)
            img[sil > 0] = (180, 120, 90)
            ip = os.path.join(sdir, v, f'{fidx:06d}.jpg')
            mp = os.path.join(sdir, 'mask_cihp', v, f'{fidx:06d}.png')
            for p in (ip, mp):
                os.makedirs(os.path.dirname(p), exist_ok=True)
            cv2.imwrite(ip, img)
            cv2.imwrite(mp, sil * 255)
    return misc_dir, model


def make_fake_h36m_dataset(root: str, subject='S9', n_frames=2,
                           views=('1', '2'), n_verts=1024, seed=0):
    """H36M (Animatable-NeRF) layout: everything under {subject}/Posing/,
    intrinsics expressed at the native (1002, 1000) resolution
    (data/human_video.py H36MDataset). Returns (misc_dir, model)."""
    rng = np.random.RandomState(seed)
    model = synthetic_smpl(n_verts=n_verts, seed=seed)
    misc_dir = os.path.join(root, 'body_models', 'misc')
    write_smpl_misc(misc_dir, model)

    sdir = os.path.join(root, subject, 'Posing')
    H, W = 1002, 1000
    cam_params = {'all_cam_names': list(views)}
    cams = {}
    for i, v in enumerate(views):
        K, R, T = _camera(360.0 * i / max(len(views), 1),
                          c=W / 2, cy=H / 2)
        cam_params[v] = {'K': K.tolist(), 'R': R.tolist(),
                         'T': T.tolist(), 'D': [0, 0, 0, 0, 0]}
        cams[v] = (K, R, T)

    _write_frames(
        model, rng, n_frames, cams, (H, W),
        os.path.join(sdir, 'models'),
        lambda v, f: os.path.join(sdir, v, f'{f:06d}.jpg'),
        lambda v, f: os.path.join(sdir, v, f'{f:06d}.png'))
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, 'cam_params.json'), 'w') as f:
        json.dump(cam_params, f)
    return misc_dir, model


def make_fake_snapshot_dataset(root: str, subject='female-3-casual',
                               n_frames=2, img_size=512, n_verts=1024,
                               seed=0):
    """People-Snapshot layout: monocular `camera.pkl` (camera_f/c/k,
    R = I, T = 0), `image/*.jpg`, `mask/*.png`, `models/*.npz`
    (data/human_video.py PeopleSnapshotDataset). The body is translated
    in front of the identity camera. Returns (misc_dir, model)."""
    import pickle
    rng = np.random.RandomState(seed)
    model = synthetic_smpl(n_verts=n_verts, seed=seed)
    misc_dir = os.path.join(root, 'body_models', 'misc')
    write_smpl_misc(misc_dir, model)

    sdir = os.path.join(root, subject)
    os.makedirs(sdir, exist_ok=True)
    f = 1000.0
    c = img_size / 2.0
    with open(os.path.join(sdir, 'camera.pkl'), 'wb') as fh:
        pickle.dump({'camera_f': np.array([f, f]),
                     'camera_c': np.array([c, c]),
                     'camera_k': np.zeros(5)}, fh)
    K = np.array([[f, 0, c], [0, f, c], [0, 0, 1.0]])
    cams = {'0': (K, np.eye(3), np.zeros(3))}

    _write_frames(
        model, rng, n_frames, cams, (img_size, img_size),
        os.path.join(sdir, 'models'),
        lambda v, fi: os.path.join(sdir, 'image', f'{fi:06d}.jpg'),
        lambda v, fi: os.path.join(sdir, 'mask', f'{fi:06d}.png'),
        trans=np.array([0.0, 0.0, 2.8], np.float32))
    return misc_dir, model


if __name__ == '__main__':
    import argparse
    import jax
    # host-side data generation; never claim (or wait on) an accelerator
    jax.config.update('jax_platforms', 'cpu')
    p = argparse.ArgumentParser(
        description='Generate an on-disk fake dataset (see configs/fake/)')
    p.add_argument('--root', default='data/fake_zju')
    p.add_argument('--layout', choices=('zju', 'h36m', 'snapshot'),
                   default='zju')
    p.add_argument('--frames', type=int, default=8)
    p.add_argument('--views', default='1,7')
    p.add_argument('--verts', type=int, default=1024)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()
    views = tuple(args.views.split(','))
    if args.layout == 'zju':
        misc, _ = make_fake_zju_dataset(args.root, n_frames=args.frames,
                                        views=views, n_verts=args.verts,
                                        seed=args.seed)
    elif args.layout == 'h36m':
        misc, _ = make_fake_h36m_dataset(args.root, n_frames=args.frames,
                                         views=views, n_verts=args.verts,
                                         seed=args.seed)
    else:
        misc, _ = make_fake_snapshot_dataset(
            args.root, n_frames=args.frames, n_verts=args.verts,
            seed=args.seed)
    print(f'wrote {args.layout} fixture under {args.root} (misc: {misc})')
