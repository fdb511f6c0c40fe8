"""Dataset + model factories from config dicts (the arah_tpu equivalent of
`im2mesh/config.py:60-265`)."""
from __future__ import annotations

import numpy as np


def get_dataset(mode: str, cfg: dict, view_split=None, subsampling_rate=None,
                start_frame=None, end_frame=None):
    d = cfg['data']
    dataset_type = d['dataset']
    splits = {'train': d['train_split'], 'val': d['val_split'],
              'test': d['test_split']}[mode]
    views = view_split if view_split is not None else {
        'train': d.get('train_views') or (),
        'val': d.get('val_views') or (),
        'test': d.get('test_views') or ()}[mode]
    rate = subsampling_rate if subsampling_rate is not None \
        else d.get(f'{mode}_subsampling_rate', 1)
    start = start_frame if start_frame is not None \
        else d.get(f'{mode}_start_frame', 0)
    end = end_frame if end_frame is not None \
        else d.get(f'{mode}_end_frame', -1)

    # image resolution: reference policy (`im2mesh/config.py:150-200`) —
    # fixed per dataset type, `high_res` doubles it for training only;
    # `data.img_size` is an arah_tpu extension for explicit overrides
    # (e.g. the fake-fixture demo configs).
    img_size = d.get('img_size')
    if img_size is None:
        hi = bool(d.get('high_res')) and mode == 'train'
        img_size = {
            'people_snapshot': (1080, 1080) if hi else (540, 540),
            'h36m': (1002, 1000),
        }.get(dataset_type, (1024, 1024) if hi else (512, 512))

    common = dict(
        smpl_misc_dir=d.get('smpl_misc', 'body_models/misc'),
        img_size=tuple(img_size),
        subjects=tuple(splits), mode=mode,
        num_fg_samples=d.get('num_fg_samples', 1024),
        num_bg_samples=d.get('num_bg_samples', 1024),
        sampling_rate=rate, start_frame=start, end_frame=end,
        views=tuple(views),
        off_surface_thr=d.get('off_surface_thr', 0.2),
        inside_thr=d.get('inside_thr', 0.001),
        box_margin=d.get('box_margin', 0.05),
        sample_reg_surface=d.get('sample_reg_surface', False),
        sample_inside=cfg['training'].get('inside_weight', 0.0) > 0,
        erode_mask=d.get('erode_mask', True),
        # patch rays for the perceptual loss (`loss.py:62-84`); appended
        # after the per-ray-loss rays, train mode only
        sample_patch=(cfg['training'].get('patch_size', 48)
                      if mode == 'train'
                      and cfg['training'].get('perceptual_weight', 0.0) > 0
                      else 0),
    )

    if dataset_type == 'zju_mocap':
        from arah_tpu.data.human_video import ZJUMoCapDataset
        return ZJUMoCapDataset(d['path'], **common)
    if dataset_type == 'h36m':
        from arah_tpu.data.human_video import H36MDataset
        return H36MDataset(d['path'], **common)
    if dataset_type == 'people_snapshot':
        from arah_tpu.data.human_video import PeopleSnapshotDataset
        return PeopleSnapshotDataset(d['path'], **common)
    if dataset_type == 'zju_mocap_odp':
        from arah_tpu.data.odp import ODPDataset
        common.pop('num_fg_samples'); common.pop('num_bg_samples')
        common.pop('sample_reg_surface'); common.pop('sample_inside')
        common.pop('sample_patch')
        return ODPDataset(d['path'], pose_dir=d.get('pose_dir'), **common)
    raise ValueError(f'unknown dataset {dataset_type}')


def init_params_from_cfg(key, cfg: dict, model_cfg, dataset=None,
                         mode: str = 'train'):
    """Build params, including latent table sized to the training frames
    and pretrained-checkpoint bootstrapping when configured
    (`metaavatar_render/config.py:18-93`)."""
    from arah_tpu.model import init_model_params
    from arah_tpu.train import checkpoints as ckpt_lib

    train_latent = cfg['model'].get('color_pose_encoder') in (
        'hybrid', 'latent') or cfg['model'].get('geo_pose_encoder') in (
        'latent',)
    n_latent = 0
    if train_latent and dataset is not None:
        first_cam = dataset.data[0]['cam_idx']
        n_latent = sum(1 for rec in dataset.data
                       if rec['cam_idx'] == first_cam)
    n_cameras = len(dataset.cam_names) if (
        cfg['model'].get('train_cameras') and dataset is not None) else 0
    params = init_model_params(key, model_cfg, n_latent_frames=n_latent,
                               latent_dim=cfg['model'].get('latent_dim',
                                                           128),
                               n_cameras=n_cameras)

    if mode == 'train':
        geo_path = cfg['model'].get('geometry_net')
        if geo_path:
            sd = ckpt_lib.load_torch_checkpoint(geo_path)
            params['hypernet']['hypo_init'] = \
                ckpt_lib.load_metaavatar_hypo_init(sd, model_cfg.hypernet)
        skin_path = cfg['model'].get('skinning_net2')
        if skin_path:
            sd = ckpt_lib.load_torch_checkpoint(skin_path)
            params['skinning'] = ckpt_lib.load_snarf_skinning(
                sd, model_cfg.skinning.n_layers)

    if cfg['model'].get('train_smpl') and dataset is not None \
            and mode in ('train', 'val'):
        params.update(smpl_refine_params_from_dataset(dataset))
    if cfg['model'].get('train_cameras') and dataset is not None \
            and mode in ('train', 'val'):
        params['cam_rots'], params['cam_trans'] = \
            camera_params_from_dataset(dataset)
    return params


def smpl_refine_params_from_dataset(dataset):
    """Initial learnable per-frame SMPL params from the dataset's stored
    estimates (reference `metaavatar_render/config.py:179-227`, including
    the +1e-8 fixup of all-zero axis-angles)."""
    import jax.numpy as jnp
    first_cam = dataset.data[0]['cam_idx']
    root_orient, pose_body, pose_hand, trans = [], [], [], []
    betas = None
    for rec in dataset.data:
        if rec['cam_idx'] != first_cam:
            break
        md = np.load(rec['model_file'])
        root = md['root_orient'].astype(np.float32)
        if (root == 0.0).all():
            root = root + 1e-8
        root_orient.append(root.reshape(3))
        body = md['pose_body'].astype(np.float32).reshape(-1, 3)
        body[(body == 0.0).all(axis=-1)] += 1e-8
        pose_body.append(body.reshape(-1))
        hand = md['pose_hand'].astype(np.float32).reshape(-1, 3)
        hand[(hand == 0.0).all(axis=-1)] += 1e-8
        pose_hand.append(hand.reshape(-1))
        trans.append(md['trans'].astype(np.float32).reshape(3))
        if betas is None:
            betas = md['betas'].astype(np.float32).reshape(-1) \
                if 'betas' in md else np.zeros(10, np.float32)
    return {
        'smpl_params': {
            'root_orient': jnp.asarray(np.stack(root_orient)),
            'pose_body': jnp.asarray(np.stack(pose_body)),
            'pose_hand': jnp.asarray(np.stack(pose_hand)),
            'trans': jnp.asarray(np.stack(trans)),
        },
        'betas': jnp.asarray(betas),
    }


def camera_params_from_dataset(dataset):
    """Initial learnable camera extrinsics (xyzw quaternion + translation)
    from the dataset cameras (reference
    `metaavatar_render/config.py:168-177`)."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation
    rots, trans = [], []
    for name in dataset.cam_names:
        cam = dataset.cameras[name]
        rots.append(Rotation.from_matrix(
            np.asarray(cam['R'])).as_quat().astype(np.float32))
        trans.append(np.asarray(cam['T'], np.float32).ravel())
    return jnp.asarray(np.stack(rots)), jnp.asarray(np.stack(trans))
