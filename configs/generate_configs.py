#!/usr/bin/env python
"""Generate the per-subject benchmark configs (ZJU-MoCap multi-view and
monocular, H36M, People-Snapshot) from a compact table.

Covers the same experiment matrix as the reference's configs/arah-zju and
configs/arah-h36m directories; run `python configs/generate_configs.py` to
refresh the YAML files.
"""
import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))

ZJU_SUBJECTS = ['313', '315', '377', '386', '387', '390', '392', '393', '394']
ZJU_END_FRAME = {'313': 60, '315': 400, '377': 300, '386': 300, '387': 300,
                 '390': 300, '392': 300, '393': 300, '394': 300}
ZJU_TEST_RANGE = {'313': (60, 1061), '315': (400, 1401), '377': (300, 617),
                  '386': (300, 646), '387': (300, 654), '390': (0, 1171),
                  '392': (300, 556), '393': (300, 658), '394': (300, 859)}
ZJU_MONO_SUBJECTS = ['377', '386', '387', '392', '393', '394']
H36M_SUBJECTS = ['S1', 'S5', 'S6', 'S7', 'S8', 'S9', 'S11']

ALL_ZJU_VIEWS = [str(i) for i in list(range(1, 13)) + list(range(13, 24))]


def zju_config(subject: str, mono: bool = False) -> dict:
    name = f'CoreView_{subject}'
    train_views = ['4'] if mono else ['1', '7', '13', '19']
    held_out = [v for v in map(str, range(1, 24))
                if v not in train_views and v not in ('19', '20', '21')]
    start, end = ZJU_TEST_RANGE[subject]
    cfg = {
        'inherit_from': 'configs/default.yaml',
        'data': {
            'dataset': 'zju_mocap',
            'path': 'data/zju_mocap',
            'train_split': [name], 'val_split': [name], 'test_split': [name],
            'train_views': train_views,
            'val_views': held_out, 'test_views': held_out,
            'train_start_frame': 0,
            'train_end_frame': 500 if mono else ZJU_END_FRAME[subject],
            'val_subsampling_rate': 100000,
            'val_start_frame': 0,
            'val_end_frame': 500 if mono else ZJU_END_FRAME[subject],
            'test_subsampling_rate': 30,
            'test_start_frame': start, 'test_end_frame': end,
            'sample_reg_surface': True,
            'erode_mask': False,
        },
        'model': {
            'decoder_kwargs': {'in_features': 3, 'num_hidden_layers': 5,
                               'hierarchical_pose': True, 'hyper_in_ch': 144,
                               'use_FiLM': True},
            'renderer_kwargs': {'mode': 'idr', 'd_in': 9, 'd_out': 3,
                                'd_hidden': 256, 'n_layers': 5,
                                'weight_norm': True, 'multires': 0,
                                'multires_view': 4, 'skips': [3],
                                'squeeze_out': True},
            'geo_pose_encoder': 'latent',
            'color_pose_encoder': 'latent',
            'cano_view_dirs': False,
            'train_smpl': bool(mono),
        },
        'training': {
            'devices': 4,
            'out_dir': f'out/arah-zju/ZJUMOCAP-{subject}'
                       + ('-mono' if mono else ''),
            'max_epochs': 500 if mono else 1250,
            'validate_every_n_epochs': 20,
            'checkpoint_every_n_epochs': 5,
            'lr': 1.0e-6, 'pose_net_factor': 100,
            'mask_weight': 0.0, 'skinning_weight': 10.0,
            'inside_weight': 10.0,
            'train_skinning_net': True,
            'pose_input_noise': True, 'view_input_noise': True,
        },
    }
    if mono:
        cfg['model']['train_cameras'] = False
    return cfg


def h36m_config(subject: str) -> dict:
    cfg = zju_config('313')
    cfg['data'].update({
        'dataset': 'h36m', 'path': 'data/h36m',
        'train_split': [subject], 'val_split': [subject],
        'test_split': [subject],
        'train_views': ['54138969', '55011271', '60457274'],
        'val_views': ['58860488'], 'test_views': ['58860488'],
        'train_end_frame': 260, 'val_end_frame': 260,
        'test_start_frame': 0, 'test_end_frame': 0,
    })
    cfg['model']['train_smpl'] = True
    cfg['training'].update({
        'out_dir': f'out/arah-h36m/H36M_{subject}',
        'max_epochs': 250,
    })
    return cfg


def people_snapshot_config(subject: str) -> dict:
    cfg = zju_config('313', mono=True)
    cfg['data'].update({
        'dataset': 'people_snapshot', 'path': 'data/people_snapshot',
        'train_split': [subject], 'val_split': [subject],
        'test_split': [subject],
        'train_views': ['0'], 'val_views': ['0'], 'test_views': ['0'],
    })
    cfg['training']['out_dir'] = f'out/arah-people-snapshot/{subject}'
    return cfg


def main():
    for s in ZJU_SUBJECTS:
        path = os.path.join(HERE, 'arah-zju', f'ZJUMOCAP-{s}.yaml')
        with open(path, 'w') as f:
            yaml.safe_dump(zju_config(s), f, sort_keys=False)
    for s in ZJU_MONO_SUBJECTS:
        path = os.path.join(HERE, 'arah-zju', f'ZJUMOCAP-{s}-mono.yaml')
        with open(path, 'w') as f:
            yaml.safe_dump(zju_config(s, mono=True), f, sort_keys=False)
    for s in H36M_SUBJECTS:
        path = os.path.join(HERE, 'arah-h36m', f'H36M_{s}.yaml')
        with open(path, 'w') as f:
            yaml.safe_dump(h36m_config(s), f, sort_keys=False)
    for s in ['male-3-casual', 'female-3-casual']:
        path = os.path.join(HERE, 'arah-people-snapshot', f'{s}.yaml')
        with open(path, 'w') as f:
            yaml.safe_dump(people_snapshot_config(s), f, sort_keys=False)
    print('configs written')


if __name__ == '__main__':
    main()
