"""L0 preprocessing end-to-end: synthetic RAW ZJU-MoCap tree ->
`preprocess/preprocess_zju_mocap.py` -> framework dataset layout ->
HumanVideoDataset item -> one training step.

Exercises the same contract as the reference
`preprocess_datasets/preprocess_ZJU-MoCap.py:25-168` (annots.npy mm->m
cameras, EasyMocap new_params Rh/Th/shapes/poses, translation refit
against new_vertices) without the registration-gated raw data.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from arah_tpu.data.fake_dataset import make_fake_raw_h36m, make_fake_raw_zju
from arah_tpu.data.human_video import ZJUMoCapDataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VERTS_OFFSET = 0.05


@pytest.fixture(scope='module')
def preprocessed(tmp_path_factory):
    raw = str(tmp_path_factory.mktemp('raw_zju'))
    out = str(tmp_path_factory.mktemp('processed_zju'))
    misc_dir, model = make_fake_raw_zju(
        raw, n_frames=2, views=('1', '7'), img_size=256, n_verts=512,
        verts_offset=VERTS_OFFSET)
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [REPO] + [p for p in [os.environ.get('PYTHONPATH', '')] if p]))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, 'preprocess',
                                      'preprocess_zju_mocap.py'),
         '--data-dir', raw, '--out-dir', out, '--seqname', 'CoreView_313',
         '--smpl-misc', misc_dir],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]
    return raw, out, misc_dir, model


class TestPreprocessZJU:
    def test_output_tree(self, preprocessed):
        raw, out, misc_dir, _ = preprocessed
        seq = os.path.join(out, 'CoreView_313')
        with open(os.path.join(seq, 'cam_params.json')) as f:
            cams = json.load(f)
        # 313 has the 21-camera list (1..19, 22, 23)
        assert len(cams['all_cam_names']) == 21
        assert cams['all_cam_names'][0] == '1'
        # annots T is stored in mm; cam_params must be metres
        T = np.asarray(cams['1']['T']).reshape(3)
        assert np.linalg.norm(T) < 100.0
        for fidx in (1, 2):
            assert os.path.exists(
                os.path.join(seq, 'models', f'{fidx:06d}.npz'))
            for v in ('1', '7'):
                assert os.path.exists(
                    os.path.join(seq, v, f'{fidx:06d}.jpg'))
                assert os.path.exists(
                    os.path.join(seq, v, f'{fidx:06d}.png'))

    def test_translation_refit(self, preprocessed):
        """new_vertices are shifted by VERTS_OFFSET vs the raw Th; the
        refit (ref :132-141) must recover that shift so posed verts from
        the record match the stored EasyMocap verts."""
        raw, out, misc_dir, model = preprocessed
        from preprocess.smpl_frames import posed_vertices
        rec = dict(np.load(os.path.join(
            out, 'CoreView_313', 'models', '000001.npz')))
        target = np.load(os.path.join(
            raw, 'CoreView_313', 'new_vertices', '1.npy'))
        ours = posed_vertices(model, rec)
        err = np.abs(ours - target).max()
        assert err < 1e-4, err
        raw_params = np.load(
            os.path.join(raw, 'CoreView_313', 'new_params', '1.npy'),
            allow_pickle=True).item()
        shift = rec['trans'] - np.asarray(raw_params['Th']).reshape(3)
        np.testing.assert_allclose(shift, VERTS_OFFSET, atol=1e-4)

    def test_dataset_loads(self, preprocessed):
        raw, out, misc_dir, _ = preprocessed
        ds = ZJUMoCapDataset(
            out, smpl_misc_dir=misc_dir, subjects=('CoreView_313',),
            mode='train', img_size=(128, 128), num_fg_samples=64,
            num_bg_samples=64, sample_reg_surface=True, sample_inside=True,
            erode_mask=False, seed=0, views=('1', '7'))
        assert len(ds) == 4    # 2 frames x 2 views
        item = ds[0]
        assert item['inputs'].shape == (128, 3)
        assert item['inputs.mask'][:64].mean() > 0.9
        np.testing.assert_allclose(
            np.linalg.norm(item['inputs.ray_dirs'], axis=-1), 1.0,
            atol=1e-5)

    @pytest.mark.slow
    def test_train_step_on_preprocessed(self, preprocessed):
        """One jitted training step on the preprocessed output — L0 feeds
        L5 for real."""
        import jax
        import jax.numpy as jnp
        from arah_tpu.data.loader import (FrameBatchSampler,
                                          collate_train_batch)
        from arah_tpu.model import init_model_params
        from arah_tpu.parallel.train_step import TrainState, make_train_step
        from arah_tpu.train.loss import LossWeights
        from arah_tpu.train.optim import OptimConfig, make_optimizer
        from test_renderer import small_config

        raw, out, misc_dir, _ = preprocessed
        ds = ZJUMoCapDataset(
            out, smpl_misc_dir=misc_dir, subjects=('CoreView_313',),
            mode='train', img_size=(128, 128), num_fg_samples=32,
            num_bg_samples=32, sample_reg_surface=True, sample_inside=True,
            erode_mask=False, seed=0, views=('1', '7'))
        cfg = small_config()
        params = init_model_params(jax.random.PRNGKey(0), cfg,
                                   n_latent_frames=2)
        sampler = FrameBatchSampler(ds, shuffle=False)
        idxs = next(iter(sampler))
        batch = collate_train_batch([ds[i] for i in idxs])
        loss_w = LossWeights(n_ray_loss=64, inside=10.0)
        opt, _ = make_optimizer(OptimConfig(), params)
        state = TrainState(params, opt.init(params), jnp.int32(0))
        step = make_train_step(cfg, loss_w, opt)
        new_state, losses = step(state, batch, jax.random.PRNGKey(1))
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, float(v))


class TestPreprocessH36M:
    @pytest.fixture(scope='class')
    def preprocessed_h36m(self, tmp_path_factory):
        raw = str(tmp_path_factory.mktemp('raw_h36m'))
        out = str(tmp_path_factory.mktemp('processed_h36m'))
        misc_dir, model = make_fake_raw_h36m(
            raw, n_frames=2, img_size=256, n_verts=512, verts_offset=0.04)
        env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [REPO] + [p for p in [os.environ.get('PYTHONPATH', '')] if p]))
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, 'preprocess',
                                          'preprocess_h36m.py'),
             '--data-dir', raw, '--out-dir', out, '--seqname', 'S9',
             '--smpl-misc', misc_dir],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
        assert res.returncode == 0, res.stderr[-3000:]
        return raw, out, misc_dir, model

    def test_output_and_refit(self, preprocessed_h36m):
        raw, out, misc_dir, model = preprocessed_h36m
        from preprocess.smpl_frames import posed_vertices
        seq = os.path.join(out, 'S9', 'Posing')
        with open(os.path.join(seq, 'cam_params.json')) as f:
            cams = json.load(f)
        assert cams['all_cam_names'] == ['54138969', '55011271']
        # mm -> m
        assert np.linalg.norm(np.asarray(
            cams['54138969']['T']).reshape(3)) < 100.0
        # 5x subsampling keeps frames 0 and 5
        for fidx in (0, 5):
            assert os.path.exists(
                os.path.join(seq, 'models', f'{fidx:06d}.npz'))
            for v in cams['all_cam_names']:
                assert os.path.exists(
                    os.path.join(seq, v, f'{fidx:06d}.jpg'))
                assert os.path.exists(
                    os.path.join(seq, v, f'{fidx:06d}.png'))
        rec = dict(np.load(os.path.join(seq, 'models', '000005.npz')))
        target = np.load(os.path.join(raw, 'S9', 'Posing',
                                      'new_vertices', '5.npy'))
        err = np.abs(posed_vertices(model, rec) - target).max()
        assert err < 1e-4, err

    def test_dataset_loads(self, preprocessed_h36m):
        from arah_tpu.data.human_video import H36MDataset
        raw, out, misc_dir, _ = preprocessed_h36m
        ds = H36MDataset(
            out, smpl_misc_dir=misc_dir, subjects=('S9',), mode='train',
            img_size=(128, 128), num_fg_samples=64, num_bg_samples=64,
            sample_reg_surface=True, sample_inside=True, erode_mask=False,
            seed=0, views=('54138969',))
        assert len(ds) == 2
        item = ds[0]
        assert item['inputs'].shape == (128, 3)
        assert item['inputs.mask'][:64].mean() > 0.9


class TestExtractSmplParameters:
    def test_pickle_to_npz_roundtrip(self, tmp_path):
        """Fabricate SMPL model.pkl files (official field layout) from the
        synthetic body, run the extraction script, and check
        load_smpl_assets sees the identical model."""
        import jax.numpy as jnp
        from arah_tpu.core.smpl import load_smpl_assets, lbs
        from arah_tpu.data.synthetic import synthetic_smpl

        model = synthetic_smpl(n_verts=256)
        nv = int(np.asarray(model.v_template).shape[0])
        smpl_dir = tmp_path / 'smpl'
        for g in ('male', 'female', 'neutral'):
            d = {
                'v_template': np.asarray(model.v_template, np.float64),
                # official pickles carry 300 shape dirs; script keeps 10
                'shapedirs': np.concatenate(
                    [np.asarray(model.shapedirs, np.float64),
                     np.zeros((nv, 3, 290))], axis=-1),
                'posedirs': np.asarray(model.posedirs, np.float64
                                       ).T.reshape(nv, 3, 207),
                'J_regressor': np.asarray(model.J_regressor, np.float64),
                'weights': np.asarray(model.lbs_weights, np.float64),
                'f': np.asarray(model.faces, np.int64),
                'kintree_table': np.stack(
                    [np.asarray(model.parents), np.arange(24)]).astype(
                        np.int64),
            }
            os.makedirs(smpl_dir / g, exist_ok=True)
            import pickle
            with open(smpl_dir / g / 'model.pkl', 'wb') as f:
                pickle.dump(d, f)

        out = tmp_path / 'misc'
        env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [REPO] + [p for p in [os.environ.get('PYTHONPATH', '')] if p]))
        res = subprocess.run(
            [sys.executable,
             os.path.join(REPO, 'preprocess', 'extract_smpl_parameters.py'),
             '--smpl-dir', str(smpl_dir), '--out-dir', str(out)],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
        assert res.returncode == 0, res.stderr[-2000:]

        loaded = load_smpl_assets(str(out), 'neutral')
        rng = np.random.RandomState(0)
        betas = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.2)
        pose = jnp.asarray(rng.randn(1, 72).astype(np.float32) * 0.2)
        ref = lbs(model, betas, pose)
        got = lbs(loaded, betas, pose)
        np.testing.assert_allclose(np.asarray(got.verts),
                                   np.asarray(ref.verts), atol=1e-5)


class TestPreprocessAist:
    def test_retarget_and_odp_load(self, preprocessed, tmp_path):
        """Fake AIST++ motion pkl -> preprocess_aist.py retarget onto the
        preprocessed fake-ZJU subject -> ODPDataset loads the pose dir."""
        import pickle
        raw, out, misc_dir, _ = preprocessed
        rng = np.random.RandomState(1)
        motion = {'smpl_poses': (rng.randn(6, 72) * 0.1).astype(np.float32)}
        aist_dir = tmp_path / 'aist'
        os.makedirs(aist_dir)
        with open(aist_dir / 'gBR_sBM_c01.pkl', 'wb') as f:
            pickle.dump(motion, f)

        odp_root = tmp_path / 'odp'
        env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [REPO] + [p for p in [os.environ.get('PYTHONPATH', '')] if p]))
        res = subprocess.run(
            [sys.executable,
             os.path.join(REPO, 'preprocess', 'preprocess_aist.py'),
             '--data-dir', str(aist_dir), '--seqname', 'gBR_sBM_c01',
             '--in-dataset', out, '--subject', 'CoreView_313',
             '--out-dir', str(odp_root), '--view', '1',
             '--smpl-misc', misc_dir],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
        assert res.returncode == 0, res.stderr[-2000:]

        pose_dir = os.path.join(str(odp_root), 'CoreView_313',
                                'gBR_sBM_c01_view1')
        # 6 frames / 2 (the script's ::2 subsample)
        assert len([f for f in os.listdir(pose_dir)
                    if f.endswith('.npz')]) == 3
        rec = dict(np.load(os.path.join(pose_dir, '000000.npz')))
        for k in ('minimal_shape', 'bone_transforms', 'Jtr_posed', 'trans'):
            assert np.isfinite(rec[k]).all(), k

        from arah_tpu.data.odp import ODPDataset
        ds = ODPDataset(
            str(odp_root), pose_dir='gBR_sBM_c01_view1', cam_name='1',
            img_size=(128, 128), orig_img_size=(256, 256),
            smpl_misc_dir=misc_dir, subjects=('CoreView_313',), seed=0)
        assert len(ds) == 3
        item = ds[0]
        assert np.isfinite(item['inputs.ray_dirs']).all()
