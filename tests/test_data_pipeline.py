"""End-to-end data pipeline test: fake on-disk ZJU-layout dataset ->
HumanVideoDataset -> TrainBatch -> one training step."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arah_tpu.data.fake_dataset import make_fake_zju_dataset
from arah_tpu.data.human_video import ZJUMoCapDataset
from arah_tpu.data.loader import (FrameBatchSampler, Prefetcher,
                                  collate_train_batch, frame_from_item)

from test_renderer import small_config


@pytest.fixture(scope='module')
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('fake_zju'))
    misc_dir, model = make_fake_zju_dataset(root, n_frames=2,
                                            views=('1', '7'), n_verts=512)
    return root, misc_dir, model


def make_dataset(fake_root, mode='train'):
    root, misc_dir, _ = fake_root
    return ZJUMoCapDataset(
        root, smpl_misc_dir=misc_dir, subjects=('CoreView_313',),
        mode=mode, img_size=(256, 256), num_fg_samples=128,
        num_bg_samples=128, sample_reg_surface=True, sample_inside=True,
        erode_mask=False, seed=0)


class TestDataset:
    def test_item_fields(self, fake_root):
        ds = make_dataset(fake_root)
        assert len(ds) == 4   # 2 frames x 2 views
        item = ds[0]
        assert item['inputs'].shape == (256, 3)
        assert item['inputs.ray_dirs'].shape == (256, 3)
        nf = item['inputs.body_bounds_intersections']
        assert nf.shape == (256, 2)
        assert (nf[:, 0] < nf[:, 1]).all()
        assert item['image.points_uniform'].shape == (1024, 3)
        assert item['image.sampled_weights'].shape == (1024, 24)
        assert item['image.points_inside'].shape == (1024, 3)
        np.testing.assert_allclose(item['image.sampled_weights'].sum(-1),
                                   1.0, atol=1e-4)
        # ray dirs are unit vectors
        np.testing.assert_allclose(
            np.linalg.norm(item['inputs.ray_dirs'], axis=-1), 1.0,
            atol=1e-5)

    def test_fg_rays_hit_silhouette(self, fake_root):
        """Foreground rays should march toward the body: the ray through a
        fg pixel must intersect the posed-vertex AABB."""
        ds = make_dataset(fake_root)
        item = ds[0]
        n_fg = 128
        fg_mask = item['inputs.mask'][:n_fg]
        assert fg_mask.mean() > 0.9

    def test_patch_sampling(self, fake_root):
        """sample_patch appends a ps*ps contiguous foreground-centred pixel
        grid AFTER the fg+bg loss rays (hybrid sampling for the perceptual
        loss, ref `loss.py:62-84` contract)."""
        root, misc_dir, _ = fake_root
        ps = 16
        ds = ZJUMoCapDataset(
            root, smpl_misc_dir=misc_dir, subjects=('CoreView_313',),
            mode='train', img_size=(256, 256), num_fg_samples=128,
            num_bg_samples=128, sample_reg_surface=False,
            sample_inside=False, erode_mask=True, seed=0, sample_patch=ps)
        item = ds[0]
        n = 256 + ps * ps
        assert item['inputs'].shape == (n, 3)
        assert item['inputs.ray_dirs'].shape == (n, 3)
        assert item['inputs.mask_erode'].shape == (n,)
        np.testing.assert_allclose(
            np.linalg.norm(item['inputs.ray_dirs'], axis=-1), 1.0,
            atol=1e-5)
        labels = np.unique(item['inputs.mask_erode'][256:])
        assert set(labels).issubset({0, 1, 100})
        # the patch is centred on a fg pixel: mostly body
        assert (item['inputs.mask_erode'][256:] == 1).mean() > 0.2
        # bg-labelled patch pixels are zeroed like bg rays
        patch_px = item['inputs'][256:]
        patch_lbl = item['inputs.mask_erode'][256:]
        assert np.abs(patch_px[patch_lbl == 0]).max() == 0.0
        # contiguous grid: uv-lifted pixels of neighbouring columns differ
        # by exactly one K^-1 column step
        uv = item['inputs.uv'][256:].reshape(ps, ps, 3)
        d = np.diff(uv, axis=1)
        np.testing.assert_allclose(d, np.broadcast_to(d[:1, :1], d.shape),
                                   atol=1e-6)

    def test_eval_mode(self, fake_root):
        ds = make_dataset(fake_root, mode='val')
        item = ds[0]
        n = item['inputs'].shape[0]
        assert item['inputs.image_mask'].sum() == n
        assert n > 100

    def test_frame_sampler(self, fake_root):
        ds = make_dataset(fake_root)
        sampler = FrameBatchSampler(ds, shuffle=False)
        groups = list(sampler)
        assert len(groups) == 2
        assert all(len(g) == 2 for g in groups)
        for g in groups:
            frames = {ds.data[i]['frame_idx'] for i in g}
            assert len(frames) == 1

    def test_multi_frame_sampler(self, fake_root):
        """MultiFrameBatchSampler (per-block-frame mode): every item
        visited exactly once per epoch, multi-process shards disjoint
        and equal step counts, per-step batch size respected."""
        from arah_tpu.data.loader import MultiFrameBatchSampler
        ds = make_dataset(fake_root)
        n_items = len(ds.data)
        s = MultiFrameBatchSampler(ds, batch_size=2, shuffle=True, seed=3)
        steps = list(s)
        assert all(len(g) == 2 for g in steps)
        seen = [i for g in steps for i in g]
        assert sorted(seen) == sorted(set(seen))   # no dup within epoch
        assert len(seen) == (n_items // 2) * 2
        # a fresh epoch reshuffles
        steps2 = list(s)
        assert sorted(x for g in steps2 for x in g) == sorted(seen)
        # sharding: disjoint strided slices, same step count per rank
        s0 = MultiFrameBatchSampler(ds, 1, shuffle=False, shard_id=0,
                                    num_shards=2)
        s1 = MultiFrameBatchSampler(ds, 1, shuffle=False, shard_id=1,
                                    num_shards=2)
        i0 = {i for g in s0 for i in g}
        i1 = {i for g in s1 for i in g}
        assert not (i0 & i1)
        assert len(list(s0)) == len(list(s1))


class TestTrainFromDataset:
    @pytest.mark.slow
    def test_collate_and_step(self, fake_root):
        ds = make_dataset(fake_root)
        sampler = FrameBatchSampler(ds, shuffle=False)
        idxs = next(iter(sampler))
        items = [ds[i] for i in idxs]
        batch = collate_train_batch(items)
        assert batch.ray_dirs.shape == (2, 256, 3)
        assert batch.rgb_gt.shape == (2, 256, 3)

        from arah_tpu.model import init_model_params
        from arah_tpu.parallel.train_step import (TrainState,
                                                  make_train_step)
        from arah_tpu.train.loss import LossWeights
        from arah_tpu.train.optim import OptimConfig, make_optimizer

        cfg = small_config(train_skinning=True)
        params = init_model_params(jax.random.PRNGKey(0), cfg,
                                   n_latent_frames=2)
        loss_w = LossWeights(n_ray_loss=256, inside=10.0, skinning=10.0)
        opt, _ = make_optimizer(OptimConfig(), params)
        state = TrainState(params, opt.init(params), jnp.int32(0))
        step = make_train_step(cfg, loss_w, opt)
        new_state, losses = step(state, batch, jax.random.PRNGKey(1))
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, float(v))
        assert int(new_state.step) == 1

    def test_prefetcher(self, fake_root):
        ds = make_dataset(fake_root)
        sampler = FrameBatchSampler(ds, shuffle=False)
        pf = Prefetcher(ds, sampler, collate_train_batch, n_workers=2)
        batches = list(iter(pf))
        assert len(batches) == 2
        assert batches[0].ray_dirs.shape == (2, 256, 3)


class TestFactoryAndH36M:
    def test_get_dataset_factory(self, fake_root):
        root, misc_dir, _ = fake_root
        from arah_tpu.config.factory import get_dataset
        cfg = {
            'data': {'dataset': 'zju_mocap', 'path': root,
                     'smpl_misc': misc_dir,
                     'train_split': ['CoreView_313'],
                     'val_split': ['CoreView_313'],
                     'test_split': ['CoreView_313'],
                     'train_views': ['1', '7'], 'val_views': ['1'],
                     'test_views': ['1'],
                     'num_fg_samples': 32, 'num_bg_samples': 32,
                     'sample_reg_surface': True, 'erode_mask': False},
            'training': {'inside_weight': 10.0},
        }
        ds = get_dataset('train', cfg)
        assert len(ds) == 4
        item = ds[0]
        assert 'image.points_inside' in item

    def test_h36m_layout(self, fake_root, tmp_path):
        """H36M subclass reads the {subject}/Posing/... layout."""
        import shutil
        root, misc_dir, _ = fake_root
        h36m_root = str(tmp_path / 'h36m')
        os.makedirs(os.path.join(h36m_root, 'S9'))
        shutil.copytree(os.path.join(root, 'CoreView_313'),
                        os.path.join(h36m_root, 'S9', 'Posing'))
        from arah_tpu.data.human_video import H36MDataset
        ds = H36MDataset(h36m_root, smpl_misc_dir=misc_dir,
                         subjects=('S9',), mode='train',
                         img_size=(128, 128), num_fg_samples=32,
                         num_bg_samples=32, erode_mask=False, seed=0,
                         views=('1',))
        assert len(ds) == 2
        item = ds[0]
        assert item['inputs'].shape == (64, 3)
        # K untouched only at native res; here it is rescaled from 1002x1000
        assert np.isfinite(item['image.K']).all()


    def test_h36m_fixture_e2e(self, tmp_path):
        """Geometrically-consistent fake H36M dataset: fg rays must hit
        the silhouette and bounds must be valid."""
        from arah_tpu.data.fake_dataset import make_fake_h36m_dataset
        from arah_tpu.data.human_video import H36MDataset
        root = str(tmp_path / 'fake_h36m')
        misc_dir, _ = make_fake_h36m_dataset(root, n_frames=2,
                                             views=('1', '2'), n_verts=512)
        ds = H36MDataset(root, smpl_misc_dir=misc_dir, subjects=('S9',),
                         mode='train', img_size=(128, 128),
                         num_fg_samples=64, num_bg_samples=64,
                         erode_mask=False, seed=0)
        assert len(ds) == 4
        item = ds[0]
        assert item['inputs.mask'][:64].mean() > 0.9
        nf = item['inputs.body_bounds_intersections']
        assert (nf[:, 0] < nf[:, 1]).all()
        fd = frame_from_item(item)
        assert np.isfinite(np.asarray(fd.frame.bone_transforms)).all()
        val = H36MDataset(root, smpl_misc_dir=misc_dir, subjects=('S9',),
                          mode='val', img_size=(128, 128),
                          erode_mask=False, seed=0, views=('1',))
        v_item = val[0]
        assert v_item['inputs.image_mask'].sum() == v_item['inputs'].shape[0]


class TestPeopleSnapshot:
    def test_ps_layout(self, fake_root, tmp_path):
        """People-Snapshot subclass reads camera.pkl + image/ + mask/."""
        import pickle, shutil, glob as globm
        root, misc_dir, _ = fake_root
        ps_root = str(tmp_path / 'ps')
        subj = os.path.join(ps_root, 'male-3-casual')
        os.makedirs(os.path.join(subj, 'image'))
        os.makedirs(os.path.join(subj, 'mask'))
        src = os.path.join(root, 'CoreView_313')
        shutil.copytree(os.path.join(src, 'models'),
                        os.path.join(subj, 'models'))
        for i, f in enumerate(sorted(globm.glob(
                os.path.join(src, '1', '*.jpg')))):
            shutil.copy(f, os.path.join(subj, 'image', f'{i:06d}.jpg'))
        for i, f in enumerate(sorted(globm.glob(
                os.path.join(src, '1', '*.png')))):
            shutil.copy(f, os.path.join(subj, 'mask', f'{i:06d}.png'))
        with open(os.path.join(subj, 'camera.pkl'), 'wb') as f:
            pickle.dump({'camera_f': [1000.0, 1000.0],
                         'camera_c': [512.0, 512.0],
                         'camera_k': np.zeros(5),
                         'height': 1024, 'width': 1024}, f)
        from arah_tpu.data.human_video import PeopleSnapshotDataset
        ds = PeopleSnapshotDataset(
            ps_root, smpl_misc_dir=misc_dir, subjects=('male-3-casual',),
            mode='train', img_size=(128, 128), num_fg_samples=16,
            num_bg_samples=16, erode_mask=False, seed=0)
        assert len(ds) == 2
        item = ds[0]
        assert item['inputs'].shape == (32, 3)
        # identity extrinsics: cam at origin
        np.testing.assert_allclose(item['image.cam_loc'], 0.0, atol=1e-6)

    def test_ps_fixture_e2e(self, tmp_path):
        """Geometrically-consistent fake People-Snapshot dataset (body in
        front of the identity camera)."""
        from arah_tpu.data.fake_dataset import make_fake_snapshot_dataset
        from arah_tpu.data.human_video import PeopleSnapshotDataset
        root = str(tmp_path / 'fake_ps')
        misc_dir, _ = make_fake_snapshot_dataset(root, n_frames=2,
                                                 n_verts=512)
        ds = PeopleSnapshotDataset(
            root, smpl_misc_dir=misc_dir, subjects=('female-3-casual',),
            mode='train', img_size=(128, 128), num_fg_samples=64,
            num_bg_samples=64, erode_mask=False, seed=0)
        assert len(ds) == 2
        item = ds[0]
        assert item['inputs.mask'][:64].mean() > 0.9
        nf = item['inputs.body_bounds_intersections']
        assert (nf[:, 0] < nf[:, 1]).all()
        # the translated body must sit in front of the camera
        assert float(np.asarray(item['image.trans'])[2]) > 1.0
        fd = frame_from_item(item)
        assert np.isfinite(np.asarray(fd.smpl.verts_posed)).all()
