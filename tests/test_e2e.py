"""Full-stack end-to-end test: fake on-disk dataset -> trainer (1 epoch)
-> checkpoint -> full-image evaluation -> ODP mesh/normal rendering."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arah_tpu.data.fake_dataset import make_fake_zju_dataset
from arah_tpu.data.human_video import ZJUMoCapDataset
from arah_tpu.data.odp import ODPDataset

from test_renderer import small_config


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('e2e'))
    misc_dir, model = make_fake_zju_dataset(
        os.path.join(root, 'data'), n_frames=2, views=('1', '7'),
        n_verts=512)
    return root, os.path.join(root, 'data'), misc_dir, model


@pytest.mark.slow
def test_train_eval_odp_cycle(workspace):
    root, data_root, misc_dir, model = workspace
    out_dir = os.path.join(root, 'out')
    cfg = {
        'training': {'out_dir': out_dir, 'max_epochs': 1,
                     'checkpoint_every_n_epochs': 1},
    }
    model_cfg = small_config(train_skinning=True)

    dataset = ZJUMoCapDataset(
        data_root, smpl_misc_dir=misc_dir, subjects=('CoreView_313',),
        mode='train', img_size=(128, 128), num_fg_samples=64,
        num_bg_samples=64, sample_reg_surface=True, sample_inside=True,
        erode_mask=False, seed=0)

    from arah_tpu.model import init_model_params
    from arah_tpu.train.loss import LossWeights
    from arah_tpu.train.optim import OptimConfig
    from arah_tpu.train.trainer import train

    params = init_model_params(jax.random.PRNGKey(0), model_cfg,
                               n_latent_frames=2)
    loss_w = LossWeights(n_ray_loss=128, inside=10.0, skinning=10.0)
    state, stopped = train(cfg, model_cfg, loss_w, OptimConfig(lr=1e-4),
                           dataset, params, max_epochs=1,
                           pose_input_noise=True, view_input_noise=True)
    assert not stopped
    assert int(state.step) == 2   # 2 frames, 1 epoch
    assert os.path.exists(os.path.join(out_dir, 'checkpoints', 'LAST'))
    assert os.path.exists(os.path.join(out_dir, 'metrics.tsv'))

    # resume: a second train() call must pick up the checkpoint
    state2, _ = train(cfg, model_cfg, loss_w, OptimConfig(lr=1e-4),
                      dataset, params, max_epochs=1)
    assert int(state2.step) == 2   # already at epoch 1, no extra steps

    # full-image evaluation on a val item
    val_ds = ZJUMoCapDataset(
        data_root, smpl_misc_dir=misc_dir, subjects=('CoreView_313',),
        mode='val', img_size=(128, 128), erode_mask=False, seed=0)
    from arah_tpu.eval.evaluator import evaluate_frame
    item = val_ds[0]
    latent = state.params['latent'][0]
    m = evaluate_frame(state.params, model_cfg, item, latent, chunk=512)
    assert np.isfinite(m['psnr'])
    assert m['rgb_pred'].shape == (128, 128, 3)
    assert m['normal_pred'].shape == (128, 128, 3)

    # ODP animation path (pose-only dataset reusing the models dir)
    odp = ODPDataset(data_root, pose_dir='models', cam_name='1',
                     smpl_misc_dir=misc_dir, subjects=('CoreView_313',),
                     img_size=(128, 128), end_frame=1)
    from arah_tpu.data.loader import frame_from_item
    from arah_tpu.eval.evaluator import render_frame_rays, scatter_image
    from arah_tpu.eval.mesh_vis import render_normal_maps
    item = odp[0]
    assert item['inputs.novel_seq']
    fd = frame_from_item(item)
    rgb, w, depth, conv = render_frame_rays(
        state.params, model_cfg, fd, item, state.params['latent'][-1],
        chunk=512)
    img = scatter_image(rgb, np.asarray(item['inputs.image_mask']))
    assert np.isfinite(img).all()
    posed, front, back = render_normal_maps(
        state.params, model_cfg, fd, item, state.params['latent'][-1],
        resolution=48, img_size=128)
    assert posed.shape == (128, 128, 3)
    assert front.shape == (128, 128, 3)
