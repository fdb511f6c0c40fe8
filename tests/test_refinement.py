"""Tests for the SMPL-pose and camera-extrinsic refinement paths."""
import numpy as np
import jax
import pytest
import jax.numpy as jnp

from arah_tpu.data.batch import synthetic_train_batch
from arah_tpu.data.synthetic import synthetic_smpl
from arah_tpu.model import init_model_params, prepare_frame
from arah_tpu.parallel.train_step import TrainState, make_train_step
from arah_tpu.train.loss import LossWeights
from arah_tpu.train.optim import OptimConfig, make_optimizer
from arah_tpu.core.smpl import quat_to_rot

from test_renderer import small_config


def test_quat_to_rot_identity_and_orthonormal(rng):
    q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(quat_to_rot(q)), np.eye(3),
                               atol=1e-6)
    q = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    R = np.asarray(quat_to_rot(q))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99


def test_quat_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    q = rng.randn(6, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(quat_to_rot(jnp.asarray(q)))
    ref = Rotation.from_quat(q).as_matrix()   # scipy uses xyzw too
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.slow
def test_refinement_gradients():
    cfg = small_config(train_skinning=False)
    model = synthetic_smpl(n_verts=256)
    rng = np.random.RandomState(0)
    params = init_model_params(jax.random.PRNGKey(0), cfg,
                               n_latent_frames=2)
    n_frames = 2
    params['smpl_params'] = {
        'root_orient': jnp.asarray(rng.randn(n_frames, 3) * 0.1,
                                   jnp.float32),
        'pose_body': jnp.asarray(rng.randn(n_frames, 63) * 0.1,
                                 jnp.float32),
        'pose_hand': jnp.asarray(rng.randn(n_frames, 6) * 0.1, jnp.float32),
        'trans': jnp.zeros((n_frames, 3)),
    }
    params['betas'] = jnp.zeros(10)
    params['cam_rots'] = jnp.tile(jnp.asarray([0., 0., 0., 1.]), (2, 1))
    params['cam_trans'] = jnp.asarray([[0., 0.3, 2.5], [0.2, 0.3, 2.5]])

    pose = jnp.concatenate([params['smpl_params']['root_orient'][0],
                            params['smpl_params']['pose_body'][0],
                            params['smpl_params']['pose_hand'][0]])
    fd = prepare_frame(model, params['betas'], pose,
                       params['smpl_params']['trans'][0])
    batch = synthetic_train_batch(jax.random.PRNGKey(2), fd, n_blocks=2,
                                  n_rays=64, n_reg=32)
    batch = batch._replace(latent_idx=jnp.int32(0))

    loss_w = LossWeights(n_ray_loss=64)
    opt, labels = make_optimizer(OptimConfig(), params)
    assert labels['smpl_params']['root_orient'] == 'aux'
    assert labels['cam_rots'] == 'aux'
    state = TrainState(params, opt.init(params), jnp.int32(0))
    step = make_train_step(cfg, loss_w, opt, smpl_model=model,
                           refine_smpl=True, refine_cameras=True)
    # the step donates its input state; snapshot the compared leaves
    old_pose = jnp.copy(params['smpl_params']['pose_body'])
    old_cam = jnp.copy(params['cam_rots'])
    new_state, losses = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(losses['loss']))
    # SMPL pose + camera params must have received updates
    d_pose = float(jnp.max(jnp.abs(
        new_state.params['smpl_params']['pose_body'] - old_pose)))
    d_cam = float(jnp.max(jnp.abs(
        new_state.params['cam_rots'] - old_cam)))
    assert d_pose > 0
    assert d_cam > 0
