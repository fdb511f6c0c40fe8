"""Training-step tests: single-device and sharded over the virtual 8-CPU
mesh (data-parallel ray blocks, gradient pmean)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arah_tpu.data.batch import synthetic_train_batch
from arah_tpu.data.synthetic import synthetic_smpl
from arah_tpu.model import init_model_params, prepare_frame
from arah_tpu.parallel.mesh import make_mesh, block_sharding, replicated
from arah_tpu.parallel.train_step import TrainState, make_train_step
from arah_tpu.train.loss import LossWeights
from arah_tpu.train.optim import OptimConfig, make_optimizer

from test_renderer import small_config


def setup(train_skinning=True, n_blocks=2, n_rays=128):
    cfg = small_config(train_skinning=train_skinning)
    model = synthetic_smpl(n_verts=256)
    rngk = jax.random.PRNGKey(0)
    params = init_model_params(rngk, cfg, n_latent_frames=4)
    rng = np.random.RandomState(1)
    fd = prepare_frame(
        model, jnp.asarray(rng.randn(10).astype(np.float32) * 0.3),
        jnp.asarray((rng.randn(72) * 0.2).astype(np.float32)),
        jnp.asarray([0.1, 0.0, 0.2], jnp.float32))
    batch = synthetic_train_batch(jax.random.PRNGKey(2), fd,
                                  n_blocks=n_blocks, n_rays=n_rays)
    loss_w = LossWeights(n_ray_loss=n_rays)
    ocfg = OptimConfig(lr=1e-4, train_skinning_net=train_skinning)
    optimizer, labels = make_optimizer(ocfg, params)
    opt_state = optimizer.init(params)
    state = TrainState(params, opt_state, jnp.int32(0))
    return cfg, loss_w, optimizer, state, batch, labels


class TestSingleDevice:
    @pytest.mark.slow
    def test_step_runs_and_updates(self):
        cfg, loss_w, optimizer, state, batch, labels = setup()
        step = make_train_step(cfg, loss_w, optimizer)
        # the step donates its input state; snapshot what we compare
        old = jax.tree.map(jnp.copy, {
            'color': state.params['color']['layers'],
            'mapping': state.params['hypernet']['mapping'],
            'hypo_init': state.params['hypernet']['hypo_init']})
        new_state, losses = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(losses['loss']))
        assert int(new_state.step) == 1
        # color params must have moved; frozen mapping network must not
        d_color = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            old['color'],
            new_state.params['color']['layers'])
        assert max(jax.tree.leaves(d_color)) > 0
        d_map = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            old['mapping'],
            new_state.params['hypernet']['mapping'])
        assert max(jax.tree.leaves(d_map)) == 0
        d_init = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            old['hypo_init'],
            new_state.params['hypernet']['hypo_init'])
        assert max(jax.tree.leaves(d_init)) == 0

    @pytest.mark.slow
    def test_perceptual_patch_step(self):
        """Train step with perceptual_weight > 0: the patch rays after
        n_ray_loss feed the (proxy) perceptual fn, the term is non-zero
        and the step stays finite (ref `loss.py:62-84` wiring)."""
        ps = 8
        n_loss = 64
        cfg, _, optimizer, state, batch, _ = setup(
            n_blocks=2, n_rays=n_loss + ps * ps)
        loss_w = LossWeights(n_ray_loss=n_loss, patch_size=ps,
                             perceptual=0.1)
        step = make_train_step(cfg, loss_w, optimizer)
        old_color = jax.tree.map(jnp.copy, state.params['color']['layers'])
        new_state, losses = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(losses['loss']))
        assert float(losses['perceptual_loss']) > 0
        d_color = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            old_color,
            new_state.params['color']['layers'])
        assert max(jax.tree.leaves(d_color)) > 0

    def test_optimizer_labels(self):
        cfg, loss_w, optimizer, state, batch, labels = setup()
        assert labels['hypernet']['hyper_layers'][0]['last']['w'] \
            == 'sdf_hyper'
        assert labels['hypernet']['pose_encoder']['layer_0']['w'] \
            == 'sdf_pose_encoder'
        assert labels['hypernet']['mapping']['last']['w'] == 'frozen'
        assert labels['deviation']['variance'] == 'deviation'
        assert labels['latent'] == 'latent'

    def test_lr_schedule_decays_updates(self):
        """Optional global lr decay (beyond-reference; the reference has
        no scheduler): the same gradient must produce a smaller update
        at a late step than at step 0, scaled by the schedule factor."""
        import jax
        import jax.numpy as jnp
        import optax
        from arah_tpu.train.optim import OptimConfig, make_optimizer

        params = {'color': {'layers': [{'v': jnp.ones((4, 4)),
                                        'g': jnp.ones((4, 1)),
                                        'b': jnp.zeros(4)}]}}
        grads = jax.tree.map(jnp.ones_like, params)

        def update_norm(cfg, n_warm):
            opt, _ = make_optimizer(cfg, params)
            st = opt.init(params)
            upd = None
            for _ in range(n_warm + 1):
                upd, st = opt.update(grads, st, params)
            return float(jnp.abs(upd['color']['layers'][0]['v']).max())

        base = OptimConfig()
        cos = base._replace(lr_schedule='cosine', lr_decay_steps=100,
                            lr_min_factor=0.1)
        # constant: same magnitude at step 0 and step 100
        assert abs(update_norm(base, 100) - update_norm(base, 0)) < 1e-9
        # cosine: decayed to the floor by decay_steps
        early, late = update_norm(cos, 0), update_norm(cos, 100)
        assert late < 0.2 * early, (early, late)
        assert late > 0.05 * early   # floored at min_factor


class TestSharded:
    @pytest.mark.slow
    def test_8dev_mesh_step(self):
        n_dev = len(jax.devices())
        assert n_dev == 8, f'expected 8 virtual cpu devices, got {n_dev}'
        cfg, loss_w, optimizer, state, batch, _ = setup(
            n_blocks=8, n_rays=64)
        mesh = make_mesh()
        step = make_train_step(cfg, loss_w, optimizer, mesh=mesh)

        bs = block_sharding(mesh)
        rep = replicated(mesh)
        batch = batch._replace(
            **{f: jax.device_put(getattr(batch, f), bs)
               for f in ('cam_loc', 'ray_dirs', 'near', 'far', 'rgb_gt',
                         'body_mask', 'points_uniform', 'points_skinning',
                         'points_inside', 'sampled_weights', 'rots_noise',
                         'view_noise', 'rot_noise', 'trans_noise',
                         'uv', 'cam_idx')},
            frame=jax.device_put(batch.frame, rep),
            latent_idx=jax.device_put(batch.latent_idx, rep))
        state = jax.device_put(state, rep)

        new_state, losses = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(losses['loss']))
        # params identical on all devices (replicated update)
        v = new_state.params['deviation']['variance']
        assert np.isfinite(float(v))


class TestPerBlockFrame:
    @pytest.mark.slow
    def test_identical_frames_match_replicated_path(self):
        """per_block_frame=True with every block carrying the SAME frame
        must be value-identical to the replicated-frame path (pins the
        per-block indexing of frame leaves + latent lookup)."""
        cfg, loss_w, optimizer, state, _, _ = setup(n_blocks=2, n_rays=64)
        model = synthetic_smpl(n_verts=256)
        rng = np.random.RandomState(1)
        fd = prepare_frame(
            model, jnp.asarray(rng.randn(10).astype(np.float32) * 0.3),
            jnp.asarray((rng.randn(72) * 0.2).astype(np.float32)),
            jnp.asarray([0.1, 0.0, 0.2], jnp.float32))
        key = jax.random.PRNGKey(2)
        b_mf = synthetic_train_batch(key, fd, n_blocks=2, n_rays=64,
                                     fds=[fd, fd])
        b_mf = b_mf._replace(latent_idx=jnp.array([1, 1], jnp.int32))
        b_sf = synthetic_train_batch(key, fd, n_blocks=2, n_rays=64,
                                     latent_idx=1)
        step_mf = make_train_step(cfg, loss_w, optimizer,
                                  per_block_frame=True, donate=False)
        step_sf = make_train_step(cfg, loss_w, optimizer, donate=False)
        k = jax.random.PRNGKey(3)
        s_mf, l_mf = step_mf(state, b_mf, k)
        s_sf, l_sf = step_sf(state, b_sf, k)
        np.testing.assert_allclose(float(l_mf['loss']), float(l_sf['loss']),
                                   rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
            s_mf.params, s_sf.params)

    @pytest.mark.slow
    def test_distinct_frames_sharded_mesh(self):
        """8-device mesh, each device's ray block carrying a DIFFERENT
        frame (distinct SMPL poses): step executes, loss finite, params
        advance — the reference cannot do this at all (one frame per
        step asserted, `ray_tracing.py:129-132`)."""
        from arah_tpu.parallel.train_step import N_PER_BLOCK_FIELDS
        cfg, loss_w, optimizer, state, _, _ = setup(n_blocks=2, n_rays=32)
        model = synthetic_smpl(n_verts=256)
        rng = np.random.RandomState(5)
        fds = [prepare_frame(
            model, jnp.asarray(rng.randn(10).astype(np.float32) * 0.3),
            jnp.asarray((rng.randn(72) * 0.2).astype(np.float32)),
            jnp.zeros(3)) for _ in range(8)]
        # 8 latent rows (+1 fallback)
        params = init_model_params(jax.random.PRNGKey(0),
                                   small_config(train_skinning=True),
                                   n_latent_frames=8)
        optimizer, _ = make_optimizer(
            OptimConfig(lr=1e-4, train_skinning_net=True), params)
        state = TrainState(params, optimizer.init(params), jnp.int32(0))
        batch = synthetic_train_batch(jax.random.PRNGKey(2), fds[0],
                                      n_blocks=8, n_rays=32, n_reg=16,
                                      fds=fds)
        mesh = make_mesh()
        bs, rep = block_sharding(mesh), replicated(mesh)
        batch = batch._replace(
            **{f: jax.device_put(getattr(batch, f), bs)
               for f in batch._fields[:N_PER_BLOCK_FIELDS]},
            frame=jax.device_put(batch.frame, bs),
            latent_idx=jax.device_put(batch.latent_idx, bs))
        state = jax.device_put(state, rep)
        step = make_train_step(cfg, loss_w, optimizer, mesh=mesh,
                               per_block_frame=True)
        new_state, losses = step(state, batch, jax.random.PRNGKey(4))
        assert np.isfinite(float(losses['loss']))
        assert int(new_state.step) == 1


class TestCheckpointRoundTrip:
    def test_orbax_save_restore(self, tmp_path):
        import jax.numpy as jnp
        from arah_tpu.train import checkpoints as ckpt_lib
        cfg, loss_w, optimizer, state, batch, _ = setup(n_rays=32)
        d = str(tmp_path / 'ckpts')
        import os
        os.makedirs(d)
        ckpt_lib.save_checkpoint(d, 7, state)
        assert ckpt_lib.latest_step(d) == 7
        restored, step = ckpt_lib.restore_checkpoint(d, state)
        assert step == 7
        a = jax.tree.leaves(state.params)
        b = jax.tree.leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestShardedEval:
    def test_render_frame_rays_on_mesh(self):
        """Eval chunk rendering sharded over the 8-device CPU mesh."""
        from arah_tpu.data.fake_dataset import make_fake_zju_dataset
        from arah_tpu.data.human_video import ZJUMoCapDataset
        from arah_tpu.data.loader import frame_from_item
        from arah_tpu.eval.evaluator import render_frame_rays
        from arah_tpu.parallel.mesh import make_mesh
        import tempfile, os
        with tempfile.TemporaryDirectory() as root:
            misc, _ = make_fake_zju_dataset(root, n_frames=1, views=('1',),
                                            n_verts=256)
            ds = ZJUMoCapDataset(root, smpl_misc_dir=misc,
                                 subjects=('CoreView_313',), mode='val',
                                 img_size=(96, 96), erode_mask=False,
                                 seed=0)
            item = ds[0]
            cfg = small_config()
            params = init_model_params(jax.random.PRNGKey(0), cfg,
                                      n_latent_frames=2)
            fd = frame_from_item(item)
            mesh = make_mesh()
            rgb, w, d, c = render_frame_rays(
                params, cfg, fd, item, params['latent'][0], chunk=256,
                mesh=mesh)
            assert np.isfinite(rgb).all()
            n = np.asarray(item['inputs.ray_dirs']).shape[0]
            assert rgb.shape == (n, 3)
