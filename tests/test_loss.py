"""Loss-module parity vs the reference IDHRLoss (torch, lpips stubbed —
perceptual weight 0 as in every shipped reference config)."""
import numpy as np
import jax.numpy as jnp
import pytest

from conftest import add_reference_path

add_reference_path()

import torch  # noqa: E402

from arah_tpu.train.loss import LossWeights, compute_loss  # noqa: E402


def t(x):
    return torch.tensor(np.asarray(x))


@pytest.fixture
def fake_outputs(rng):
    n = 2048
    outputs = {
        'rgb_values': rng.rand(n, 3).astype(np.float32),
        'weights_sum': rng.rand(n).astype(np.float32),
        'network_body_mask': rng.rand(n) > 0.3,
        'grad_theta': (rng.randn(1024, 3) * 1.2).astype(np.float32),
        'off_surface_sdf': (rng.rand(1024) * 0.5).astype(np.float32),
        'inside_sdf': (rng.randn(1024) * 0.01).astype(np.float32),
        'sdf_params': [rng.randn(768).astype(np.float32),
                       rng.randn(1024).astype(np.float32)],
        'pred_weights': rng.rand(1024, 24).astype(np.float32),
    }
    gt = {
        'rgb': rng.rand(n, 3).astype(np.float32),
        'body_mask': (rng.rand(n) > 0.5).astype(np.int32),
        'sampled_weights': rng.rand(1024, 24).astype(np.float32),
    }
    return outputs, gt


class TestLossParity:
    def test_vs_reference(self, fake_outputs):
        from im2mesh.metaavatar_render.renderer.loss import IDHRLoss
        outputs, gt = fake_outputs
        n = 2048

        w = LossWeights(rgb=30.0, perceptual=0.0, eikonal=50.0, mask=3e3,
                        off_surface=1e2, inside=10.0, params=1e2,
                        skinning=10.0, n_ray_loss=n)
        ours = compute_loss(
            {k: jnp.asarray(v) if not isinstance(v, list) else
             [jnp.asarray(p) for p in v] for k, v in outputs.items()},
            {k: jnp.asarray(v) for k, v in gt.items()}, w)

        ref_loss = IDHRLoss(rgb_weight=30.0, perceptual_weight=0.0,
                            eikonal_weight=50.0, mask_weight=3e3,
                            off_surface_weight=1e2, inside_weight=10.0,
                            params_weight=1e2, skinning_weight=10.0,
                            rgb_loss_type='l1', perceptual_loss_fn=None)
        model_outputs = {
            'rgb_values': t(outputs['rgb_values'])[None],
            'sdf_output': t(outputs['weights_sum'])[None],
            'network_body_mask': t(outputs['network_body_mask'])[None],
            'body_mask': t(gt['body_mask'])[None],
            'off_surface_mask': t(outputs['network_body_mask'])[None],
            'off_surface_sdf': t(outputs['off_surface_sdf'])[None, :, None],
            'inside_sdf': t(outputs['inside_sdf'])[:, None],
            'grad_theta': t(outputs['grad_theta']),
            'sdf_params': [t(p)[None] for p in outputs['sdf_params']],
            'pred_weights': t(outputs['pred_weights'])[None],
            'surface_normals': None,
        }
        ground_truth = {
            'rgb': t(gt['rgb'])[None],
            'sampled_weights': t(gt['sampled_weights'])[None],
        }
        with torch.no_grad():
            ref = ref_loss(model_outputs, ground_truth)

        for key in ('rgb_loss', 'eikonal_loss', 'mask_loss',
                    'off_surface_loss', 'inside_loss', 'sdf_params_loss',
                    'skinning_loss', 'loss'):
            np.testing.assert_allclose(
                float(ours[key]), float(ref[key]), rtol=2e-5,
                err_msg=key)

    def test_perceptual_patch_slicing_vs_reference(self, fake_outputs):
        """Patch rays (after n_ray_loss) -> (-1, ps, ps, 3) patches fed to
        the perceptual fn, and boundary pixels (label 100) dropped from
        the RGB loss — `loss.py:52-55,62-84,133-139`. Both sides use the
        same MSE stub for p_loss so only slicing/reshaping is compared."""
        from im2mesh.metaavatar_render.renderer.loss import IDHRLoss
        outputs, gt = fake_outputs
        n, ps, n_patch = 2048, 48, 2
        rng2 = np.random.RandomState(7)
        rgb_all = np.concatenate(
            [outputs['rgb_values'],
             rng2.rand(n_patch * ps * ps, 3).astype(np.float32)])
        gt_all = np.concatenate(
            [gt['rgb'], rng2.rand(n_patch * ps * ps, 3).astype(np.float32)])
        # boundary labels on some fg rays + all patch rays get labels too
        mask_all = np.concatenate(
            [gt['body_mask'],
             rng2.choice([0, 1, 100], n_patch * ps * ps).astype(np.int32)])
        mask_all[:64] = 100

        w = LossWeights(rgb=30.0, perceptual=2.0, eikonal=0, mask=0,
                        off_surface=0, inside=0, params=0, skinning=0,
                        n_ray_loss=n, patch_size=ps)
        ours = compute_loss(
            {'rgb_values': jnp.asarray(rgb_all),
             'weights_sum': jnp.asarray(outputs['weights_sum']),
             'network_body_mask': jnp.asarray(np.concatenate(
                 [outputs['network_body_mask'],
                  np.ones(n_patch * ps * ps, bool)]))},
            {'rgb': jnp.asarray(gt_all),
             'body_mask': jnp.asarray(mask_all)}, w,
            perceptual_fn=lambda p, g: jnp.mean(
                jnp.mean((p - g) ** 2, axis=(1, 2, 3))))

        stub = lambda p, g, normalize: ((p - g) ** 2).mean(dim=(1, 2, 3))  # noqa: E731
        ref_loss = IDHRLoss(rgb_weight=30.0, perceptual_weight=2.0,
                            eikonal_weight=0, mask_weight=0,
                            off_surface_weight=0, inside_weight=0,
                            params_weight=0, skinning_weight=0,
                            rgb_loss_type='l1', perceptual_loss_fn=stub)
        model_outputs = {
            'rgb_values': t(rgb_all)[None],
            'sdf_output': t(outputs['weights_sum'])[None],
            'network_body_mask': torch.cat(
                [t(outputs['network_body_mask']),
                 torch.ones(n_patch * ps * ps, dtype=torch.bool)])[None],
            'body_mask': t(mask_all)[None],
            'off_surface_mask': t(outputs['network_body_mask'])[None],
            'sdf_params': [t(p)[None] for p in outputs['sdf_params']],
            'grad_theta': torch.zeros(0, 3),
            'surface_normals': None,
        }
        with torch.no_grad():
            ref = ref_loss(model_outputs, {'rgb': t(gt_all)[None]})
        for key in ('rgb_loss', 'perceptual_loss', 'loss'):
            np.testing.assert_allclose(float(ours[key]), float(ref[key]),
                                       rtol=2e-5, err_msg=key)

    def test_msdssim_proxy(self):
        """The fallback perceptual fn: zero on identical patches, positive
        and differentiable on differing ones."""
        import jax
        from arah_tpu.utils.lpips_jax import msdssim
        rng2 = np.random.RandomState(3)
        a = jnp.asarray(rng2.rand(2, 48, 48, 3).astype(np.float32))
        b = jnp.asarray(rng2.rand(2, 48, 48, 3).astype(np.float32))
        same = np.asarray(msdssim(a, a))
        np.testing.assert_allclose(same, 0.0, atol=1e-5)
        diff = np.asarray(msdssim(a, b))
        assert (diff > 0.01).all()
        g = jax.grad(lambda x: jnp.mean(msdssim(x, b)))(a)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    @pytest.mark.parametrize('kind', ['mse', 'smoothed_l1'])
    def test_rgb_loss_types(self, fake_outputs, kind):
        from im2mesh.metaavatar_render.renderer.loss import IDHRLoss
        outputs, gt = fake_outputs
        n = 2048
        w = LossWeights(rgb=1.0, eikonal=0, mask=0, off_surface=0,
                        inside=0, params=0, skinning=0, rgb_loss_type=kind,
                        n_ray_loss=n)
        ours = compute_loss(
            {'rgb_values': jnp.asarray(outputs['rgb_values']),
             'weights_sum': jnp.asarray(outputs['weights_sum']),
             'network_body_mask': jnp.asarray(
                 outputs['network_body_mask'])},
            {'rgb': jnp.asarray(gt['rgb']),
             'body_mask': jnp.asarray(gt['body_mask'])}, w)
        ref_loss = IDHRLoss(rgb_weight=1.0, perceptual_weight=0,
                            eikonal_weight=0, mask_weight=0,
                            off_surface_weight=0, inside_weight=0,
                            params_weight=0, skinning_weight=0,
                            rgb_loss_type=kind, perceptual_loss_fn=None)
        with torch.no_grad():
            r = ref_loss.get_rgb_loss(
                t(outputs['rgb_values'])[None], t(gt['rgb'])[None],
                t(outputs['network_body_mask'])[None],
                t(gt['body_mask'])[None])
        np.testing.assert_allclose(float(ours['rgb_loss']), float(r),
                                   rtol=2e-5)
