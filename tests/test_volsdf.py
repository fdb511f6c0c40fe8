"""VolSDF compositing parity: our argsort left-packing + dense compositing
must reproduce the reference's variable-length scatter-packing
(`implicit_differentiable_renderer.py:284-289,366-396`) exactly.

The oracle below re-enacts the reference's packing/compositing semantics
in torch (masked_scatter over a staircase mask, cumprod transmittance)."""
import numpy as np
import torch
import jax.numpy as jnp

from arah_tpu.render.volsdf import composite, pack_left, volsdf_density


def torch_oracle(rgb, density, z_vals, converge_mask, n_steps,
                 render_last_pt=False):
    """Reference semantics: pack the valid samples of each ray into the
    leftmost slots, fill z with 1e10, compute dists with the 1/n_steps
    tail, alpha-composite."""
    n_pts, S = density.shape
    lengths = converge_mask.sum(-1)
    pv = torch.arange(n_pts)
    scatter_mask = torch.zeros(n_pts, S, dtype=bool)
    scatter_mask[pv, lengths - 1] = 1
    scatter_mask = scatter_mask + torch.sum(
        scatter_mask, dim=1, keepdims=True) - torch.cumsum(scatter_mask,
                                                           dim=1)
    scatter_mask = scatter_mask.bool()

    rgb_p = torch.zeros(n_pts, S, 3)
    den_p = torch.zeros(n_pts, S)
    z_p = 1e10 * torch.ones(n_pts, S)
    rgb_p.masked_scatter_(scatter_mask.unsqueeze(-1), rgb[converge_mask])
    den_p.masked_scatter_(scatter_mask, density[converge_mask])
    z_p.masked_scatter_(scatter_mask, z_vals[converge_mask])

    dists = z_p[..., 1:] - z_p[..., :-1]
    if render_last_pt:
        dists = torch.cat([dists, 1e10 * torch.ones(n_pts, 1)], dim=-1)
    else:
        dists = torch.cat([dists, (1. / n_steps) * torch.ones(n_pts, 1)],
                          dim=-1)
        dists[pv, lengths - 1] = 1. / n_steps

    alpha = 1.0 - torch.exp(-den_p * dists)
    weights = alpha * torch.cumprod(torch.cat(
        [torch.ones(n_pts, 1), 1. - alpha + 1e-7], dim=-1), dim=-1)[:, :-1]
    weights_sum = (weights * scatter_mask).sum(-1).clip(0, 1)
    rgb_out = ((rgb_p * weights.unsqueeze(-1))
               * scatter_mask.unsqueeze(-1)).sum(1)
    return rgb_out.numpy(), weights_sum.numpy()


class TestCompositeParity:
    def test_vs_torch_oracle(self, rng):
        n_pts, S = 32, 16
        z = np.sort(rng.rand(n_pts, S).astype(np.float32) * 3 + 1, axis=-1)
        rgb = rng.rand(n_pts, S, 3).astype(np.float32)
        density = (rng.rand(n_pts, S).astype(np.float32) * 50)
        mask = rng.rand(n_pts, S) > 0.3
        # the reference only composites rays with >= 1 valid sample
        # (vol_mask filter); ensure that invariant here and test the
        # empty-ray case separately below
        mask[mask.sum(-1) == 0, 0] = True
        mask[1] = True            # fully valid ray

        ref_rgb, ref_w = torch_oracle(
            torch.tensor(rgb), torch.tensor(density), torch.tensor(z),
            torch.tensor(mask), n_steps=S)

        order, packed = pack_left(jnp.asarray(mask), jnp.asarray(z))
        out = composite(
            jnp.take_along_axis(jnp.asarray(rgb), order[..., None], axis=1),
            jnp.take_along_axis(jnp.asarray(density), order, axis=1),
            jnp.take_along_axis(jnp.asarray(z), order, axis=1),
            packed, n_steps=S)
        np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights_sum), ref_w,
                                   atol=1e-5)

    def test_render_last_pt(self, rng):
        n_pts, S = 8, 8
        z = np.sort(rng.rand(n_pts, S).astype(np.float32) + 1, axis=-1)
        rgb = rng.rand(n_pts, S, 3).astype(np.float32)
        density = rng.rand(n_pts, S).astype(np.float32) * 10
        mask = np.ones((n_pts, S), bool)
        ref_rgb, ref_w = torch_oracle(
            torch.tensor(rgb), torch.tensor(density), torch.tensor(z),
            torch.tensor(mask), n_steps=S, render_last_pt=True)
        order, packed = pack_left(jnp.asarray(mask), jnp.asarray(z))
        out = composite(jnp.asarray(rgb), jnp.asarray(density),
                        jnp.asarray(z), packed, n_steps=S,
                        render_last_pt=True)
        np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights_sum), ref_w,
                                   atol=1e-5)


class TestEmptyRay:
    def test_no_valid_samples_gives_zero(self, rng):
        n_pts, S = 4, 8
        z = np.sort(rng.rand(n_pts, S).astype(np.float32) + 1, axis=-1)
        rgb = rng.rand(n_pts, S, 3).astype(np.float32)
        density = rng.rand(n_pts, S).astype(np.float32) * 10
        mask = np.zeros((n_pts, S), bool)
        order, packed = pack_left(jnp.asarray(mask), jnp.asarray(z))
        out = composite(jnp.asarray(rgb), jnp.asarray(density),
                        jnp.asarray(z), packed, n_steps=S)
        np.testing.assert_allclose(np.asarray(out.rgb), 0.0)
        np.testing.assert_allclose(np.asarray(out.weights_sum), 0.0)


class TestDensity:
    def test_vs_reference_formula(self, rng):
        sdf = torch.tensor(rng.randn(100).astype(np.float32) * 0.1)
        beta_t = torch.tensor(0.005).clip(1e-6, 1e6)
        inv_beta = torch.reciprocal(beta_t)
        ref = torch.relu(
            inv_beta * (0.5 + 0.5 * torch.sign(-sdf)
                        * (1 - torch.exp(-torch.abs(-sdf) * inv_beta))))
        ours = volsdf_density(jnp.asarray(sdf.numpy()), jnp.float32(0.005))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


class TestCompositeMasked:
    """composite_masked (gather-free) must equal pack_left+composite AND
    the torch oracle on arbitrary masks over ascending z rows."""

    def _ours(self, rgb, density, z, mask, n_steps, render_last_pt=False):
        from arah_tpu.render.volsdf import composite_masked
        return composite_masked(jnp.asarray(rgb), jnp.asarray(density),
                                jnp.asarray(z), jnp.asarray(mask),
                                n_steps=n_steps,
                                render_last_pt=render_last_pt)

    def test_matches_packed_and_oracle(self, rng):
        n_pts, S = 64, 16
        z = np.sort(rng.rand(n_pts, S).astype(np.float32) * 3 + 1, axis=-1)
        rgb = rng.rand(n_pts, S, 3).astype(np.float32)
        density = rng.rand(n_pts, S).astype(np.float32) * 50
        mask = rng.rand(n_pts, S) > 0.4
        mask[mask.sum(-1) == 0, 0] = True
        mask[1] = True
        mask[2] = False
        mask[2, S - 1] = True     # single valid sample, last slot

        ref_rgb, ref_w = torch_oracle(
            torch.tensor(rgb), torch.tensor(density), torch.tensor(z),
            torch.tensor(mask), n_steps=S)
        order, packed = pack_left(jnp.asarray(mask), jnp.asarray(z))
        packed_out = composite(
            jnp.take_along_axis(jnp.asarray(rgb), order[..., None], axis=1),
            jnp.take_along_axis(jnp.asarray(density), order, axis=1),
            jnp.take_along_axis(jnp.asarray(z), order, axis=1),
            packed, n_steps=S)
        out = self._ours(rgb, density, z, mask, n_steps=S)
        np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights_sum), ref_w,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.rgb),
                                   np.asarray(packed_out.rgb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.weights_sum),
                                   np.asarray(packed_out.weights_sum),
                                   atol=1e-6)

    def test_render_last_pt(self, rng):
        n_pts, S = 16, 8
        z = np.sort(rng.rand(n_pts, S).astype(np.float32) + 1, axis=-1)
        rgb = rng.rand(n_pts, S, 3).astype(np.float32)
        density = rng.rand(n_pts, S).astype(np.float32) * 10
        mask = rng.rand(n_pts, S) > 0.3
        mask[mask.sum(-1) == 0, 0] = True
        ref_rgb, ref_w = torch_oracle(
            torch.tensor(rgb), torch.tensor(density), torch.tensor(z),
            torch.tensor(mask), n_steps=S, render_last_pt=True)
        out = self._ours(rgb, density, z, mask, n_steps=S,
                         render_last_pt=True)
        np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights_sum), ref_w,
                                   atol=1e-5)

    def test_empty_ray_and_grads_finite(self, rng):
        import jax
        n_pts, S = 4, 8
        z = np.sort(rng.rand(n_pts, S).astype(np.float32) + 1, axis=-1)
        rgb = rng.rand(n_pts, S, 3).astype(np.float32)
        density = rng.rand(n_pts, S).astype(np.float32) * 10
        mask = np.zeros((n_pts, S), bool)
        out = self._ours(rgb, density, z, mask, n_steps=S)
        np.testing.assert_allclose(np.asarray(out.rgb), 0.0)
        np.testing.assert_allclose(np.asarray(out.weights_sum), 0.0)
        # gradients through the masked (inf-guarded) path must be finite
        from arah_tpu.render.volsdf import composite_masked
        mask2 = rng.rand(n_pts, S) > 0.4

        def f(d, r):
            o = composite_masked(r, d, jnp.asarray(z), jnp.asarray(mask2),
                                 n_steps=S)
            return jnp.sum(o.rgb) + jnp.sum(o.weights_sum)
        gd, gr = jax.grad(f, argnums=(0, 1))(jnp.asarray(density),
                                             jnp.asarray(rgb))
        assert np.isfinite(np.asarray(gd)).all()
        assert np.isfinite(np.asarray(gr)).all()
